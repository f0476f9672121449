package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** PNG Adam7 interlace + 16-bit depth: exact decode of our own
  * filter-0 fixtures, and cross-validation against the JDK's ImageIO
  * PNG plugin in both directions (ImageIO-WRITTEN interlaced and
  * 16-bit streams use real adaptive filtering, so the Paeth/Average
  * reversal runs at the pass and sample strides for real). */
class PngInterlaceSpec extends AnyFunSuite {

  private def pix(x: Int, y: Int): Int = (x * 31 + y * 17 + 7) % 256

  test("Adam7 gray fixture decodes to the exact pixel grid (odd dims)") {
    for ((w, h) <- Seq((13, 9), (8, 8), (1, 1), (3, 17), (16, 2))) {
      val png = Codecs.encodePngGrayAdam7(w, h, pix)
      val got = Codecs.decodeGray(png)
      assert(got.isDefined, s"$w x $h")
      val (dw, dh, px) = got.get
      assert(dw === w && dh === h)
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) === pix(x, y), s"($x,$y) of $w x $h")
    }
  }

  test("16-bit gray fixture decodes to the high byte per sample") {
    val w = 11; val h = 7
    def pix16(x: Int, y: Int): Int = (x * 4099 + y * 257 + 5) % 65536
    val png = Codecs.encodePngGray16(w, h, pix16)
    val (dw, dh, px) = Codecs.decodeGray(png).get
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === (pix16(x, y) >> 8), s"($x,$y)")
  }

  test("we decode ImageIO-written Adam7 PNGs (real adaptive filters)") {
    val w = 29; val h = 23
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, pix(x, y))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    val png = bos.toByteArray
    assert((png(28) & 0xff) === 1, "writer did not interlace") // IHDR interlace byte
    val (dw, dh, px) = Codecs.decodeGray(png).get
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === pix(x, y), s"($x,$y)")
  }

  test("we decode ImageIO-written 16-bit gray PNGs") {
    val w = 19; val h = 11
    def pix16(x: Int, y: Int): Int = (x * 4099 + y * 257 + 5) % 65536
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, pix16(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert((png(24) & 0xff) === 16, "writer did not emit 16-bit")
    val (dw, dh, px) = Codecs.decodeGray(png).get
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === (pix16(x, y) >> 8), s"($x,$y)")
  }

  test("ImageIO decodes our Adam7 fixture to our pixels") {
    val w = 21; val h = 13
    val png = Codecs.encodePngGrayAdam7(w, h, pix)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === pix(x, y), s"($x,$y)")
  }

  test("packed sub-8-bit gray round-trips at every depth (ragged rows)") {
    for (depth <- Seq(1, 2, 4); adam7 <- Seq(false, true)) {
      val w = 21; val h = 13 // odd dims: ragged packed-row tails
      val mask = (1 << depth) - 1
      def v(x: Int, y: Int): Int = (x * 3 + y * 7 + depth) & mask
      val png = Codecs.encodePngPacked(w, h, depth, v, adam7 = adam7)
      val (dw, dh, px) = Codecs.decodeGray(png).get
      assert(dw === w && dh === h)
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) === v(x, y) * (255 / mask),
          s"d=$depth adam7=$adam7 ($x,$y)")
    }
  }

  test("packed 2-bit palette expands through PLTE; ramp makes luma = 85*idx") {
    val w = 11; val h = 6
    def idx(x: Int, y: Int): Int = (x + 2 * y) % 4
    val plte = Array.tabulate(12)(i => (85 * (i / 3)).toByte)
    val png = Codecs.encodePngPacked(w, h, 2, idx, plte = plte)
    val (dw, dh, px) = Codecs.decodeGray(png).get
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === 85 * idx(x, y), s"($x,$y)")
  }

  test("we decode ImageIO-written 1-bit PNGs (foreign encoder)") {
    val w = 19; val h = 9
    def bit(x: Int, y: Int): Int = (x + y) % 2
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, bit(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert((png(24) & 0xff) === 1, "writer did not emit 1-bit")
    val (dw, dh, px) = Codecs.decodeGray(png).get
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === 255 * bit(x, y), s"($x,$y)")
  }

  test("ImageIO decodes our packed fixtures to our pixels") {
    val w = 13; val h = 7
    def v(x: Int, y: Int): Int = (x * 5 + y * 3) & 15
    val png = Codecs.encodePngPacked(w, h, 4, v)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === v(x, y), s"($x,$y)")
  }

  test("spec-invalid depth/type combos refused (depth 4 truecolor)") {
    val png = Codecs.encodePngPacked(8, 8, 4, (x, y) => (x + y) & 15)
    val bad = png.clone()
    bad(25) = 2 // color type: truecolor — illegal below depth 8
    assert(Codecs.decodeGray(bad).isEmpty)
  }
}
