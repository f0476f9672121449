package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Progressive (SOF2) JPEG: flat-block exactness through the 5-scan
  * successive-approximation script, general-content tolerance, and —
  * the independent reference — cross-validation against the JDK's
  * ImageIO JPEG plugin (IJG libjpeg underneath): ImageIO must decode
  * our progressive streams to the same pixels we do, and we must
  * decode ImageIO-WRITTEN progressive streams (libjpeg's multi-scan
  * script, with real cross-block EOB runs) to ImageIO's own pixels. */
class JpegProgressiveSpec extends AnyFunSuite {

  private def decodeViaImageIO(jpg: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO could not decode the stream")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Int](w * h)
    val gray = img.getRaster.getNumBands == 1
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) =
        // raster samples are the RAW decoded codes; getRGB on a gray
        // image would apply a linear-gray→sRGB colorspace transform
        if (gray) img.getRaster.getSample(x, y, 0)
        else (img.getRGB(x, y) >> 16) & 0xff
    (w, h, px)
  }

  private def encodeProgressiveViaImageIO(w: Int, h: Int,
      pix: (Int, Int) => Int, gray: Boolean): Array[Byte] = {
    val imgType =
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pix(x, y) & 0xff
      // setRGB on TYPE_BYTE_GRAY converts sRGB→linear gray; write the
      // raw sample instead so the JPEG carries exactly pix(x, y)
      if (gray) img.getRaster.setSample(x, y, 0, v)
      else img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("flat 8x8 blocks round-trip bit-exact through all 5 scans") {
    val w = 32; val h = 24
    def v(bx: Int, by: Int): Int = (7 * bx + 13 * by + 5) % 256
    val jpg = Jpeg.encodeJpegProgressiveGray(w, h, (x, y) => v(x / 8, y / 8))
    val (dw, dh, planes) = Jpeg.decodeProgressivePlanes(jpg).get
    assert(dw === w && dh === h && planes.length === 1)
    for (y <- 0 until h; x <- 0 until w)
      assert((planes(0)(y * w + x) & 0xff) === v(x / 8, y / 8), s"($x,$y)")
  }

  test("general content round-trips within quantization tolerance") {
    val w = 24; val h = 24
    def pix(x: Int, y: Int): Int =
      (128 + 90 * math.sin(x * 0.7) * math.cos(y * 0.5)).toInt.max(0).min(255)
    val jpg = Jpeg.encodeJpegProgressiveGray(w, h, pix)
    val (_, _, planes) = Jpeg.decodeProgressivePlanes(jpg).get
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr,
        math.abs((planes(0)(y * w + x) & 0xff) - pix(x, y)))
    assert(maxErr <= 16, s"max pixel error $maxErr")
  }

  test("progressive == baseline on identical content (same QStep, same tables)") {
    val w = 40; val h = 16
    def pix(x: Int, y: Int): Int = (x * 31 + y * 17) % 256
    val base = Jpeg.decodeJpegGray(Jpeg.encodeJpegGray(w, h, pix)).get._3
    val prog = Jpeg.decodeProgressivePlanes(
      Jpeg.encodeJpegProgressiveGray(w, h, pix)).get._3(0)
    // identical coefficients reach identical IDCT inputs — the scans
    // only REORDER the bits, so the decoded pixels must match exactly
    for (i <- 0 until w * h)
      assert(base(i) === prog(i), s"pixel $i")
  }

  test("ImageIO decodes our progressive stream to our pixels") {
    val w = 32; val h = 24
    def pix(x: Int, y: Int): Int =
      (128 + 80 * math.sin(x * 0.4 + y * 0.3)).toInt.max(0).min(255)
    val jpg = Jpeg.encodeJpegProgressiveGray(w, h, pix)
    val (iw, ih, ipx) = decodeViaImageIO(jpg)
    assert(iw === w && ih === h)
    val (_, _, planes) = Jpeg.decodeProgressivePlanes(jpg).get
    var maxDiff = 0
    for (i <- 0 until w * h)
      maxDiff = math.max(maxDiff, math.abs((planes(0)(i) & 0xff) - ipx(i)))
    // both implement the same T.81 math; small IDCT rounding skew only
    assert(maxDiff <= 1, s"max pixel diff vs ImageIO $maxDiff")
  }

  test("we decode ImageIO's progressive GRAY stream (libjpeg scan script, EOB runs)") {
    val w = 48; val h = 32
    def pix(x: Int, y: Int): Int =
      (128 + 70 * math.sin(x * 0.35) * math.cos(y * 0.25)).toInt.max(0).min(255)
    val jpg = encodeProgressiveViaImageIO(w, h, pix, gray = true)
    // confirm it really is progressive (SOF2)
    assert(Jpeg.decodeProgressiveHeader(jpg).isDefined, "not SOF2?")
    val (dw, dh, planes) = Jpeg.decodeProgressivePlanes(jpg).get
    val (iw, ih, ipx) = decodeViaImageIO(jpg)
    assert(dw === iw && dh === ih)
    var maxDiff = 0
    for (i <- 0 until w * h)
      maxDiff = math.max(maxDiff, math.abs((planes(0)(i) & 0xff) - ipx(i)))
    assert(maxDiff <= 1, s"max pixel diff vs ImageIO $maxDiff")
  }

  test("we decode ImageIO's progressive COLOR stream (3 components, subsampling)") {
    val w = 40; val h = 24
    def pix(x: Int, y: Int): Int = ((x * 13 + y * 7) % 200) + 28
    val jpg = encodeProgressiveViaImageIO(w, h, pix, gray = false)
    assert(Jpeg.decodeProgressiveHeader(jpg).map(_._3) === Some(3))
    val (dw, dh, planes) = Jpeg.decodeProgressivePlanes(jpg).get
    assert(dw === w && dh === h && planes.length === 3)
    val (_, _, ipx) = decodeViaImageIO(jpg)
    // gray-valued RGB input: decoded Y plane ≈ ImageIO's R channel
    var maxDiff = 0
    for (i <- 0 until w * h)
      maxDiff = math.max(maxDiff, math.abs((planes(0)(i) & 0xff) - ipx(i)))
    assert(maxDiff <= 2, s"max Y diff vs ImageIO $maxDiff")
  }

  test("header walker: SOF2 dims/comps; baseline and garbage refused") {
    val jpg = Jpeg.encodeJpegProgressiveGray(16, 8, (x, y) => (x + y) % 256)
    assert(Jpeg.decodeProgressiveHeader(jpg) === Some((16, 8, 1)))
    val base = Jpeg.encodeJpegGray(16, 8, (x, y) => (x + y) % 256)
    assert(Jpeg.decodeProgressiveHeader(base).isEmpty)
    assert(Jpeg.decodeProgressivePlanes(base).isEmpty)
    assert(Jpeg.decodeProgressiveHeader("nope".getBytes).isEmpty)
  }
}
