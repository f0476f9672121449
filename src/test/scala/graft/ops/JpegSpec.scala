package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: flat-block exactness (the closed-form-oracle
  * property), general round-trip tolerance, header parsing, and
  * refusal of non-baseline streams. */
class JpegSpec extends AnyFunSuite {

  test("flat 8x8 blocks round-trip bit-exact (uniform QStep divides DC)") {
    // 4x3 blocks of flat values — decode must reproduce every pixel
    val w = 32; val h = 24
    def v(bx: Int, by: Int): Int = (7 * bx + 13 * by + 5) % 256
    val jpg = Jpeg.encodeJpegGray(w, h, (x, y) => v(x / 8, y / 8))
    val (dw, dh, px) = Jpeg.decodeJpegGray(jpg).get
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === v(x / 8, y / 8), s"($x,$y)")
  }

  test("header parse: dims, SOI/SOF walk; garbage refused") {
    val jpg = Jpeg.encodeJpegGray(40, 16, (x, y) => (x * y) % 256)
    assert(Jpeg.decodeJpegHeader(jpg) === Some((40, 16, 1)))
    assert(Jpeg.decodeJpegHeader("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decodeJpegHeader(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  test("lying SOF dimensions are data, not exceptions: decode refuses") {
    val jpg = Jpeg.encodeJpegGray(40, 16, (x, y) => (x * y) % 256)
    // locate SOF0 (FF C0): segment = len(2) precision(1) h(2) w(2) …
    val sof = jpg.indices.dropRight(1).find(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0).get
    val lying = jpg.clone()
    for (d <- 5 to 8) lying(sof + d) = 0xff.toByte // h = w = 65535
    assert(Jpeg.decodeJpegHeader(lying).isEmpty)   // pixel bound trips
    assert(Jpeg.decodeJpegGray(lying).isEmpty)     // nothing escapes
  }

  test("general content round-trips within quantization tolerance") {
    val w = 24; val h = 24
    def pix(x: Int, y: Int): Int =
      (128 + 90 * math.sin(x * 0.7) * math.cos(y * 0.5)).toInt.max(0).min(255)
    val jpg = Jpeg.encodeJpegGray(w, h, pix)
    val (_, _, px) = Jpeg.decodeJpegGray(jpg).get
    // uniform QStep=8: per-coefficient error <= 4, worst-case pixel
    // error far below 16 in practice
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr, math.abs((px(y * w + x) & 0xff) - pix(x, y)))
    assert(maxErr <= 16, s"max pixel error $maxErr")
  }

  test("non-block-aligned dims: edge replication, exact size out") {
    val w = 13; val h = 9
    val jpg = Jpeg.encodeJpegGray(w, h, (x, y) => 50)
    val (dw, dh, px) = Jpeg.decodeJpegGray(jpg).get
    assert(dw === w && dh === h && px.length === w * h)
    assert(px.forall(b => (b & 0xff) === 50))
  }

  test("DC prediction chains across many blocks") {
    // ramp of DC values exercises growing/shrinking diffs and sign
    val w = 128; val h = 8
    def v(bx: Int): Int = (bx * 16) % 256
    val jpg = Jpeg.encodeJpegGray(w, h, (x, _) => v(x / 8))
    val (_, _, px) = Jpeg.decodeJpegGray(jpg).get
    for (bx <- 0 until 16; x <- 0 until 8)
      assert((px(bx * 8 + x) & 0xff) === v(bx), s"block $bx")
  }

  test("color: MCU-grid-flat blocks round-trip bit-exact per sampling") {
    // 16x16-grid-flat color: Y flat per 8x8 block, chroma box-average
    // of equal values is exact, DC-only spectrum divides QStep — the
    // decoded YCbCr planes are exactly the encoder's fixed-point
    // conversion, so reconstructed RGB is closed-form per block
    val w = 32; val h = 32
    def rgbAt(bx: Int, by: Int): (Int, Int, Int) =
      ((7 * bx + 13 * by + 11) % 256, (3 * bx + 5 * by + 101) % 256,
        (17 * bx + 23 * by + 201) % 256)
    def packed(x: Int, y: Int): Int = {
      val (r, g, b) = rgbAt(x / 16, y / 16)
      (r << 16) | (g << 8) | b
    }
    for (sampling <- Seq("444", "422", "420")) {
      val jpg = Jpeg.encodeJpegColor(w, h, packed, sampling)
      assert(Jpeg.decodeJpegHeader(jpg) === Some((w, h, 3)), sampling)
      val (dw, dh, px) = Jpeg.decodeJpegColor(jpg).get
      assert(dw === w && dh === h && px.length === w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = rgbAt(x / 16, y / 16)
        val yv = Jpeg.rgbToY(r, g, b)
        val cb = Jpeg.rgbToCb(r, g, b); val cr = Jpeg.rgbToCr(r, g, b)
        val i = 3 * (y * w + x)
        assert((px(i) & 0xff) === Jpeg.yccToR(yv, cr), s"$sampling R ($x,$y)")
        assert((px(i + 1) & 0xff) === Jpeg.yccToG(yv, cb, cr), s"$sampling G ($x,$y)")
        assert((px(i + 2) & 0xff) === Jpeg.yccToB(yv, cb), s"$sampling B ($x,$y)")
      }
      // and the gray stage sees exactly the Y plane
      val (_, _, luma) = Jpeg.decodeJpegGray(jpg).get
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = rgbAt(x / 16, y / 16)
        assert((luma(y * w + x) & 0xff) === Jpeg.rgbToY(r, g, b),
          s"$sampling Y ($x,$y)")
      }
    }
  }

  test("color: smooth content round-trips within tolerance; 420 chroma averages") {
    val w = 24; val h = 24
    def packed(x: Int, y: Int): Int = {
      val r = (128 + 80 * math.sin(x * 0.4)).toInt.max(0).min(255)
      val g = (128 + 80 * math.cos(y * 0.3)).toInt.max(0).min(255)
      val b = (x * 10 + y * 3) % 256
      (r << 16) | (g << 8) | b
    }
    val jpg = Jpeg.encodeJpegColor(w, h, packed, "420")
    val (_, _, px) = Jpeg.decodeJpegColor(jpg).get
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = packed(x, y)
      val i = 3 * (y * w + x)
      // chroma is subsampled 2x2 then replicated: compare against the
      // source with generous tolerance (quant + subsample error)
      maxErr = math.max(maxErr, math.abs((px(i) & 0xff) - ((p >> 16) & 0xff)))
    }
    assert(maxErr <= 60, s"max R error $maxErr")
  }

  test("color: non-MCU-aligned dims crop exactly; 1-component color decode replicates") {
    val w = 20; val h = 12 // not multiples of 16 (420 MCU)
    val jpg = Jpeg.encodeJpegColor(w, h, (_, _) => 0x406080, "420")
    val (dw, dh, px) = Jpeg.decodeJpegColor(jpg).get
    assert(dw === w && dh === h && px.length === w * h * 3)
    val yv = Jpeg.rgbToY(0x40, 0x60, 0x80)
    val cb = Jpeg.rgbToCb(0x40, 0x60, 0x80)
    val cr = Jpeg.rgbToCr(0x40, 0x60, 0x80)
    for (i <- 0 until w * h) {
      assert((px(3 * i) & 0xff) === Jpeg.yccToR(yv, cr))
      assert((px(3 * i + 1) & 0xff) === Jpeg.yccToG(yv, cb, cr))
      assert((px(3 * i + 2) & 0xff) === Jpeg.yccToB(yv, cb))
    }
    val gray = Jpeg.encodeJpegGray(8, 8, (_, _) => 99)
    val (_, _, g3) = Jpeg.decodeJpegColor(gray).get
    assert(g3.length === 8 * 8 * 3 && g3.forall(b => (b & 0xff) === 99))
  }

  test("CMYK: flat 4-component blocks decode through c*k/255 exactly") {
    val w = 24; val h = 16
    def s(ci: Int, bx: Int, by: Int): Int = (11 * ci + 7 * bx + 13 * by + 40) % 256
    val jpg = Jpeg.encodeJpegCmyk(w, h, s, transform = 0)
    assert(Jpeg.decodeJpegHeader(jpg) === Some((w, h, 4)))
    val (dw, dh, rgb) = Jpeg.decodeJpegRgb4(jpg).get
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w) {
      val (bx, by) = (x / 8, y / 8)
      val k = s(3, bx, by)
      assert((rgb(3 * (y * w + x)) & 0xff) === s(0, bx, by) * k / 255, s"R($x,$y)")
      assert((rgb(3 * (y * w + x) + 1) & 0xff) === s(1, bx, by) * k / 255)
      assert((rgb(3 * (y * w + x) + 2) & 0xff) === s(2, bx, by) * k / 255)
    }
    // luma projection agrees with BT.601 of the RGB
    val (_, _, g) = Jpeg.decodeJpegLuma4(jpg).get
    for (i <- 0 until w * h)
      assert((g(i) & 0xff) === (299 * (rgb(3 * i) & 0xff)
        + 587 * (rgb(3 * i + 1) & 0xff) + 114 * (rgb(3 * i + 2) & 0xff)) / 1000)
  }

  test("YCCK: APP14 transform 2 runs YCbCr->RGB before un-inking") {
    val w = 16; val h = 8
    def s(ci: Int, bx: Int, by: Int): Int = (29 * ci + 17 * bx + 23 * by + 90) % 256
    val jpg = Jpeg.encodeJpegCmyk(w, h, s, transform = 2)
    val (_, _, rgb) = Jpeg.decodeJpegRgb4(jpg).get
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      val (yv, cb, cr, k) = (s(0, bx, by), s(1, bx, by), s(2, bx, by), s(3, bx, by))
      val i = (by * 8) * w + bx * 8
      assert((rgb(3 * i) & 0xff) === Jpeg.yccToR(yv, cr) * k / 255, s"R($bx,$by)")
      assert((rgb(3 * i + 1) & 0xff) === Jpeg.yccToG(yv, cb, cr) * k / 255)
      assert((rgb(3 * i + 2) & 0xff) === Jpeg.yccToB(yv, cb) * k / 255)
    }
    // without the APP14 transform flag the same components read as CMYK
    val plain = Jpeg.encodeJpegCmyk(w, h, s, transform = 0)
    val (_, _, rgb0) = Jpeg.decodeJpegRgb4(plain).get
    assert((rgb0(0) & 0xff) === s(0, 0, 0) * s(3, 0, 0) / 255)
  }

  test("progressive CMYK/YCCK decodes identically to the baseline container") {
    val w = 24; val h = 16
    def s(ci: Int, bx: Int, by: Int): Int = (19 * ci + 5 * bx + 11 * by + 63) % 256
    for (transform <- Seq(0, 2)) {
      val base = Jpeg.encodeJpegCmyk(w, h, s, transform)
      val prog = Jpeg.encodeJpegProgressiveCmyk(w, h, s, transform)
      assert(Jpeg.decodeProgressiveHeader(prog) === Some((w, h, 4)))
      val (bw2, bh2, baseRgb) = Jpeg.decodeJpegRgb4(base).get
      val (pw, ph, progRgb) = Jpeg.decodeProgressiveRgb4(prog).get
      assert(pw === bw2 && ph === bh2)
      assert(progRgb.sameElements(baseRgb),
        s"transform=$transform: progressive RGB diverged from baseline")
      val (_, _, g) = Jpeg.decodeProgressiveLuma4(prog).get
      val (_, _, bg) = Jpeg.decodeJpegLuma4(base).get
      assert(g.sameElements(bg))
      // and the gray dispatch routes it as a real decode
      val Some((cw, chh, cg)) = Codecs.decodeGray(prog)
      assert(cw === w && chh === h && cg.sameElements(g))
    }
    // a 4-component baseline stream must NOT enter the SOF2 path
    assert(Jpeg.decodeProgressiveRgb4(
      Jpeg.encodeJpegCmyk(w, h, s, 0)).isEmpty)
  }

  test("byte stuffing: blocks whose entropy stream emits 0xFF") {
    // many distinct block values make some code stream byte equal FF;
    // decode must unstuff transparently. Probabilistic coverage over a
    // wide pattern — and decode correctness IS the assertion.
    val w = 256; val h = 16
    def v(bx: Int, by: Int): Int = (bx * 37 + by * 91 + 3) % 256
    val jpg = Jpeg.encodeJpegGray(w, h, (x, y) => v(x / 8, y / 8))
    val (_, _, px) = Jpeg.decodeJpegGray(jpg).get
    for (by <- 0 until 2; bx <- 0 until 32)
      assert((px(by * 8 * w + bx * 8) & 0xff) === v(bx, by), s"($bx,$by)")
  }
}
