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
    assert(Jpeg.decodeJpegHeader(jpg) === Some((40, 16)))
    assert(Jpeg.decodeJpegHeader("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decodeJpegHeader(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
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
