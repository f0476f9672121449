package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** GIF codec: literal-LZW fixture round trip (incl. the CLEAR-every-
  * 254 re-clears and sub-block framing), header walk with extensions,
  * real-compression LZW paths (dictionary growth + KwKwK) via a
  * hand-built stream, and interlace unweaving. */
class GifSpec extends AnyFunSuite {

  test("encode/decode round trip: pixels exact through literal LZW") {
    val w = 61; val h = 17 // >254 pixels → multiple CLEARs, odd dims
    def v(x: Int, y: Int): Int = (x * 3 + y * 5 + 7) % 256
    val gif = Gif.encodeGifGray(w, h, v)
    assert(Gif.decodeGifHeader(gif) === Some((w, h, 1)))
    val (dw, dh, px) = Gif.decodeGifGray(gif).get
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === v(x, y), s"($x,$y)")
  }

  test("header walk: extensions skipped, frames counted, garbage refused") {
    val base = Gif.encodeGifGray(4, 4, (_, _) => 1)
    // splice a graphic-control extension (0x21 0xf9, 4-byte block)
    // before the image descriptor
    val scrIdx = 13 + 768 // header + 256-entry GCT
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val withExt = base.take(scrIdx) ++ ext ++ base.drop(scrIdx)
    assert(Gif.decodeGifHeader(withExt) === Some((4, 4, 1)))
    val (_, _, px) = Gif.decodeGifGray(withExt).get
    assert(px.forall(b => (b & 0xff) === 1))
    assert(Gif.decodeGifHeader("NOTAGIF...".getBytes).isEmpty)
    assert(Gif.decodeGifHeader(base.dropRight(1)).isEmpty) // no trailer
  }

  test("real LZW: dictionary growth and KwKwK decode correctly") {
    // hand-pack an LZW stream with minCode=2: CLEAR(4), 1, 2, 6, 8, EOI(5)
    // code 6 = first dict entry ("1"+"2"→ wait: entries form as
    //   after 1: nothing (prev=-1); after 2: dict[6]=(1,2)
    //   code 6 → outputs "1,2"; dict[7]=(2,1)... then code 8 is the
    //   KwKwK case: dict[8]=(6,first("1,2")=1) → outputs "1,2,1"
    // total pixels: 1, 2, 1, 2, 1, 2, 1 → 7 pixels → use 7x1 image
    // widths: 3 bits until the dictionary reaches 8 entries (after
    // code 6 adds dict[7]), then 4 bits — the decoder's growth rule
    val codes = Seq((4, 3), (1, 3), (2, 3), (6, 3), (8, 4), (5, 4))
    var acc = 0L; var n = 0
    val bytes = new scala.collection.mutable.ArrayBuffer[Byte]()
    codes.foreach { case (c, wd) =>
      acc |= c.toLong << n; n += wd
      while (n >= 8) { bytes += (acc & 0xff).toByte; acc >>= 8; n -= 8 }
    }
    if (n > 0) bytes += (acc & 0xff).toByte
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](7, 0, 1, 0, 0xf0.toByte, 0, 0)) // 7x1, 2-entry GCT
    // 2-entry GCT... palette size field 0 → 2 entries; need indices ≤ 3
    // so use a 4-entry table (size field 1)
    val hdr = out.toByteArray
    hdr(10) = 0xf1.toByte
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(hdr)
    (0 until 4).foreach(i => { out2.write(i * 50); out2.write(i * 50); out2.write(i * 50) })
    out2.write(0x2c); out2.write(Array[Byte](0, 0, 0, 0, 7, 0, 1, 0, 0))
    out2.write(2) // min code size
    out2.write(bytes.length); out2.write(bytes.toArray); out2.write(0)
    out2.write(0x3b)
    val (w, h, px) = Gif.decodeGifGray(out2.toByteArray).get
    assert(w === 7 && h === 1)
    assert(px.map(_ & 0xff).toSeq === Seq(50, 100, 50, 100, 50, 100, 50))
  }

  test("interlaced image unweaves to the correct row order") {
    // build an interlaced variant by hand: encode rows in interlace
    // order, set the interlace flag; decode must restore raster order
    val w = 4; val h = 8
    def v(x: Int, y: Int): Int = y * 10 + x
    val order = Seq(0, 4, 2, 6, 1, 3, 5, 7) // standard 4-pass for h=8
    val plain = Gif.encodeGifGray(w, h, (x, y) => v(x, order(y)))
    // flip the interlace bit in the image descriptor (after 6+7+768
    // bytes: descriptor at 781, flags at offset 781+9)
    val g = plain.clone()
    val desc = 13 + 768
    assert((g(desc) & 0xff) === 0x2c)
    g(desc + 9) = (g(desc + 9) | 0x40).toByte
    val (_, _, px) = Gif.decodeGifGray(g).get
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === v(x, y), s"($x,$y)")
  }
}
