package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared animation compositor ([[Anim]]) and both container
  * paths ([[Webp.animCompositedLumas]] / [[Gif.gifCompositedLumas]]):
  * dispose none/background/previous on OVERLAPPING rects (where they
  * genuinely differ), alpha blending vs the no-blend flag, clipping,
  * stride sampling, and the poster-frame contract. */
class AnimCompositorSpec extends AnyFunSuite {

  private def frame(x: Int, y: Int, w: Int, h: Int, v: Int,
      alpha: Array[Byte] = null, noBlend: Boolean = false,
      dispose: Int = 0): Anim.Frame =
    Anim.Frame(x, y, w, h, Array.fill(w * h)(v.toByte), alpha,
      noBlend, dispose, 10)

  test("presentation precedes disposal; dispose=bg clears the rect") {
    // 4x4 canvas, bg 10; frame A 2x2@(0,0) v=100 dispose-to-bg,
    // frame B 2x2@(2,2) v=200 dispose none
    val out = Anim.composite(4, 4, 10,
      Seq(frame(0, 0, 2, 2, 100, dispose = 1), frame(2, 2, 2, 2, 200)), 1)
    assert(out.map(_._1) === Seq(0, 1))
    val c0 = out(0)._2.map(_ & 0xff)
    // A's own emission contains A's pixels (presented before disposal)
    assert(c0(0) === 100 && c0(5) === 100 && c0(15) === 10)
    val c1 = out(1)._2.map(_ & 0xff)
    // by B's emission, A's rect has been restored to background
    assert(c1(0) === 10 && c1(5) === 10 && c1(10) === 200 && c1(15) === 200)
  }

  test("dispose=prev vs dispose=bg differ on overlapping rects") {
    // base frame paints the whole canvas 50; overlapping frame at
    // (1,1) with dispose=prev must restore 50 (not bg 0) underneath
    val base = frame(0, 0, 4, 4, 50)
    val prevOut = Anim.composite(4, 4, 0,
      Seq(base, frame(1, 1, 2, 2, 200, dispose = 2), frame(0, 0, 1, 1, 99)), 1)
    val afterPrev = prevOut(2)._2.map(_ & 0xff)
    assert(afterPrev(5) === 50, "restore-to-previous keeps the base pixels")
    val bgOut = Anim.composite(4, 4, 0,
      Seq(base, frame(1, 1, 2, 2, 200, dispose = 1), frame(0, 0, 1, 1, 99)), 1)
    val afterBg = bgOut(2)._2.map(_ & 0xff)
    assert(afterBg(5) === 0, "restore-to-background clears to bg")
  }

  test("alpha blends integer-exactly; noBlend overrides alpha") {
    val a = Array.fill(4)(128.toByte)
    val blended = Anim.composite(2, 2, 40,
      Seq(frame(0, 0, 2, 2, 200, alpha = a)), 1).head._2
    // (128*200 + 127*40) / 255 = (25600 + 5080) / 255 = 120 (integer)
    assert(blended.forall(b => (b & 0xff) === (128 * 200 + 127 * 40) / 255))
    val overwritten = Anim.composite(2, 2, 40,
      Seq(frame(0, 0, 2, 2, 200, alpha = a, noBlend = true)), 1).head._2
    assert(overwritten.forall(b => (b & 0xff) === 200))
    // alpha 0 leaves the canvas untouched even when blending
    val clear = Anim.composite(2, 2, 40,
      Seq(frame(0, 0, 2, 2, 200, alpha = Array.fill(4)(0.toByte))), 1).head._2
    assert(clear.forall(b => (b & 0xff) === 40))
  }

  test("frame rects clip to the canvas") {
    val out = Anim.composite(3, 3, 0,
      Seq(frame(2, 2, 4, 4, 77)), 1).head._2.map(_ & 0xff)
    assert(out(8) === 77 && out(0) === 0 && out.count(_ == 77) === 1)
  }

  test("webp: composited canvas sums follow the window formula; stride samples") {
    for (id <- Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L)) {
      val b = Multimodal.syntheticAnimWebpComposited(id, "t")
      val n = 2 + (id % 3).toInt
      val frames = Webp.animCompositedLumas(b, 1)
      assert(frames.size === n, s"id=$id")
      var visible = 0L
      for (f <- 0 until n) {
        val v = (id * 3 + 7L * f) % 256
        val s = 256L * v
        val (fi, w, h, g) = frames(f)
        assert(fi === f && w === 40 && h === 40)
        val sum = g.map(_ & 0xff).map(_.toLong).sum
        assert(sum === visible + s, s"id=$id frame=$f")
        if ((id + f) % 2 == 0) visible += s // D bit clear: stays
      }
      // stride=2 samples frames 0, 2 with the same accumulated state
      val sampled = Webp.animCompositedLumas(b, 2)
      assert(sampled.map(_._1) === (0 until n by 2))
      for ((fi, _, _, g) <- sampled)
        assert(g.sameElements(frames(fi)._4))
    }
  }

  test("webp: poster frame = first decodable frame on background") {
    val b = Multimodal.syntheticAnimWebpComposited(1L, "t")
    val Some((w, h, g)) = Webp.animPosterLuma(b)
    assert(w === 40 && h === 40)
    assert(g.sameElements(Webp.animCompositedLumas(b, 1).head._4))
    // a leading torn frame is skipped: poster is the next decodable one
    val (good, _) = Vp8.encodeVp8Still(16, 16, (_, _) => 90, 8, 1)
    val mixed = Webp.wrapAnimFlagged(20, 20, Seq(
      ("VP8 ", good.take(9), 0, 0, 40, 0), ("VP8 ", good, 0, 0, 40, 0)))
    val Some((_, _, pg)) = Webp.animPosterLuma(mixed)
    assert(pg.map(_ & 0xff).count(_ == 90) === 256)
    // all frames torn: no poster (malformed, not a bare-bg canvas)
    val torn = Webp.wrapAnimFlagged(20, 20, Seq(
      ("VP8 ", good.take(9), 0, 0, 40, 0)))
    assert(Webp.animPosterLuma(torn).isEmpty)
    assert(Codecs.decodeGray(torn).isEmpty)
    // grayOutcome surfaces the poster through decodeGray
    val Some((dw, dh, dg)) = Codecs.decodeGray(b)
    assert(dw === 40 && dh === 40 && dg.sameElements(g))
  }

  test("gif: composited canvas sums follow the window formula") {
    for (id <- Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L)) {
      val b = Multimodal.syntheticAnimGif(id, "t")
      val n = 2 + (id % 3).toInt
      val frames = Gif.gifCompositedLumas(b, 1)
      assert(frames.size === n, s"id=$id")
      var visible = 0L
      for (f <- 0 until n) {
        val v = (id * 5 + 11L * f) % 256
        val s = 256L * v
        val (fi, w, h, g) = frames(f)
        assert(fi === f && w === 40 && h === 40)
        assert(g.map(_ & 0xff).map(_.toLong).sum === visible + s,
          s"id=$id frame=$f")
        if ((id + f) % 3 == 0) visible += s // dispose==none (code 1)
      }
    }
  }

  test("gif: transparent pixels show the canvas through; prev vs bg") {
    // full-canvas base of index 50, then an overlapping 2x2 frame of
    // index 200 whose even pixels are the TRANSPARENT index
    val base = Gif.encodeGifAnim(4, 4, Seq(
      (0, 0, 4, 4, (_, _) => 50, 1, -1),
      (1, 1, 2, 2, (x, y) => if ((x + y) % 2 == 0) 7 else 200, 3, 7),
      (0, 0, 1, 1, (_, _) => 99, 1, -1)))
    val frames = Gif.gifCompositedLumas(base, 1)
    assert(frames.size === 3)
    val c1 = frames(1)._4.map(_ & 0xff)
    assert(c1(5) === 50, "transparent pixel leaves the base visible")
    assert(c1(6) === 200, "opaque pixel paints")
    // dispose=prev on the overlap: frame 3's canvas restores the base
    val c2 = frames(2)._4.map(_ & 0xff)
    assert(c2(5) === 50 && c2(6) === 50 && c2(0) === 99)
  }

  test("gif: first-frame decode contract is unchanged by the refactor") {
    val b = Gif.encodeGifGray(9, 7, (x, y) => (x * 13 + y * 5) % 256)
    val Some((w, h, g)) = Gif.decodeGifGray(b)
    assert(w === 9 && h === 7)
    for (y <- 0 until 7; x <- 0 until 9)
      assert((g(y * 9 + x) & 0xff) === (x * 13 + y * 5) % 256)
  }
}
