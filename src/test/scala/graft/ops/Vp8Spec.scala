package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** VP8 (lossy WebP) decoder validation.
  *
  * The heavy lift is the vector suite: src/test/resources/vp8 holds 16
  * real lossy-WebP encodes (flat/gradient/noise/block/smooth content;
  * MB-aligned and ragged dims down to 5x7 and up to 160x112; qualities
  * 1..95, so qindex spans the table, segmentation is active, and the
  * loop filter runs at many strengths) together with the OPEN-SOURCE
  * libwebp reference decoder's own YUV output, captured by
  * scripts/vp8_tables_extract.py. Byte-for-byte plane equality against
  * an independent reference implementation pins the boolean decoder,
  * header/segment/filter parameter parsing, probability updates, token
  * trees, dequantization, both inverse transforms, every intra
  * predictor family incl. the frame-edge 127/129 conventions and the
  * right-column top-right quirk, and the normal loop filter — far
  * stronger evidence than VP8L's encoder round-trips.
  *
  * Table spot-pins guard the extraction offsets; the bool-coder
  * property pins the §7 arithmetic coder pair used by the fixture
  * encoder.
  */
class Vp8Spec extends AnyFunSuite {

  private def resource(name: String): Option[Array[Byte]] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    if (in == null) None
    else
      try Some(in.readAllBytes())
      finally in.close()
  }

  test("decodes every libwebp reference vector byte-for-byte (Y, U, V)") {
    var n = 0
    var i = 0
    while (i < 99) {
      val name = f"v$i%02d"
      (resource(s"$name.webp"), resource(s"$name.yuv")) match {
        case (Some(webp), Some(ref)) =>
          val w = (ref(0) & 0xff) | ((ref(1) & 0xff) << 8) |
            ((ref(2) & 0xff) << 16) | ((ref(3) & 0xff) << 24)
          val h = (ref(4) & 0xff) | ((ref(5) & 0xff) << 8) |
            ((ref(6) & 0xff) << 16) | ((ref(7) & 0xff) << 24)
          val cw = (w + 1) / 2
          val ch = (h + 1) / 2
          val hdr = Webp.decodeWebpHeader(webp)
          assert(hdr.exists(t => t._1 == "webp" && t._2 == w && t._3 == h),
            s"$name header: $hdr")
          val planes = Webp.decodeWebpLossy(webp)
          assert(planes.isDefined, s"$name failed to decode")
          val p = planes.get
          assert(p.w == w && p.h == h, s"$name dims ${p.w}x${p.h} != ${w}x$h")
          val refY = java.util.Arrays.copyOfRange(ref, 8, 8 + w * h)
          val refU = java.util.Arrays.copyOfRange(ref, 8 + w * h,
            8 + w * h + cw * ch)
          val refV = java.util.Arrays.copyOfRange(ref, 8 + w * h + cw * ch,
            8 + w * h + 2 * cw * ch)
          def firstDiff(a: Array[Byte], b: Array[Byte]): Int = {
            var k = 0
            while (k < a.length && k < b.length) {
              if (a(k) != b(k)) return k
              k += 1
            }
            if (a.length == b.length) -1 else math.min(a.length, b.length)
          }
          def check(plane: String, got: Array[Byte], want: Array[Byte],
              pw: Int): Unit = {
            val d = firstDiff(got, want)
            if (d >= 0)
              fail(s"$name $plane differs first at $d (x=${d % pw}, " +
                s"y=${d / pw}): got ${got(d) & 0xff} want ${want(d) & 0xff}")
          }
          check("Y", p.y, refY, w)
          check("U", p.u, refU, cw)
          check("V", p.v, refV, cw)
          n += 1
        case _ => ()
      }
      i += 1
    }
    assert(n >= 16, s"expected >= 16 vectors on the classpath, saw $n")
  }

  test("table spot-pins (extraction-offset tripwires)") {
    // dequant lookups: published endpoints (RFC 6386 §14.1)
    assert(Vp8Tables.DcQ(0) == 4 && Vp8Tables.DcQ(1) == 5 &&
      Vp8Tables.DcQ(127) == 157)
    assert(Vp8Tables.AcQ(0) == 4 && Vp8Tables.AcQ(127) == 284)
    assert(Vp8Tables.DcQ.length == 128 && Vp8Tables.AcQ.length == 128)
    // monotone non-decreasing quantizer steps
    assert(Vp8Tables.DcQ.sliding(2).forall(p => p(0) <= p(1)))
    assert(Vp8Tables.AcQ.sliding(2).forall(p => p(0) <= p(1)))
    // coefficient probs: type 0 band 0 is the spec's unused all-128
    // filler; the first used row opens 253,136,254,255,228,219 (§13.5)
    assert(Vp8Tables.CoeffProbs.length == 1056)
    assert((0 until 33).forall(i => (Vp8Tables.CoeffProbs(i) & 0xff) == 128))
    assert(Seq(253, 136, 254, 255, 228, 219) ==
      (33 until 39).map(Vp8Tables.CoeffProbs(_) & 0xff))
    // update probs open with the all-255 unused band (§13.4)
    assert(Vp8Tables.CoeffUpdateProbs.length == 1056)
    assert((0 until 11).forall(i =>
      (Vp8Tables.CoeffUpdateProbs(i) & 0xff) == 255))
    // kf bmode probs: first row per §11.5
    assert(Vp8Tables.KfBModeProbs.length == 900)
    assert(Seq(231, 120, 48, 89, 115, 113, 120, 152, 112) ==
      (0 until 9).map(Vp8Tables.KfBModeProbs(_) & 0xff))
    // all probabilities are valid (1..255: a 0 would divide-by-zero the
    // arithmetic coder's split)
    assert(Vp8Tables.CoeffProbs.forall(b => (b & 0xff) >= 1))
    assert(Vp8Tables.KfBModeProbs.forall(b => (b & 0xff) >= 1))
    assert(Vp8Tables.Cat6.length == 11 && Vp8Tables.Cat6(0) == 254)
    assert(Vp8Tables.Bands.toSeq ==
      Seq(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7))
    // the decoder clamps the uv-DC dequant VALUE at 132 where the
    // reference clamps the table INDEX at 117 — equivalent iff
    // DcQ[117] == 132 and the (monotone) table first exceeds 132
    // after 117; pin both so a table change can't silently diverge
    assert(Vp8Tables.DcQ(117) == 132 &&
      Vp8Tables.DcQ(116) <= 132 && Vp8Tables.DcQ(118) > 132)
    assert(Vp8Tables.Zigzag.toSeq ==
      Seq(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15))
  }

  test("fixture encoder round-trips exactly through the decoder") {
    // dims cover MB-aligned, ragged, single-MB, and multi-row; qIndex
    // sweeps the exactness window; nParts covers all partition counts
    val cases = Seq(
      (16, 16, 0, 1, 0), (48, 32, 10, 2, 1), (33, 17, 34, 4, 2),
      (80, 48, 21, 8, 3), (5, 7, 5, 1, 4), (64, 64, 17, 2, 0),
      (31, 63, 29, 4, 1))
    for ((w, h, qi, np, seed) <- cases) {
      val vOf = (bx: Int, by: Int) => (37 + 11 * bx + 23 * by + seed) % 256
      val (payload, expected) = Vp8.encodeVp8Still(w, h, vOf, qi, np, seed)
      val got = Vp8.decodeVp8(payload)
      assert(got.isDefined, s"${w}x$h qi=$qi np=$np failed to decode")
      val p = got.get
      assert(p.w == w && p.h == h)
      assert(p.y.sameElements(expected.y),
        s"${w}x$h qi=$qi np=$np seed=$seed: Y mismatch")
      assert(p.u.sameElements(expected.u) && p.v.sameElements(expected.v),
        s"${w}x$h qi=$qi np=$np seed=$seed: chroma mismatch")
      // luma equals the fixture values on every pixel (the oracle
      // contract: mode rotation and residuals cancel exactly)
      var i = 0
      while (i < w * h) {
        val x = i % w; val y = i / w
        assert((p.y(i) & 0xff) == vOf(x / 16, y / 16),
          s"fixture value mismatch at ($x,$y)")
        i += 1
      }
    }
  }

  test("fixture encoder rejects out-of-window quantizers") {
    intercept[IllegalArgumentException] {
      Vp8.encodeVp8Still(16, 16, (_, _) => 128, qIndex = 35, nParts = 1)
    }
  }

  test("animated-WebP frame decode: ANMF walk, both sub-decoders, stride") {
    val anim = Multimodal.syntheticAnimWebp(4L, "unused") // 4%3=1 -> 3 frames
    assert(Webp.decodeWebpHeader(anim).exists(_._1 == "webp-anim"))
    assert(Webp.animFrameCount(anim).contains(3))
    val all = Webp.animFrameLumas(anim, 1)
    assert(all.map(_.index) == Seq(0, 1, 2))
    // frame 0: lossy 16x16 (id=4, f=0: side 16), per-MB-flat value
    val f0 = all(0)
    assert(f0.w == 16 && f0.h == 16 && f0.x == 0 && f0.y == 0 &&
      f0.durationMs == 40)
    val v0 = ((4 * 3) % 256).toByte
    assert(f0.luma.forall(_ == v0), "DC-exact lossy frame must be flat")
    // frame 1: lossless 4+(4+1)%9=9 x 3+(4+1)%7=8, BT.601 closed form
    val f1 = all(1)
    assert(f1.w == 9 && f1.h == 8 && f1.x == 2 && f1.y == 2)
    val want = (299 * ((4 + 0 + 0 + 1) % 256) +
      587 * ((8 + 0 + 0 + 3) % 256) + 114 * ((12 + 0 + 0 + 5) % 256)) / 1000
    assert((f1.luma(0) & 0xff) == want)
    // stride 2 samples frames 0 and 2 only
    assert(Webp.animFrameLumas(anim, 2).map(_.index) == Seq(0, 2))
    // a damaged sub-frame is skipped, not fatal (per-frame quarantine)
    val cut = anim.clone()
    // corrupt the first ANMF's VP8 payload body (flip bytes well past
    // the chunk headers)
    val tornIdx = anim.length / 2
    cut(tornIdx) = (cut(tornIdx) ^ 0x5a).toByte
    assert(Webp.animFrameLumas(cut, 1).size <= all.size)
    // raw text falls through everything
    assert(Webp.animFrameLumas("plain".getBytes, 1).isEmpty)
  }

  test("bool encoder/decoder round-trip (randomized, seeded)") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(2000)
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      val bits = Array.fill(n)(rnd.nextInt(2))
      val enc = new Vp8.BoolEnc
      var i = 0
      while (i < n) { enc.bool(probs(i), bits(i)); i += 1 }
      val bytes = enc.toBytes
      val got = Vp8.decodeBoolSeq(bytes, probs)
      assert(got.sameElements(bits), s"trial $trial (n=$n) desynced")
    }
  }
}
