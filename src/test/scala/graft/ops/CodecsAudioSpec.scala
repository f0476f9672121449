package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** G.711 (µ-law/A-law) and IMA ADPCM codecs: table round-trips,
  * container byte layout (the data chunk offset is pinned — a
  * misplaced payload corrupts the chunk-length field it overlaps),
  * decode identity against an independent replay of the predictor
  * recurrence, and malformed-header rejection. */
class CodecsAudioSpec extends AnyFunSuite {

  // ----------------------------------------------------------- G.711

  test("mulaw: encode(decode(c)) == c for every code except 0x7f") {
    for (c <- 0 until 256 if c != 0x7f)
      assert(Codecs.mulawEncode(Codecs.mulawDecode(c)) === c, s"code $c")
    // the two zeros: both decode to 0, encode canonicalizes to 0xff
    assert(Codecs.mulawDecode(0x7f) === 0)
    assert(Codecs.mulawDecode(0xff) === 0)
    assert(Codecs.mulawEncode(0) === 0xff)
  }

  test("alaw: encode(decode(c)) == c for every code") {
    for (c <- 0 until 256)
      assert(Codecs.alawEncode(Codecs.alawDecode(c)) === c, s"code $c")
  }

  test("g711 decode(encode(s)) is idempotent and sign-correct") {
    val samples = (-32768 to 32767 by 97) ++ Seq(-32768, -1, 0, 1, 32767)
    for (s <- samples) {
      val mu = Codecs.mulawDecode(Codecs.mulawEncode(s))
      val al = Codecs.alawDecode(Codecs.alawEncode(s))
      // decode∘encode must be idempotent at the VALUE level (code-
      // level fixed points fail for µ-law negative zero: tiny
      // negatives encode to 0x7f, decode to 0, re-encode to 0xff)
      assert(Codecs.mulawDecode(Codecs.mulawEncode(mu)) === mu, s"mu $s")
      assert(Codecs.alawDecode(Codecs.alawEncode(al)) === al, s"al $s")
      if (s > 132) { assert(mu > 0); assert(al > 0) }
      if (s < -132) { assert(mu < 0); assert(al < 0) }
    }
  }

  test("encodeWavG711 container round-trips through decodeWavMix") {
    def code(c: Int, i: Int): Int = (37 + i * 11 + c * 5) % 256
    for (alaw <- Seq(true, false); ch <- Seq(1, 2)) {
      val n = 48
      val wav = Codecs.encodeWavG711(8000, ch, n, alaw, code)
      val h = Codecs.decodeWavHeader(wav).get
      assert(h.format === (if (alaw) "wav-alaw" else "wav-mulaw"))
      assert(h.sampleRate === 8000 && h.channels === ch && h.nSamples === n)
      val (_, mix) = Codecs.decodeWavMix(wav).get
      val dec: Int => Int =
        if (alaw) Codecs.alawDecode else Codecs.mulawDecode
      for (i <- 0 until n) {
        val want = (0 until ch).map(c => dec(code(c, i))).sum
        assert(mix(i) === want, s"alaw=$alaw ch=$ch frame $i")
      }
    }
  }

  // ------------------------------------------------------- IMA ADPCM

  /** Independent replay of the IMA predictor recurrence (re-derived
    * from the spec here, NOT calling imaDecodeNibble — so an encoder/
    * decoder state-sharing bug can't self-confirm). */
  private def replay(nib: Int, pred: Int, idx: Int): (Int, Int) = {
    val stepTab = Codecs.imaStepTable
    val step = stepTab(idx)
    var d = step / 8
    if ((nib & 4) != 0) d += step
    if ((nib & 2) != 0) d += step / 2
    if ((nib & 1) != 0) d += step / 4
    val p0 = if ((nib & 8) != 0) pred - d else pred + d
    val adv = if ((nib & 7) < 4) -1 else 2 * ((nib & 7) - 3)
    (math.max(-32768, math.min(32767, p0)),
      math.max(0, math.min(88, idx + adv)))
  }

  test("imaEncodeSample advances state exactly as the decoder will") {
    var pred = 0; var idx = 0
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val s = rng.nextInt(65536) - 32768
      val (nib, p, ni) = Codecs.imaEncodeSample(s, pred, idx)
      val (p2, ni2) = replay(nib, pred, idx)
      assert(p === p2 && ni === ni2)
      pred = p; idx = ni
    }
  }

  test("ADPCM container byte layout: payload at 60, sizes consistent") {
    val spb = 9; val n = 18 // 2 blocks, mono
    val wav = Codecs.encodeWavImaAdpcm(8000, 1, n, spb, 0, (_, i) => i * 100)
    val blockAlign = 4 + (spb - 1) / 2
    assert(wav.length === 60 + 2 * blockAlign)
    def le32(o: Int) = (wav(o) & 0xff) | ((wav(o + 1) & 0xff) << 8) |
      ((wav(o + 2) & 0xff) << 16) | ((wav(o + 3) & 0xff) << 24)
    assert(le32(4) === wav.length - 8, "RIFF size")
    assert(new String(wav, 52, 4, "US-ASCII") === "data")
    assert(le32(56) === 2 * blockAlign, "data chunk length")
    assert(le32(48) === n, "fact frame count")
    // block 0 header: predictor = first sample (0), index byte = 0
    assert(((wav(60) & 0xff) | ((wav(61) & 0xff) << 8)) === 0)
    // block 1 header predictor = sample(9) = 900
    assert((((wav(60 + blockAlign) & 0xff) |
      ((wav(60 + blockAlign + 1) & 0xff) << 8)) << 16) >> 16 === 900)
  }

  test("encodeWavImaAdpcm round-trips: decode == encoder's own predictor") {
    for (ch <- Seq(1, 2)) {
      val spb = 17; val n = 34
      def sample(c: Int, i: Int): Int =
        (math.sin(i * 0.3 + c) * 12000).toInt
      val wav = Codecs.encodeWavImaAdpcm(8000, ch, n, spb, 5, sample)
      val h = Codecs.decodeWavHeader(wav).get
      assert(h.format === "wav-adpcm" && h.nSamples === n && h.channels === ch)
      val (_, mix) = Codecs.decodeWavMix(wav).get
      assert(mix.length === n)
      // independent replay: run the encoder per channel, tracking the
      // decoded predictor through the test's own recurrence
      val pred = new Array[Int](ch); val idx = Array.fill(ch)(5)
      for (blk <- 0 until n / spb) {
        val base = blk * spb
        var want = 0
        for (c <- 0 until ch) { pred(c) = sample(c, base); want += pred(c) }
        assert(mix(base) === want, s"ch=$ch block $blk header sample")
        for (j <- 1 until spb) {
          var sum = 0
          for (c <- 0 until ch) {
            val (nib, _, _) = Codecs.imaEncodeSample(sample(c, base + j), pred(c), idx(c))
            val (p, ni) = replay(nib, pred(c), idx(c))
            pred(c) = p; idx(c) = ni; sum += p
          }
          assert(mix(base + j) === sum, s"ch=$ch sample ${base + j}")
        }
      }
    }
  }

  test("encodeWavImaAdpcmRaw decode == closed-form recurrence replay") {
    val spb = 65; val blocks = 2; val id = 11L
    def pred0(b: Int) = (((id * 97 + b * 41L) % 4096) - 2048).toInt
    def index0(b: Int) = ((id * 31 + b * 17L) % 89).toInt
    def nib(b: Int, j: Int) = ((id * 13 + b * 29L + j * 7L) % 16).toInt
    val wav = Codecs.encodeWavImaAdpcmRaw(8000, spb * blocks, spb,
      pred0, index0, nib)
    val (h, mix) = Codecs.decodeWavMix(wav).get
    assert(h.nSamples === spb * blocks)
    for (b <- 0 until blocks) {
      var p = pred0(b); var ix = index0(b)
      assert(mix(b * spb) === p, s"block $b header")
      for (j <- 0 until spb - 1) {
        val (np, ni) = replay(nib(b, j), p, ix)
        p = np; ix = ni
        assert(mix(b * spb + j + 1) === p, s"block $b nibble $j")
      }
    }
  }

  test("decodeWavHeader rejects blockAlign too small for the interleave") {
    // take a valid container and shrink its advertised blockAlign: the
    // nibble reads would run past the data chunk, so the header parse
    // must refuse (None), not crash downstream
    val wav = Codecs.encodeWavImaAdpcm(8000, 1, 9, 9, 0, (_, i) => i)
    val (fo, _) = {
      // fmt chunk body starts at 20 in this fixed layout
      (20, ())
    }
    val bad = wav.clone()
    bad(fo + 12) = 1; bad(fo + 13) = 0 // blockAlign = 1
    assert(Codecs.decodeWavHeader(bad).isEmpty)
    // spb too large for the real blockAlign is equally malformed
    val bad2 = wav.clone()
    bad2(fo + 18) = 65; bad2(fo + 19) = 0 // spb = 65 but blockAlign = 8
    assert(Codecs.decodeWavHeader(bad2).isEmpty)
    assert(Codecs.decodeWavHeader(wav).nonEmpty)
  }
}
