package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** VP8L decoder: spec-pinned vectors for the parts most likely to be
  * misread (distance-map order, prefix-value ranges, CL-code order),
  * plus encoder/decoder round-trips covering every decode path —
  * simple and normal prefix codes (incl. 16/17/18 repeats), LZ77
  * left-runs, color cache, meta groups, and all four transforms. */
class WebpSpec extends AnyFunSuite {

  // a deterministic multi-color test image (non-trivial in every
  // channel, some repetition so runs/cache paths have material)
  private def pix(x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y * 3) % 256, (x * 2 + y * 11) % 256, (x * 13 + y * 5) % 256)

  private def flat(x: Int, y: Int): (Int, Int, Int) =
    if ((x / 4 + y / 4) % 2 == 0) (200, 30, 90) else (10, 220, 60)

  private def expectPixels(w: Int, h: Int,
      p: (Int, Int) => (Int, Int, Int)): Array[Int] =
    Array.tabulate(w * h) { i =>
      val (r, g, b) = p(i % w, i / w)
      0xff000000 | (r << 16) | (g << 8) | b
    }

  private def roundTrip(w: Int, h: Int, p: (Int, Int) => (Int, Int, Int),
      label: String)(encode: => Array[Byte]): Unit = {
    val bytes = encode
    val got = Webp.decodeWebp(bytes)
    assert(got.isDefined, s"$label: decode failed")
    val (gw, gh, px) = got.get
    assert(gw === w && gh === h, s"$label: dims")
    assert(px.toSeq === expectPixels(w, h, p).toSeq, s"$label: pixels")
  }

  test("round-trip: plain literals (normal codes), odd dims") {
    roundTrip(13, 7, pix, "plain")(Webp.encodeWebpLossless(13, 7, pix))
  }

  test("round-trip: subtract-green transform") {
    roundTrip(16, 9, pix, "sgreen")(
      Webp.encodeWebpLossless(16, 9, pix, subtractGreen = true))
  }

  test("round-trip: every predictor mode 0..13") {
    for (mode <- 0 to 13)
      roundTrip(11, 8, pix, s"pred$mode")(
        Webp.encodeWebpLossless(11, 8, pix, predictorMode = Some(mode)))
  }

  test("round-trip: color transform (uniform cte), also stacked with subtract-green") {
    roundTrip(12, 10, pix, "color")(
      Webp.encodeWebpLossless(12, 10, pix, colorTransform = Some((37, 201, 13))))
    roundTrip(12, 10, pix, "color+sg")(
      Webp.encodeWebpLossless(12, 10, pix, colorTransform = Some((250, 5, 128)),
        subtractGreen = true))
  }

  test("round-trip: palette with 1/2/4-bit pixel bundling and unpacked") {
    // 2 colors → 1-bit (8 px/byte); flat() has exactly 2
    roundTrip(19, 6, flat, "pal2")(
      Webp.encodeWebpLossless(19, 6, flat, palette = true))
    // 3 colors → 2-bit
    def p3(x: Int, y: Int): (Int, Int, Int) = ((x + y) % 3) match {
      case 0 => (1, 2, 3); case 1 => (200, 100, 50); case _ => (9, 9, 9)
    }
    roundTrip(10, 10, p3, "pal4")(
      Webp.encodeWebpLossless(10, 10, p3, palette = true))
    // 11 colors → 4-bit
    def p11(x: Int, y: Int): (Int, Int, Int) = {
      val k = (x * 3 + y) % 11; (k * 20, 255 - k * 9, k * k % 256)
    }
    roundTrip(9, 11, p11, "pal16")(
      Webp.encodeWebpLossless(9, 11, p11, palette = true))
    // 40 colors → no bundling
    def p40(x: Int, y: Int): (Int, Int, Int) = {
      val k = (x + y * 7) % 40; (k * 6 % 256, k * 11 % 256, 40 + k)
    }
    roundTrip(14, 9, p40, "pal256")(
      Webp.encodeWebpLossless(14, 9, p40, palette = true))
  }

  test("round-trip: LZ77 left-runs, incl. a run crossing row boundaries and the 4096 cap") {
    def runs(x: Int, y: Int): (Int, Int, Int) =
      if (y < 40) (50, 60, 70) else pix(x, y)
    // 80*52 = 4160 pixels; rows 0..39 are one 3200-px run → exercises
    // long length prefixes with extra bits and row-crossing copies
    roundTrip(80, 52, runs, "runs")(
      Webp.encodeWebpLossless(80, 52, runs, lz77Runs = true))
    // >4096 identical pixels forces the cap → two copies back-to-back
    def const(x: Int, y: Int): (Int, Int, Int) = (5, 6, 7)
    roundTrip(70, 70, const, "cap")(
      Webp.encodeWebpLossless(70, 70, const, lz77Runs = true))
  }

  test("round-trip: color cache (several sizes) with and without runs") {
    for (bits <- Seq(1, 4, 8))
      roundTrip(24, 16, flat, s"cache$bits")(
        Webp.encodeWebpLossless(24, 16, flat, cacheBits = bits))
    roundTrip(24, 16, flat, "cache+runs")(
      Webp.encodeWebpLossless(24, 16, flat, cacheBits = 6, lz77Runs = true))
  }

  test("round-trip: meta prefix groups (2-way split)") {
    roundTrip(22, 9, pix, "meta")(
      Webp.encodeWebpLossless(22, 9, pix, metaSplit = true))
  }

  test("round-trip: stacked predictor + subtract-green + cache + runs") {
    def mix(x: Int, y: Int): (Int, Int, Int) =
      if (x < 8) (40, 80, 120) else pix(x, y)
    roundTrip(32, 21, mix, "stack")(
      Webp.encodeWebpLossless(32, 21, mix, subtractGreen = true,
        predictorMode = Some(7), cacheBits = 5, lz77Runs = true))
  }

  test("spec vectors: distance neighborhood map prefix and plane-code arithmetic") {
    // the spec's published table, first 34 entries verbatim
    val specPrefix = Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2))
    assert(Webp.DistMap.length === 120)
    assert(Webp.DistMap.take(specPrefix.length).toSeq === specPrefix)
    // every map entry yields a positive distance for xsize > 16
    assert(Webp.DistMap.forall { case (dx, dy) =>
      dy * 17 + dx >= 1 || (dx, dy) == (0, 0) })
  }

  test("spec vectors: code-length-code order") {
    assert(Webp.ClOrder.toSeq === Seq(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7,
      8, 9, 10, 11, 12, 13, 14, 15))
    assert(Webp.ClOrder.sorted.toSeq === (0 until 19))
  }

  test("container: lossy VP8 header parses dims; junk and torn containers are quarantined") {
    // hand-built minimal VP8 (lossy) chunk: frame tag + start code + dims
    val p = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (320 & 0xff).toByte, (320 >> 8).toByte,
      (240 & 0xff).toByte, (240 >> 8).toByte)
    val riff = new scala.collection.mutable.ArrayBuffer[Byte]()
    def tag(s: String) = s.foreach(c => riff += c.toByte)
    def u32(v: Int) = { riff += (v & 0xff).toByte; riff += ((v >> 8) & 0xff).toByte
      riff += ((v >> 16) & 0xff).toByte; riff += ((v >> 24) & 0xff).toByte }
    tag("RIFF"); u32(4 + 8 + p.length); tag("WEBP"); tag("VP8 "); u32(p.length)
    riff ++= p
    assert(Webp.decodeWebpHeader(riff.toArray) === Some(("webp", 320, 240, 3)))
    assert(Webp.decodeWebp(riff.toArray).isEmpty, "lossy is not decodable here")

    assert(Webp.decodeWebpHeader("not a webp at all".getBytes).isEmpty)
    val good = Webp.encodeWebpLossless(8, 8, pix)
    assert(Webp.decodeWebpHeader(good) === Some(("webp-l", 8, 8, 4)))
    // truncate mid-bitstream: quarantine, not an exception
    assert(Webp.decodeWebp(good.take(good.length / 2)).isEmpty)
    // flip the VP8L version bits: refused
    val badVer = good.clone()
    badVer(24) = (badVer(24) | 0xE0.toByte).toByte // version field ≠ 0
    assert(Webp.decodeWebp(badVer).isEmpty)
  }

  test("property: random images round-trip through random encode-path combinations") {
    // deterministic ScalaCheck-style loop (the KernelPropertiesSpec
    // pattern): any divergence is a decoder or encoder bug, never a
    // tuning issue — VP8L is lossless by definition
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 30)
      s <- Gen.choose(0, Int.MaxValue - 1)
      few <- Gen.oneOf(true, false) // few-colors regime feeds runs/cache/palette
      sg <- Gen.oneOf(true, false)
      pred <- Gen.option(Gen.choose(0, 13))
      ct <- Gen.option(Gen.choose(0, 255 * 65536))
      pal <- Gen.oneOf(true, false)
      cache <- Gen.oneOf(0, 0, 3, 7)
      runs <- Gen.oneOf(true, false)
      meta <- Gen.oneOf(true, false)
    } yield (w, h, s, few, sg, pred, ct, pal, cache, runs, meta)
    var seed = Seed(1234L)
    (1 to 120).foreach { _ =>
      val (w, h, s, few, sg, pred, ct, pal, cache, runs, meta) =
        gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val p: (Int, Int) => (Int, Int, Int) =
        if (few) (x, y) => {
          val k = (x / 3 + y / 2 + s) % 4
          (k * 61 % 256, (k * 97 + s) % 256, k * 133 % 256)
        }
        else (x, y) =>
          ((s + x * 31 + y * 17) % 256, (s * 3 + x * 7 + y * 41) % 256,
            (s * 7 + x * 11 + y * 3) % 256)
      // palette excludes the other transforms by the fixture contract
      val usePal = pal && few
      val bytes =
        if (usePal) Webp.encodeWebpLossless(w, h, p, palette = true,
          cacheBits = cache, lz77Runs = runs, metaSplit = meta)
        else Webp.encodeWebpLossless(w, h, p, subtractGreen = sg,
          predictorMode = pred,
          colorTransform = ct.map(v =>
            (v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff)),
          cacheBits = cache, lz77Runs = runs, metaSplit = meta)
      val got = Webp.decodeWebp(bytes)
      assert(got.isDefined,
        s"decode failed: $w x $h sg=$sg pred=$pred ct=$ct pal=$usePal cache=$cache runs=$runs meta=$meta")
      assert(got.get._3.toSeq === expectPixels(w, h, p).toSeq,
        s"pixels: $w x $h sg=$sg pred=$pred ct=$ct pal=$usePal cache=$cache runs=$runs meta=$meta")
    }
  }

  test("VP8X: animated container yields canvas dims + ANMF frame count; VP8X still falls through to its VP8L chunk") {
    def u24(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte)
    // VP8X payload: flags (anim|alpha), 3 reserved, canvas w-1 / h-1
    def vp8x(flags: Int, w: Int, h: Int): Array[Byte] =
      Array[Byte](flags.toByte, 0, 0, 0) ++ u24(w - 1) ++ u24(h - 1)
    // ANMF payload: x/2, y/2, w-1, h-1 (24-bit each), duration, flags,
    // then the frame's image chunk — content is opaque to the counter
    def anmf(w: Int, h: Int): Array[Byte] =
      u24(0) ++ u24(0) ++ u24(w - 1) ++ u24(h - 1) ++ u24(40) ++
        Array[Byte](0) ++ Array.fill[Byte](6)(0x11)
    val anim = Webp.wrapRiffChunks(Seq(
      "VP8X" -> vp8x(0x12, 320, 200),
      "ANIM" -> Array.fill[Byte](6)(0),
      "ANMF" -> anmf(320, 200),
      "ANMF" -> anmf(320, 200),
      "ANMF" -> anmf(160, 100)))
    assert(Webp.decodeWebpHeader(anim) === Some(("webp-anim", 320, 200, 4)))
    assert(Webp.animFrameCount(anim) === Some(3))
    assert(Webp.decodeWebp(anim).isEmpty, "frame pixels are out of scope")
    // no alpha flag → 3 channels
    val anim3 = Webp.wrapRiffChunks(Seq(
      "VP8X" -> vp8x(0x02, 8, 8), "ANMF" -> anmf(8, 8)))
    assert(Webp.decodeWebpHeader(anim3) === Some(("webp-anim", 8, 8, 3)))
    // VP8X STILL with a top-level VP8L chunk: exact still dims win
    val still = Webp.encodeWebpLossless(8, 8, pix)
    // rebuild: VP8X + the VP8L chunk from the still container
    val vp8lPayload = java.util.Arrays.copyOfRange(still, 20,
      20 + ((still(16) & 0xff) | ((still(17) & 0xff) << 8) |
        ((still(18) & 0xff) << 16) | ((still(19) & 0xff) << 24)))
    val extStill = Webp.wrapRiffChunks(Seq(
      "VP8X" -> vp8x(0x10, 8, 8), "VP8L" -> vp8lPayload))
    assert(Webp.decodeWebpHeader(extStill) === Some(("webp-l", 8, 8, 4)))
    assert(Webp.decodeWebp(extStill).map(_._3.toSeq) ===
      Some(expectPixels(8, 8, pix).toSeq))
    // the meta stage reports the ANMF count like GIF's frame walk
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val meta = Multimodal.decodeMetaAuto(
      Seq((1L, "image", anim)).toDF("doc_id", "media_type", "media"))
      .collect()(0)
    assert(meta.getString(2) === "webp-anim" && meta.getInt(7) === 3 &&
      meta.getBoolean(8))
  }

  test("crafted chunk sizes near 2^31 quarantine instead of crashing (overflow guard)") {
    // RIFF/WEBP with one chunk declaring size 0x7FFFFFF0: Int
    // arithmetic would overflow the bounds check and throw from
    // copyOfRange/String — the walk must return None instead
    for (size <- Seq(0x7FFFFFF0, 0x7FFFFFFF, 0xFFFFFFF0)) {
      val b = new scala.collection.mutable.ArrayBuffer[Byte]()
      def tag(s: String) = s.foreach(c => b += c.toByte)
      def u32(v: Int) = { b += (v & 0xff).toByte; b += ((v >> 8) & 0xff).toByte
        b += ((v >> 16) & 0xff).toByte; b += ((v >> 24) & 0xff).toByte }
      tag("RIFF"); u32(100); tag("WEBP"); tag("VP8L"); u32(size)
      b ++= Array.fill[Byte](32)(0x2f)
      val bytes = b.toArray
      assert(Webp.decodeWebpHeader(bytes).isEmpty, f"size=$size%08x")
      assert(Webp.decodeWebp(bytes).isEmpty, f"size=$size%08x")
      assert(Webp.animFrameCount(bytes).isEmpty, f"size=$size%08x")
      // and through the codec dispatch (the path crawl bytes take)
      assert(Codecs.decodeHeader(bytes).isEmpty, f"size=$size%08x")
      assert(Codecs.decodeGray(bytes).isEmpty, f"size=$size%08x")
    }
  }

  test("1x1 and single-row/column images") {
    roundTrip(1, 1, pix, "1x1")(Webp.encodeWebpLossless(1, 1, pix))
    roundTrip(9, 1, pix, "9x1")(Webp.encodeWebpLossless(9, 1, pix))
    roundTrip(1, 9, pix, "1x9")(Webp.encodeWebpLossless(1, 9, pix))
  }
}
