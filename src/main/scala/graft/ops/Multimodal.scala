package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque BINARY
  * columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-batched functions over the
  * binary column.
  *
  * The decode kernels themselves are STUBBED (this container has no
  * image/audio codecs): `StubCodec` derives deterministic fake
  * dimensions from the payload bytes. Everything around the stub — the
  * schema contract, the iterator-based batching (one codec init per
  * partition, not per row), the column pruning (only doc_id + media
  * reach the decode stage) — is the real production shape: swap
  * `StubCodec.decode` for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType)))

  /** STUB decode: deterministic pseudo-metadata from payload bytes.
    * Replace with a real codec (libjpeg/ffmpeg) behind the same
    * signature. */
  object StubCodec {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val n = bytes.length
      mediaType match {
        case "image" => (256 + n % 256, 256 + (n * 31) % 256, 3, 1)
        case "video" => (640, 360, 3, 1 + n % 300)
        case "audio" => (0, 0, 1 + n % 2, 1 + n / 64)
        case _       => (0, 0, 0, 0)
      }
    }
  }

  /** Wrap a documents table as a fake media table: payload = utf-8
    * bytes of the text (stands in for real image/video bytes), media
    * type assigned deterministically. Real pipelines read this shape
    * straight off parquet with a BINARY column. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("video"), lit("audio")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      col("text").cast(BinaryType).as("media"))

  /** Decode stage: mapPartitions over (doc_id, media_type, media) —
    * iterator-based so a real codec initializes once per partition.
    * Column pruning upstream is the caller's job (select exactly these
    * three columns before calling). */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val pruned = media.select("doc_id", "media_type", "media")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaMetaSchema)
    pruned.mapPartitions { rows =>
      // real impl: val codec = Codec.open() here, once per partition
      rows.map { r =>
        val id = r.getLong(0); val mt = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val (w, h, c, f) = StubCodec.decode(mt, bytes)
        Row(id, mt, bytes.length.toLong, w, h, c, f)
      }
    }(enc)
  }

  /** [[decodeMetaAuto]]'s schema: real-decode columns plus the
    * `decoded` honesty flag and the detected container format. */
  val mediaMetaAutoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("format", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("decoded", BooleanType)))

  /** REAL decode stage with stub fallback: payloads whose magic bytes
    * parse as BMP / binary PPM/PGM / PNG get their ACTUAL header
    * dimensions ([[Codecs.decodeHeader]] — pure-JVM byte parsing, no
    * codec libraries) and `decoded = true`; anything else falls back
    * to [[StubCodec]] with `decoded = false`, so downstream stages can
    * tell honest metadata from fabricated. Same iterator/batching
    * shape as [[decodeMeta]]; raster formats are single-frame. */
  /** Wrap a partition's decode iterator so its per-outcome counts hit
    * the [[Ledger]] exactly once, at exhaustion — the r13 verdict
    * item 4 accounting: a 100 TB run can read what fraction of its
    * media column was actually decoded off the artifact's ledger
    * section instead of trusting the stub path to be rare. Counting
    * rides the existing iterator (no extra pass); `outcome` maps each
    * emitted row to its counter suffix. A consumer that stops early
    * (limit/take) never exhausts the iterator and ledgers nothing for
    * that partition — counts describe what actually decoded, which is
    * the honest number. */
  private def ledgeredDecode(stage: String, it: Iterator[Row],
      outcome: Row => String): Iterator[Row] = new Iterator[Row] {
    private val counts = scala.collection.mutable.Map.empty[String, Long]
    private var noted = false
    def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !noted) {
        noted = true
        val total = counts.values.sum
        counts.toSeq.sortBy(_._1).foreach { case (k, n) =>
          Ledger.add(s"media.$stage.$k", n,
            s"of $total payloads this partition")
        }
      }
      h
    }
    def next(): Row = {
      val r = it.next()
      val k = outcome(r)
      counts.update(k, counts.getOrElse(k, 0L) + 1L)
      r
    }
  }

  def decodeMetaAuto(media: DataFrame): DataFrame = {
    val pruned = media.select("doc_id", "media_type", "media")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaMetaAutoSchema)
    pruned.mapPartitions { rows =>
      ledgeredDecode("decode_meta", rows.map { r =>
        val id = r.getLong(0); val mt = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        // universal magic-byte dispatch: stills, then audio (n_frames
        // = PCM sample frames, the audio meaning of "frame"), then
        // video, then the stub fallback
        Codecs.decodeHeader(bytes) match {
          case Some(h) =>
            // rasters are single-frame except GIF (descriptor walk)
            // and animated WebP (ANMF chunk count)
            val frames =
              if (h.format == "gif")
                Gif.decodeGifHeader(bytes).map(_._3).getOrElse(1)
              else if (h.format == "webp-anim")
                Webp.animFrameCount(bytes).getOrElse(1)
              else 1
            Row(id, mt, h.format, bytes.length.toLong, h.width, h.height,
              h.channels, frames, true)
          case None => Codecs.decodeWavHeader(bytes) match {
            case Some(a) =>
              Row(id, mt, a.format, bytes.length.toLong, 0, 0, a.channels,
                a.nSamples, true)
            case None => Codecs.decodeY4mHeader(bytes) match {
              case Some(v) =>
                Row(id, mt, v.format, bytes.length.toLong, v.width,
                  v.height, 3, v.nFrames, true)
              case None =>
                val (w, hh, c, f) = StubCodec.decode(mt, bytes)
                Row(id, mt, "unknown", bytes.length.toLong, w, hh, c, f, false)
            }
          }
        }
      }, r => if (r.getBoolean(8)) "real" else "stub")
    }(enc)
  }

  /** Pixel decode stage: (doc_id, width, height, gray, decoded) with
    * `gray` = REAL top-left-origin luma bytes for decodable payloads
    * ([[Codecs.decodeGray]]), or the raw payload (decoded = false)
    * otherwise — so [[phash64]] over `gray` is the classic block-mean
    * image hash on real pixels when the format allows, and degrades to
    * the byte fingerprint where it doesn't. Media bytes still never
    * ride a shuffle: this stage runs before any exchange and emits
    * w×h-byte luma planes. */
  def decodeGrayStage(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("gray", BinaryType),
      StructField("decoded", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      // three ledgered outcomes: `real` (decoded pixels), `quarantined`
      // (supported variant whose body is malformed — data, not an
      // error), `fallback` (unknown magic, or a valid container whose
      // VARIANT is outside the pure-JVM decode set — the disclosed
      // fingerprint path, NOT corpus damage). The verdict comes from
      // each codec's own capability declaration
      // ([[Codecs.grayOutcome]]), not a format whitelist (r14 advisor
      // finding: whitelisting misfiled out-of-set 16-bpp BMP /
      // sub-8-bit PNG as quarantined). One header parse serves decode
      // and classification; a width sentinel of -1 carries the
      // quarantine verdict to the outcome fn and is normalized back
      // to the schema's 0 afterwards.
      val tagged = rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Codecs.decodeHeader(bytes) match {
          case None => Row(id, 0, 0, bytes, false)
          case Some(h) =>
            Codecs.grayOutcome(bytes, h) match {
              case Codecs.GrayOutcome.Real(w, hh, g) => Row(id, w, hh, g, true)
              case Codecs.GrayOutcome.Unsupported    => Row(id, 0, 0, bytes, false)
              case Codecs.GrayOutcome.Malformed      => Row(id, -1, 0, bytes, false)
            }
        }
      }
      ledgeredDecode("decode_gray", tagged,
        r => if (r.getBoolean(4)) "real"
             else if (r.getInt(1) == -1) "quarantined" else "fallback")
        .map(r => if (r.getInt(1) == -1)
          Row(r.getLong(0), 0, 0, r.getAs[Array[Byte]](3), false) else r)
    }(enc)
  }

  /** Feature stage on decoded metadata: pure column math (aspect
    * ratio, pixel count, duration-ish) — stays in codegen. */
  def mediaFeatures(meta: DataFrame): DataFrame =
    meta.select(
      col("doc_id"), col("media_type"), col("byte_len"),
      col("width"), col("height"), col("channels"), col("n_frames"),
      when(col("height") > 0, col("width").cast(DoubleType) / col("height"))
        .otherwise(lit(0.0)).as("aspect"),
      (col("width").cast(LongType) * col("height") * col("n_frames")).as("total_pixels"))

  /** Resize planning: fit each visual medium into a maxW×maxH box
    * preserving aspect (never upscale) — pure column math over decoded
    * metadata; the pixel resample itself would be one more
    * mapPartitions codec stage over (media, out_w, out_h). */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    meta.filter(col("media_type").isin("image", "video") && col("width") > 0 && col("height") > 0)
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        floor(col("width") * scale).cast(IntegerType).as("out_w"),
        floor(col("height") * scale).cast(IntegerType).as("out_h"))
  }

  /** 64-bit block-mean perceptual hash of a media payload column — the
    * codegen kernel [[graft.functions.Kernels.phash64]]. Under the
    * stubbed codec it fingerprints the raw payload bytes; with a real
    * codec the decode stage hands it downsampled grayscale pixels and
    * it becomes the classic blockhash. */
  def phash64(media: Column): Column =
    graft.functions.GraftFunctions.phash64(media)

  /** Near-duplicate MEDIA pairs by perceptual-hash hamming distance:
    * one fingerprint pass over the payload column, then the same
    * multi-index-hashing blocking as text simhash
    * ([[Dedup.hammingPairs]] — exact candidate generation for the
    * default radius, capped hot buckets, pairs deduped before the
    * bit_count verify). The 100 TB shape: payloads are read ONCE to
    * produce 8-byte fingerprints; every join and shuffle after that
    * carries (doc_id, fp) only — media bytes never ride a shuffle. */
  def phashPairs(media: DataFrame, id: Column, payload: Column,
      maxHamming: Int = 3, chunks: Int = 0, bucketCap: Int = 100000,
      materialize: Boolean = true): DataFrame =
    Dedup.hammingPairs(
      media.select(id.as("doc_id"), phash64(payload).as("fp")),
      maxHamming, chunks, bucketCap, materialize)

  /** Persist the media corpus' perceptual hashes
    * ([[graft.ops.Dedup.buildFingerprintIndex]]): the one pass over
    * payload bytes becomes write-once, and each new media increment
    * dedups against the whole corpus via [[phashAgainstIndex]] at 16
    * bytes per stored doc. */
  def buildPhashIndex(media: DataFrame, id: Column, payload: Column,
      path: String): Unit =
    Dedup.buildFingerprintIndex(
      media.select(id.as("doc_id"), phash64(payload).as("fp")), path)

  /** Append an increment's perceptual hashes (idempotent on doc_id). */
  def appendToPhashIndex(spark: SparkSession, indexPath: String,
      media: DataFrame, id: Column, payload: Column): Unit =
    Dedup.appendToFingerprintIndex(spark, indexPath,
      media.select(id.as("doc_id"), phash64(payload).as("fp")))

  /** Near-dup media pairs between an increment and the stored phash
    * index — [[phashPairs]]' incremental twin via
    * [[graft.ops.Dedup.hammingAgainstIndex]]. */
  def phashAgainstIndex(spark: SparkSession, indexPath: String,
      media: DataFrame, id: Column, payload: Column, maxHamming: Int = 3,
      chunks: Int = 0, bucketCap: Int = 100000,
      materialize: Boolean = true): DataFrame =
    Dedup.hammingAgainstIndex(spark, indexPath,
      media.select(id.as("doc_id"), phash64(payload).as("fp")),
      maxHamming, chunks, bucketCap, materialize)

  /** Deterministic BMP-variant fixture over the BI_RGB depth
    * envelope: id%4 cycles raw text (fallback), 8-bit PALETTE
    * (gray-ramp palette (i,i,i) makes BT.601 luma exactly the
    * index), 24-bit BGR, and 32-bit BGRA (opaque alpha the decoder
    * ignores) — dims and pixels closed-form over (doc_id, x, y). */
  def syntheticBmpVariant(id: Long, text: String): Array[Byte] =
    if (id % 4 == 0) text.getBytes("UTF-8")
    else {
      val w = 3 + (id % 14).toInt; val h = 2 + (id % 11).toInt
      (id % 4) match {
        case 1 => Codecs.encodeBmp8(w, h,
          (0 until 256).map(i => (i, i, i)),
          (x, y) => ((id + 5L * x + 9L * y) % 256).toInt)
        case 2 => Codecs.encodeBmp(w, h, (x, y) => {
          val v = ((id + 7L * x + 3L * y) % 256).toInt
          (v, (v + 51) % 256, (v + 102) % 256)
        })
        case _ => Codecs.encodeBmp32(w, h, (x, y) => {
          val v = ((id * 3 + 2L * x + 11L * y) % 256).toInt
          (v, (v + 33) % 256, (v + 77) % 256)
        })
      }
    }

  /** Deterministic REAL-container fixture for the decode oracles:
    * docs cycle through raw-text (undecodable, exercises the stub
    * fallback), real BMP ×2, real PPM, real PGM, LOSSY WebP (VP8
    * key frame, DC-exact per-MB-flat, ragged dims), LOSSLESS WebP
    * (VP8L, closed-form RGB), and ANIMATED WebP (quadrant VP8 frames
    * whose poster frame the gray stage decodes) — so the PRE-EXISTING
    * gray-decode corpus exercises every pure-JVM decoder family and
    * the ledger's decode_gray.real share reflects the VP8 decoders
    * (r15 verdict item 1: the old id%5 cycle had no WebP at all, so
    * the fallback share could not move). Dimensions and pixel values
    * stay in closed form over doc_id; the WebP containers are padded
    * to closed-form byte lengths with a trailing JUNK chunk
    * ([[Webp.padRiffTo]]) so the metadata oracle keeps recomputing
    * byte_len in SQL despite the bool-encoder's variable output. */
  def syntheticContainer(id: Long, text: String): Array[Byte] = {
    val w = (1 + id % 37).toInt; val h = (1 + id % 23).toInt
    def pix(x: Int, y: Int): (Int, Int, Int) = {
      val v = ((x * 31 + y * 17 + id) % 256).toInt
      (v, (v + 85) % 256, (v + 170) % 256)
    }
    id % 8 match {
      case 0     => text.getBytes("UTF-8")
      case 1 | 2 => Codecs.encodeBmp(w, h, pix)
      case 3     => Codecs.encodePpm(w, h, pix)
      case 4     => Codecs.encodePgm(w, h, (x, y) => pix(x, y)._1)
      case 5     =>
        val wv = 16 * (1 + (id % 3).toInt) + 5
        val hv = 16 * (1 + ((id / 8) % 2).toInt) + 3
        val (p, _) = Vp8.encodeVp8Still(wv, hv,
          (bx, by) => ((id * 7 + 11L * bx + 17L * by) % 256).toInt,
          qIndex = (id % 35).toInt, nParts = 1, modeSeed = (id % 5).toInt)
        Webp.padRiffTo(Webp.wrapRiffChunks(Seq("VP8 " -> p)),
          2048 + 128 * (id % 3).toInt)
      case 6     =>
        val wv = 4 + (id % 9).toInt; val hv = 3 + (id % 7).toInt
        Webp.padRiffTo(Webp.encodeWebpLossless(wv, hv, (x, y) => (
          ((id + 3L * x + 7L * y) % 256).toInt,
          ((2L * id + 5L * x + y) % 256).toInt,
          ((3L * id + x + 11L * y) % 256).toInt)),
          1024 + 64 * (id % 5).toInt)
      case _     =>
        val n = 2 + (id % 3).toInt
        val frames = (0 until n).map { f =>
          val v = ((id * 3 + 7L * f) % 256).toInt
          val (p, _) = Vp8.encodeVp8Still(16, 16, (_, _) => v,
            qIndex = ((id + f) % 35).toInt, nParts = 1,
            modeSeed = ((id + f) % 5).toInt)
          ("VP8 ", p, 20 * (f % 2), 20 * (f / 2), 40 + f,
            ((id + f) % 2).toInt)
        }
        Webp.padRiffTo(Webp.wrapAnimFlagged(40, 40, frames),
          4096 + 128 * (id % 3).toInt)
    }
  }

  /** Frame-sampling plan: every `stride`-th frame index per video —
    * an explode, not a decode; the decode of selected frames would be
    * another mapPartitions stage. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  // ------------------------------------------------------------- audio

  /** REAL audio decode stage: RIFF/WAVE headers parsed from actual
    * bytes ([[Codecs.decodeWavHeader]] — PCM 8/16-bit, chunk-walk
    * tolerant of LIST/fact chunks). Same mapPartitions batching as the
    * image stages; undecodable payloads surface `decoded = false` with
    * zeroed fields rather than fabricated ones. */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("format", StringType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("byte_len", LongType),
      StructField("decoded", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        Codecs.decodeWavHeader(b) match {
          case Some(h) =>
            Row(id, h.format, h.sampleRate, h.channels, h.bitsPerSample,
              h.nSamples, b.length.toLong, true)
          case None => Row(id, "unknown", 0, 0, 0, 0, b.length.toLong, false)
        }
      }
    }(enc)
  }

  /** PCM decode to the integer mono mixdown (per-frame CHANNEL SUM —
    * no division, so the values are exact in any engine): one pass
    * over payload bytes; everything downstream carries int arrays,
    * never media bytes. */
  def decodeAudioMixStage(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("mix", ArrayType(IntegerType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        // Drop zero-sample decodes (truncated/garbled data chunk): a
        // clip with no frames has no mixdown semantics, and emitting
        // an empty array would trap every downstream
        // element_at(mix, size(mix)) consumer.
        Codecs.decodeWavMix(b).filter(_._2.nonEmpty).map { case (h, mix) =>
          Row(id, h.sampleRate, h.channels, mix.toSeq)
        }
      }
    }(enc)
  }

  /** Windowed audio features over the decoded mixdown — pure
    * higher-order-function column math (stays in codegen, no shuffle
    * until the caller aggregates): per `window`-sample window the
    * energy (Σv², 64-bit), peak (max |v|), and zero-crossing count
    * (sign flips between consecutive in-window samples). The classic
    * cheap audio-quality triple: energy gates silence, ZCR separates
    * tonal from noisy content. */
  def audioWindowFeatures(mixed: DataFrame, window: Int): DataFrame = {
    // One zip of each sample with its predecessor (prev[0] = 0, unused
    // — pos 0 is never a window-internal pair), then ONE posexplode
    // into a codegen'd hash aggregation on (doc_id, win). Deliberately
    // NOT per-window array slices + higher-order folds: slice() copies
    // each window and lambda folds run interpreted per element —
    // measured 4.05 s warm at sf0.1 vs this plan's sub-second. The
    // shuffle is harmless: partial aggregation reduces map-side output
    // to one row per (doc, window) before the exchange.
    val prev = concat(array(lit(0)),
      slice(col("mix"), lit(1), greatest(size(col("mix")) - 1, lit(0))))
    val v = col("p").getField("mix"); val pv = col("p").getField("prev")
    mixed
      .select(col("doc_id"),
        posexplode(arrays_zip(col("mix"), prev.as("prev"))).as(Seq("pos", "p")))
      .groupBy(col("doc_id"), (col("pos") / window).cast(LongType).as("win"))
      .agg(
        sum(v.cast(LongType) * v.cast(LongType)).as("sum_sq"),
        max(abs(v.cast(LongType))).as("peak"),
        sum(when(col("pos") % window =!= 0 && ((pv < 0) =!= (v < 0)), 1L)
          .otherwise(0L)).as("zc"))
  }

  /** 63-bit audio fingerprint over the decoded mixdown — the
    * energy-delta sign profile (the public Haitsma–Kalker robust-hash
    * shape, collapsed to one band): the clip splits into 64
    * position-equal windows, and bit i−1 = [E_i ≥ E_{i−1}] for
    * i = 1..63 (63 bits: no sign-bit overflow in any engine's signed
    * 64-bit int). Exact integer math end-to-end, so it is invariant
    * under transforms that preserve the energy ORDER profile —
    * channel swaps (the mixdown is a channel sum), container header
    * relabeling, plane reordering — while raw-byte hashes miss all of
    * them. Clips shorter than 64 samples are dropped (no stable
    * profile). Plan: one posexplode + two hash aggregations; the
    * per-doc fold runs over exactly 64 collected window energies. */
  def audioFingerprint(mixed: DataFrame): DataFrame =
    mixed.select(col("doc_id"), size(col("mix")).as("n"),
        posexplode(col("mix")).as(Seq("pos", "v")))
      .filter(col("n") >= 64)
      .groupBy(col("doc_id"),
        (col("pos") * 64 / col("n")).cast(IntegerType).as("win"))
      .agg(sum(col("v").cast(LongType) * col("v")).as("e"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("win"), col("e")))).as("es"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(1, size(es) - 1), CAST(0 AS BIGINT),
           (acc, i) -> acc + IF(es[i].e >= es[i - 1].e,
                                shiftleft(CAST(1 AS BIGINT), i - 1),
                                CAST(0 AS BIGINT)))""").as("fp"))

  /** Near-duplicate AUDIO pairs by fingerprint hamming distance: the
    * same exact multi-index blocking as phash/simhash
    * ([[Dedup.hammingPairs]]), fed by [[audioFingerprint]] — payload
    * bytes are read once by the decode stage and only (doc_id, fp)
    * ever shuffles. */
  def audioFingerprintPairs(media: DataFrame, maxHamming: Int = 3,
      bucketCap: Int = 100000, materialize: Boolean = true): DataFrame =
    Dedup.hammingPairs(audioFingerprint(decodeAudioMixStage(media)),
      maxHamming, 0, bucketCap, materialize)

  /** Persist the corpus' audio fingerprints (write-once, 16 B/doc) —
    * the audio family's incremental path, same store layout as
    * phash/simhash ([[Dedup.buildFingerprintIndex]]). */
  def buildAudioFpIndex(media: DataFrame, path: String): Unit =
    Dedup.buildFingerprintIndex(
      audioFingerprint(decodeAudioMixStage(media)), path)

  /** Append an increment's audio fingerprints (idempotent on doc_id). */
  def appendToAudioFpIndex(spark: SparkSession, indexPath: String,
      media: DataFrame): Unit =
    Dedup.appendToFingerprintIndex(spark, indexPath,
      audioFingerprint(decodeAudioMixStage(media)))

  /** Near-dup audio pairs between an increment and the stored
    * fingerprint index — [[audioFingerprintPairs]]' incremental twin:
    * the increment decodes its own payloads; stored docs join at 16
    * bytes each with no payload rescan. */
  def audioFpAgainstIndex(spark: SparkSession, indexPath: String,
      media: DataFrame, maxHamming: Int = 3, bucketCap: Int = 100000,
      materialize: Boolean = true): DataFrame =
    Dedup.hammingAgainstIndex(spark, indexPath,
      audioFingerprint(decodeAudioMixStage(media)),
      maxHamming, 0, bucketCap, materialize)

  // ------------------------------------------------------------- video

  /** REAL video decode stage: YUV4MPEG2 stream headers parsed from
    * actual bytes ([[Codecs.decodeY4mHeader]] — tag walk, frame count
    * verified against every FRAME marker). */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("fps_num", IntegerType),
      StructField("fps_den", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("byte_len", LongType),
      StructField("decoded", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        Codecs.decodeY4mHeader(b) match {
          case Some(h) =>
            Row(id, h.format, h.width, h.height, h.fpsNum, h.fpsDen,
              h.nFrames, b.length.toLong, true)
          case None => Row(id, "unknown", 0, 0, 0, 0, 0, b.length.toLong, false)
        }
      }
    }(enc)
  }

  /** REAL frame sampling: every `stride`-th frame's ACTUAL luma plane
    * out of the container — one payload pass per doc, emitting
    * (doc_id, frame_idx, width, height, gray). The luma planes feed
    * the same downstream consumers as still images (phash, stats);
    * media bytes are dropped at this stage and never shuffle. */
  def sampleFrameLuma(media: DataFrame, stride: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("gray", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        Codecs.decodeY4mHeader(b).toSeq.flatMap { h =>
          (0 until h.nFrames by stride).flatMap { f =>
            Codecs.y4mFrameLuma(b, h, f).map(g =>
              Row(id, f, h.width, h.height, g))
          }
        }
      }
    }(enc)
  }

  /** REAL animated-WebP frame sampling: every `stride`-th ANMF
    * frame's decoded luma ([[Webp.animFrameLumas]] — VP8 sub-frames
    * through the full RFC 6386 decoder, VP8L through the lossless
    * one), emitting (doc_id, frame_idx, frame_x, frame_y, width,
    * height, gray). The animation sibling of [[sampleFrameLuma]]:
    * frames decode standalone (per-frame subrects, no canvas
    * compositing — the training-pipeline contract), payload bytes
    * never ride a shuffle. */
  def sampleAnimWebpLuma(media: DataFrame, stride: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_x", IntegerType),
      StructField("frame_y", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("gray", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        Webp.animFrameLumas(b, stride).map(f =>
          Row(id, f.index, f.x, f.y, f.w, f.h, f.luma))
      }
    }(enc)
  }

  /** COMPOSITED animation sampling — the opt-in alternative to the
    * per-frame contract: every `stride`-th PRESENTED canvas of an
    * animated WebP or GIF ([[Webp.animCompositedLumas]] /
    * [[Gif.gifCompositedLumas]] through the shared [[Anim]] disposal
    * + blend state machine), emitting (doc_id, frame_idx, width,
    * height, gray) at canvas dimensions. Width/height are constant
    * per doc (the canvas), so downstream feature extraction sees the
    * uniform shape the viewed animation actually has. Same
    * mapPartitions batching; canvas planes never ride a shuffle. */
  def sampleCompositedLuma(media: DataFrame, stride: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("gray", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        val frames =
          if (b.length >= 12 && b(0) == 'R' && b(8) == 'W')
            Webp.animCompositedLumas(b, stride)
          else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I')
            Gif.gifCompositedLumas(b, stride)
          else Nil
        frames.map { case (fi, w, h, g) => Row(id, fi, w, h, g) }
      }
    }(enc)
  }

  /** Deterministic REAL animated-WebP fixture: 2-4 ANMF frames per
    * doc alternating LOSSY VP8 (DC-exact per-MB-flat luma via
    * [[Vp8.encodeVp8Still]]) and LOSSLESS VP8L (closed-form RGB via
    * [[Webp.encodeWebpLossless]]) sub-frames, with closed-form
    * subrect offsets and durations — so one oracle pins the ANMF
    * walk, both sub-decoders, and the header fields at once. Every
    * 7th doc raw text for the fallback path. */
  def syntheticAnimWebp(id: Long, text: String): Array[Byte] =
    if (id % 7 == 0) text.getBytes("UTF-8")
    else {
      val n = 2 + (id % 3).toInt
      val frames = (0 until n).map { f =>
        val x = 2 * (f % 3); val y = 2 * (f % 2)
        if (f % 2 == 0) {
          val side = 16 * (1 + ((id + f) % 2).toInt)
          val (p, _) = Vp8.encodeVp8Still(side, side,
            (bx, by) => ((id * 3 + 7L * f + 11L * bx + 13L * by) % 256).toInt,
            qIndex = ((id + f) % 35).toInt, nParts = 1,
            modeSeed = ((id + f) % 5).toInt)
          ("VP8 ", p, x, y, 40 + f)
        } else {
          val w = 4 + ((id + f) % 9).toInt
          val h = 3 + ((id + f) % 7).toInt
          val full = Webp.encodeWebpLossless(w, h, (px, py) => (
            ((id + 3L * px + 7L * py + f) % 256).toInt,
            ((2L * id + 5L * px + py + 3L * f) % 256).toInt,
            ((3L * id + px + 11L * py + 5L * f) % 256).toInt))
          // strip the RIFF wrapper: ANMF carries the raw VP8L chunk
          val payload = java.util.Arrays.copyOfRange(full, 20, full.length)
          ("VP8L", payload, x, y, 40 + f)
        }
      }
      val canvasW = 16 * 2 + 4 // covers every subrect
      Webp.wrapAnim(canvasW, canvasW, frames)
    }

  /** Deterministic COMPOSITED-animation fixture, WebP flavor: 2-4
    * one-macroblock VP8 frames (DC-exact, flat value v_f closed-form
    * over (doc_id, f)) at NON-OVERLAPPING quadrant offsets on a 40×40
    * canvas, disposal (ANMF D bit) and no-blend (B bit) rotating with
    * (id+f) — so each presented canvas sum is 256·v_k plus the
    * 256·v_j of every EARLIER frame whose D bit was clear, a pure
    * window sum the DuckDB oracle reproduces with no pixel code.
    * Background is the wrapper's opaque black (luma 0). Every 7th doc
    * raw text for the fallback path. */
  def syntheticAnimWebpComposited(id: Long, text: String): Array[Byte] =
    if (id % 7 == 0) text.getBytes("UTF-8")
    else {
      val n = 2 + (id % 3).toInt
      val frames = (0 until n).map { f =>
        val v = ((id * 3 + 7L * f) % 256).toInt
        val (p, _) = Vp8.encodeVp8Still(16, 16, (_, _) => v,
          qIndex = ((id + f) % 35).toInt, nParts = 1,
          modeSeed = ((id + f) % 5).toInt)
        val flags = ((id + f) % 2).toInt | (if ((id + f) % 3 == 0) 2 else 0)
        ("VP8 ", p, 20 * (f % 2), 20 * (f / 2), 40 + f, flags)
      }
      Webp.wrapAnimFlagged(40, 40, frames)
    }

  /** Deterministic COMPOSITED-animation fixture, GIF flavor: 2-4
    * flat frames (gray-ramp GCT makes luma = index = v_f closed-form)
    * at the same non-overlapping quadrant offsets on a 40×40 canvas,
    * GCE disposal rotating through none/background/previous with
    * (id+f). Frames never overlap, so restore-to-previous equals
    * restore-to-background here (the rect was virgin background —
    * the overlapping distinction is pinned in AnimCompositorSpec) and
    * the oracle's visibility rule is simply dispose==none. Every 5th
    * doc raw text for the fallback path. */
  def syntheticAnimGif(id: Long, text: String): Array[Byte] =
    if (id % 5 == 0) text.getBytes("UTF-8")
    else {
      val n = 2 + (id % 3).toInt
      val frames = (0 until n).map { f =>
        val v = ((id * 5 + 11L * f) % 256).toInt
        val dispose = 1 + ((id + f) % 3).toInt // GIF codes: none/bg/prev
        (20 * (f % 2), 20 * (f / 2), 16, 16,
          (_: Int, _: Int) => v, dispose, -1)
      }
      Gif.encodeGifAnim(40, 40, frames)
    }

  /** REAL resize stage: nearest-neighbor resample of decoded luma
    * planes ([[Codecs.resizeNearest]] — exact integer source mapping,
    * up- and downscale) to a fixed outW×outH. The execution-stage twin
    * of the planning-only [[resizePlan]]: consumes
    * [[decodeGrayStage]] / [[sampleFrameLuma]] output, emits
    * fixed-size planes ready for batched feature extraction (the
    * uniform-shape contract ML preprocessing needs). Same
    * mapPartitions batching; planes stay out of shuffles. */
  def resizeGrayStage(gray: DataFrame, outW: Int, outH: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType),
      StructField("gray", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    gray.select("doc_id", "width", "height", "gray").mapPartitions { rows =>
      rows.flatMap { r =>
        val w = r.getInt(1); val h = r.getInt(2)
        if (w <= 0 || h <= 0) None
        else Some(Row(r.getLong(0), outW, outH,
          Codecs.resizeNearest(r.getAs[Array[Byte]](3), w, h, outW, outH)))
      }
    }(enc)
  }

  /** Deterministic REAL-GIF fixture: literal-LZW GIF89a with a
    * grayscale palette (palette[i] = (i,i,i), so decoded luma equals
    * the pixel index exactly) and closed-form pixels; every 5th doc
    * raw text for the fallback. */
  def syntheticGif(id: Long, text: String): Array[Byte] =
    if (id % 5 == 0) text.getBytes("UTF-8")
    else {
      val w = 4 + (id % 13).toInt
      val h = 3 + (id % 11).toInt
      Gif.encodeGifGray(w, h,
        (x, y) => ((id + 3L * x + 5L * y) % 256).toInt)
    }

  /** Deterministic REAL-JPEG fixture: baseline grayscale JPEGs of
    * flat 8×8 blocks whose values are closed-form over (doc_id, bx,
    * by). Flat blocks quantize to a DC-only spectrum that
    * reconstructs EXACTLY under [[Jpeg.QStep]] (it divides the DC
    * scale), so a DuckDB oracle can recompute decoded pixel sums with
    * no DCT — while the decoder still runs the full entropy-decode /
    * dequantize / IDCT path on real marker-structured bytes. Every
    * 5th doc raw text for the fallback. */
  def syntheticJpeg(id: Long, text: String): Array[Byte] =
    if (id % 5 == 0) text.getBytes("UTF-8")
    else {
      val w = 8 * (1 + (id % 4).toInt)
      val h = 8 * (1 + (id % 3).toInt)
      Jpeg.encodeJpegGray(w, h,
        (x, y) => ((id + 7L * (x / 8) + 13L * (y / 8)) % 256).toInt)
    }

  /** Deterministic PNG-variant fixture over the decoder's FULL legal
    * depth envelope: the id%6 cycle walks Adam7-interlaced 8-bit gray
    * (1), 16-BIT gray (2), Adam7 PACKED 4-bit gray (3), packed 1-bit
    * gray (4), and packed 2-bit palette on a gray ramp (5) — odd dims
    * so every Adam7 pass shape and ragged packed-row tail occurs —
    * with id%6==0 raw text for the fallback path. Every pixel
    * closed-form over (doc_id, x, y): 16-bit decodes as the high byte
    * (÷256), d-bit gray scales by 255/(2^d−1) (17× / 255×), and the
    * ramp palette (85i, 85i, 85i) makes BT.601 luma exactly
    * 85·index. */
  def syntheticPngVariant(id: Long, text: String): Array[Byte] =
    if (id % 6 == 0) text.getBytes("UTF-8")
    else {
      val w = 5 + (id % 8).toInt
      val h = 4 + (id % 5).toInt
      (id % 6) match {
        case 1 => Codecs.encodePngGrayAdam7(w, h,
          (x, y) => ((id + 3L * x + 5L * y) % 256).toInt)
        case 2 => Codecs.encodePngGray16(w, h,
          (x, y) => ((id * 257 + 4099L * x + 131L * y) % 65536).toInt)
        case 3 => Codecs.encodePngPacked(w, h, 4,
          (x, y) => ((id + 3L * x + 5L * y) % 16).toInt, adam7 = true)
        case 4 => Codecs.encodePngPacked(w, h, 1,
          (x, y) => ((id + x + y) % 2).toInt)
        case _ => Codecs.encodePngPacked(w, h, 2,
          (x, y) => ((id + x + 2L * y) % 4).toInt,
          plte = Array.tabulate(12)(i => (85 * (i / 3)).toByte))
      }
    }

  /** Deterministic REAL-WEBP-LOSSLESS fixture: RGB pixels in closed
    * form over (doc_id, x, y); the encode PATH rotates with doc_id
    * through plain / subtract-green / predictor-mode / palette /
    * color-cache+LZ77 / meta-split ([[Webp.encodeWebpLossless]]), so
    * one oracled query drives the decoder's whole transform and
    * entropy surface — losslessness means the expected luma sums
    * depend only on the pixel formula, never on the path. Every 7th
    * doc raw text for the fallback path. */
  def syntheticWebp(id: Long, text: String): Array[Byte] =
    if (id % 7 == 0) text.getBytes("UTF-8")
    else {
      val w = 4 + (id % 9).toInt
      val h = 3 + (id % 7).toInt
      val pix = (x: Int, y: Int) => (
        ((id + 3L * x + 7L * y) % 256).toInt,
        ((2L * id + 5L * x + y) % 256).toInt,
        ((3L * id + x + 11L * y) % 256).toInt)
      (id % 6) match {
        case 1 => Webp.encodeWebpLossless(w, h, pix, subtractGreen = true)
        case 2 => Webp.encodeWebpLossless(w, h, pix,
          predictorMode = Some((id % 14).toInt))
        case 3 => Webp.encodeWebpLossless(w, h, pix, palette = true)
        case 4 => Webp.encodeWebpLossless(w, h, pix, cacheBits = 4,
          lz77Runs = true)
        case 5 => Webp.encodeWebpLossless(w, h, pix, metaSplit = true,
          subtractGreen = true)
        case _ => Webp.encodeWebpLossless(w, h, pix)
      }
    }

  /** Deterministic REAL-LOSSY-WEBP fixture: VP8 key frames whose luma
    * is flat per MACROBLOCK with values in closed form over (doc_id,
    * bx, by) — [[Vp8.encodeVp8Still]]'s DC-only exactness contract
    * means decoded luma equals the formula on every pixel, so a SQL
    * oracle recomputes sums with no transform code while the decoder
    * runs the full RFC 6386 path (bool decoder, segmentation, mode
    * trees, token trees incl. cat extras, WHT+DCT, all all-flat-safe
    * predictors). The quantizer index, partition count (1/2/4), mode
    * rotation, and ragged-vs-aligned dims all rotate with doc_id.
    * Every 7th doc raw text for the fallback path. */
  def syntheticWebpLossy(id: Long, text: String): Array[Byte] =
    if (id % 7 == 0) text.getBytes("UTF-8")
    else {
      val w = 16 * (1 + (id % 3).toInt) + (if (id % 5 == 1) 7 else 0)
      val h = 16 * (1 + (id % 2).toInt) + (if (id % 5 == 3) 5 else 0)
      val vOf = (bx: Int, by: Int) =>
        ((id * 5 + 11L * bx + 17L * by) % 256).toInt
      val (payload, _) = Vp8.encodeVp8Still(w, h, vOf,
        qIndex = (id % 35).toInt, nParts = 1 << (id % 3).toInt,
        modeSeed = (id % 5).toInt)
      Webp.wrapRiffChunks(Seq("VP8 " -> payload))
    }

  /** Deterministic REAL-PROGRESSIVE-JPEG fixture: SOF2 grayscale
    * streams through the 5-scan successive-approximation script
    * ([[Jpeg.encodeJpegProgressiveGray]] — DC first at Al=1, AC bands
    * at Al=1, DC + AC refinements), flat 8×8 blocks in closed form
    * over (doc_id, bx, by) so the oracle recomputes decoded sums with
    * no DCT while the engine reassembles coefficients across all five
    * scans. Every 5th doc raw text for the fallback path. */
  def syntheticJpegProgressive(id: Long, text: String): Array[Byte] =
    if (id % 5 == 0) text.getBytes("UTF-8")
    else {
      val w = 8 * (1 + (id % 4).toInt)
      val h = 8 * (1 + (id % 3).toInt)
      Jpeg.encodeJpegProgressiveGray(w, h,
        (x, y) => ((id + 11L * (x / 8) + 17L * (y / 8)) % 256).toInt)
    }

  /** Deterministic REAL-COLOR-JPEG fixture: 16×16-grid-flat RGB
    * blocks in closed form over (doc_id, bx, by), dims 16·(1+id%3) ×
    * 16·(1+id%2), chroma sampling cycling 420/422/444 by id%3 —
    * flat-on-the-MCU-grid color is the property that makes every
    * decoded pixel the exact fixed-point conversion of the block
    * color, so a SQL oracle reproduces per-channel sums in integer
    * arithmetic. Every 5th doc is raw text (undecodable fallback). */
  def syntheticJpegColor(id: Long, text: String): Array[Byte] =
    if (id % 5 == 0) text.getBytes("UTF-8")
    else {
      val w = 16 * (1 + (id % 3).toInt)
      val h = 16 * (1 + (id % 2).toInt)
      val sampling = (id % 3) match {
        case 0 => "420"; case 1 => "422"; case _ => "444"
      }
      Jpeg.encodeJpegColor(w, h, (x, y) => {
        val bx = x / 16; val by = y / 16
        val r = ((id + 7L * bx + 13L * by) % 256).toInt
        val g = ((3L * id + 11L * bx + 5L * by) % 256).toInt
        val b = ((5L * id + 3L * bx + 17L * by) % 256).toInt
        (r << 16) | (g << 8) | b
      }, sampling)
    }

  /** Deterministic REAL-CMYK/YCCK-JPEG fixture ([[Jpeg
    * .encodeJpegCmyk]]): 4-component baseline streams with an Adobe
    * APP14 marker, plain CMYK on even ids and YCCK (transform 2) on
    * odd — the print-pipeline variant real crawls hit. Component
    * samples are flat per 8×8 block in closed form over (doc_id, ci,
    * bx, by), so the decoded luma (YCbCr→RGB fixed point where YCCK,
    * then ·k/255 un-inking, then BT.601) is pure integer arithmetic a
    * SQL oracle mirrors division-for-division. Every 5th doc raw text
    * for the fallback path. */
  def syntheticJpegCmyk(id: Long, text: String): Array[Byte] =
    if (id % 5 == 0) text.getBytes("UTF-8")
    else {
      val w = 8 * (1 + (id % 4).toInt)
      val h = 8 * (1 + (id % 3).toInt)
      val comp = (ci: Int, bx: Int, by: Int) =>
        ((id * (3 + 2 * ci) + 7L * bx + 13L * by + 29L * ci) % 256).toInt
      val transform = if (id % 2 == 0) 0 else 2
      // id%3==1 takes the PROGRESSIVE (SOF2) container — flat blocks
      // reconstruct identically through either scan script, so the
      // SAME closed-form oracle covers both (what rotates is the
      // 4-component interleaved-DC walk + APP14 parse on the SOF2
      // path)
      if (id % 3 == 1)
        Jpeg.encodeJpegProgressiveCmyk(w, h, comp, transform)
      else
        Jpeg.encodeJpegCmyk(w, h, comp, transform)
    }

  /** RGB decode stage: (doc_id, width, height, rgb, decoded) with
    * `rgb` = REAL interleaved 3-byte pixels for decodable payloads
    * ([[Codecs.decodeRgb]]) or the raw payload (decoded = false) —
    * the color sibling of [[decodeGrayStage]], same mapPartitions
    * shape, payloads never ride a shuffle. */
  def decodeRgbStage(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("rgb", BinaryType),
      StructField("decoded", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Codecs.decodeRgb(bytes) match {
          case Some((w, h, px)) => Row(id, w, h, px, true)
          case None             => Row(id, 0, 0, bytes, false)
        }
      }
    }(enc)
  }

  /** Deterministic REAL-WAV fixture: stereo on odd ids, three sample
    * rates, four clip lengths, 16-bit samples in closed form over
    * (doc_id, channel, i) — every 7th doc is raw text exercising the
    * undecodable fallback. */
  def syntheticWav(id: Long, text: String): Array[Byte] =
    if (id % 7 == 0) text.getBytes("UTF-8")
    else {
      val ch = 1 + (id % 2).toInt
      val sr = 8000 * (1 + (id % 3).toInt)
      val n = 512 + (id % 4).toInt * 256
      Codecs.encodeWav(sr, ch, n, (c, i) =>
        (((id * 131 + i.toLong * 71 + c.toLong * 53) % 65536) - 32768).toInt)
    }

  /** Channel-swapped re-encode of [[syntheticWav]] (stereo ids only):
    * byte-level different payload, identical channel-sum mixdown —
    * what audio fingerprint dedup catches and byte hashing cannot. */
  def syntheticWavSwapped(id: Long): Array[Byte] = {
    val sr = 8000 * (1 + (id % 3).toInt)
    val n = 512 + (id % 4).toInt * 256
    Codecs.encodeWav(sr, 2, n, (c, i) =>
      (((id * 131 + i.toLong * 71 + (1 - c).toLong * 53) % 65536) - 32768).toInt)
  }

  /** Deterministic REAL-G.711 fixture: µ-law/A-law alternating by
    * `id/2` parity, mono/stereo by `id` parity, RAW code bytes in
    * closed form over (doc_id, channel, i) — the codes, not the
    * linear samples, are the fixture contract, so an oracle restates
    * them and replays only the G.711 expand. Every 7th doc raw text
    * for the fallback path. */
  def syntheticG711(id: Long, text: String): Array[Byte] =
    if (id % 7 == 0) text.getBytes("UTF-8")
    else {
      val ch = 1 + (id % 2).toInt
      val n = 256 + (id % 4).toInt * 128
      Codecs.encodeWavG711(8000, ch, n, alaw = (id / 2) % 2 == 0,
        (c, i) => (((id * 37 + i.toLong * 11 + c.toLong * 5) % 256)).toInt)
    }

  /** Deterministic REAL-IMA-ADPCM fixture (mono, 65-sample blocks,
    * 1–2 blocks): header predictor, step index, and every nibble in
    * closed form over (doc_id, block, j) — the oracle replays the
    * bit-exact predictor recurrence (step>>3 + conditional halves,
    * clamp, index advance) as a recursive CTE. Every 7th doc raw
    * text for the fallback path. */
  def syntheticAdpcm(id: Long, text: String): Array[Byte] =
    if (id % 7 == 0) text.getBytes("UTF-8")
    else {
      val spb = 65
      val blocks = 1 + (id % 2).toInt
      Codecs.encodeWavImaAdpcmRaw(8000, spb * blocks, spb,
        b => (((id * 97 + b.toLong * 41) % 4096) - 2048).toInt,
        b => ((id * 31 + b.toLong * 17) % 89).toInt,
        (b, j) => ((id * 13 + b.toLong * 29 + j.toLong * 7) % 16).toInt)
    }

  /** Deterministic REAL-Y4M fixture: even dimensions (C420), 2–5
    * frames, every plane byte in closed form over (doc_id, frame, x,
    * y) — every 7th doc raw text for the fallback path. */
  def syntheticY4m(id: Long, text: String): Array[Byte] =
    if (id % 7 == 0) text.getBytes("UTF-8")
    else {
      val w = 8 + 2 * (id % 5).toInt
      val h = 6 + 2 * (id % 3).toInt
      val frames = 2 + (id % 4).toInt
      Codecs.encodeY4m(w, h, 25, 1, frames,
        (f, x, y) => ((id + 11L * f + 3L * x + 5L * y) % 256).toInt,
        (f, x, y) => ((id * 3 + 5L * f + 7L * x + 11L * y) % 256).toInt,
        (f, x, y) => ((id * 5 + 7L * f + 11L * x + 13L * y) % 256).toInt)
    }
  /** Deterministic palette-PNG fixture: 8×6, grayscale-ramp palette
    * v_i = 16·i (BT.601 integer luma of (v,v,v) is exactly v because
    * 299+587+114 = 1000), index(x, y) = (doc_id + x + y) mod 16 — so
    * every decoded luma is closed-form recomputable in SQL without
    * the bytes, the mm_gray_stats oracle trick applied to the PLTE
    * expansion path. */
  def syntheticPalettePng(id: Long): Array[Byte] = {
    val w = 8; val h = 6
    val plte = Array.tabulate(48)(i => (16 * (i / 3)).toByte)
    val idx = Array.tabulate(w * h)(p =>
      ((id + p % w + p / w) % 16).toByte)
    Codecs.encodePalettePng(w, h, plte, idx)
  }
}
