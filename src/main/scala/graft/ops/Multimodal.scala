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
  def decodeMetaAuto(media: DataFrame): DataFrame = {
    val pruned = media.select("doc_id", "media_type", "media")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaMetaAutoSchema)
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val mt = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        Codecs.decodeHeader(bytes) match {
          case Some(h) =>
            Row(id, mt, h.format, bytes.length.toLong, h.width, h.height,
              h.channels, 1, true)
          case None =>
            val (w, hh, c, f) = StubCodec.decode(mt, bytes)
            Row(id, mt, "unknown", bytes.length.toLong, w, hh, c, f, false)
        }
      }
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
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Codecs.decodeGray(bytes) match {
          case Some((w, h, g)) => Row(id, w, h, g, true)
          case None            => Row(id, 0, 0, bytes, false)
        }
      }
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

  /** Deterministic REAL-container fixture for the decode oracles:
    * docs cycle through raw-text (undecodable, exercises the stub
    * fallback), real BMP ×2, real PPM, real PGM, with dimensions and
    * pixel values in closed form over doc_id — so a DuckDB oracle can
    * recompute byte lengths, header dimensions, AND pixel sums that
    * the pure-JVM decoders must reproduce from actual bytes. */
  def syntheticContainer(id: Long, text: String): Array[Byte] = {
    val w = (1 + id % 37).toInt; val h = (1 + id % 23).toInt
    def pix(x: Int, y: Int): (Int, Int, Int) = {
      val v = ((x * 31 + y * 17 + id) % 256).toInt
      (v, (v + 85) % 256, (v + 170) % 256)
    }
    id % 5 match {
      case 0     => text.getBytes("UTF-8")
      case 1 | 2 => Codecs.encodeBmp(w, h, pix)
      case 3     => Codecs.encodePpm(w, h, pix)
      case _     => Codecs.encodePgm(w, h, (x, y) => pix(x, y)._1)
    }
  }

  /** Frame-sampling plan: every `stride`-th frame index per video —
    * an explode, not a decode; the decode of selected frames would be
    * another mapPartitions stage. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
