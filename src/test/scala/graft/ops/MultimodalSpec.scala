package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash media dedup: kernel properties (determinism,
  * locality of the block-mean construction) and exactness of the
  * multi-index blocking against brute-force hamming — the same
  * contract the text simhash funnel proves in DedupSpec. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic fake payloads: 40 "originals" (1 KB of seeded
    * bytes) + a near-dup of each even original with one 16-byte run
    * overwritten (touches ≤ 2 of the 64 blocks → hamming ≤ 2). */
  private lazy val media: DataFrame = {
    import spark.implicits._
    def payload(seed: Int): Array[Byte] = {
      val b = new Array[Byte](1024)
      var x = seed.toLong * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < b.length) {
        x = x * 6364136223846793005L + 1442695040888963407L
        b(i) = (x >>> 56).toByte
        i += 1
      }
      b
    }
    val base = (0 until 40).map(d => (d.toLong, payload(d)))
    val dups = (0 until 40 by 2).map { d =>
      val p = payload(d)
      java.util.Arrays.fill(p, 512, 528, 0x7f.toByte)
      (1000L + d, p)
    }
    (base ++ dups).toDF("doc_id", "media")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def brutePairs(fps: DataFrame, maxHamming: Int): Set[(Long, Long)] = {
    val a = fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b"))
    pairSet(a.crossJoin(b).filter(col("id_a") < col("id_b") &&
      bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= maxHamming))
  }

  test("phash64 kernel: deterministic, local edits flip few bits, empty -> 0") {
    import spark.implicits._
    val fps = media.select(col("doc_id"), Multimodal.phash64(col("media")).as("fp"))
    val byId = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = media.select(col("doc_id"), Multimodal.phash64(col("media")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId === again)
    // a 16-byte overwrite spans at most 2 of the 64 16-byte blocks
    (0 until 40 by 2).foreach { d =>
      val h = java.lang.Long.bitCount(byId(d.toLong) ^ byId(1000L + d))
      assert(h <= 2, s"doc $d: localized edit flipped $h bits")
    }
    // unrelated payloads differ widely (random bytes -> ~32 bit distance)
    assert(java.lang.Long.bitCount(byId(0L) ^ byId(1L)) > 8)
    val empty = Seq((0L, Array.empty[Byte])).toDF("doc_id", "media")
      .select(Multimodal.phash64(col("media"))).head().getLong(0)
    assert(empty === 0L)
  }

  test("phashPairs blocking is EXACT vs brute-force hamming (default and h=chunks configs)") {
    val fps = media.select(col("doc_id"), Multimodal.phash64(col("media")).as("fp"))
    for (h <- Seq(2, 3, 4)) {
      val blocked = pairSet(Multimodal.phashPairs(media, col("doc_id"),
        col("media"), maxHamming = h))
      val brute = brutePairs(fps, h)
      assert(brute.nonEmpty, s"fixture must contain pairs at hamming $h")
      assert(blocked === brute, s"maxHamming=$h")
    }
  }

  test("phash index: indexed query == inline pairs touching the increment; append idempotent") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("ph_idx").toString
    val store = media.filter(col("doc_id") < 1000L)      // originals
    val increment = media.filter(col("doc_id") >= 1000L) // re-encodes
    Multimodal.buildPhashIndex(store, col("doc_id"), col("media"), path)

    val indexed = Multimodal.phashAgainstIndex(spark, path, increment,
        col("doc_id"), col("media"), maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val newIds = increment.select("doc_id").collect().map(_.getLong(0)).toSet
    val inline: Set[(Long, Long, Int)] = Multimodal.phashPairs(media,
        col("doc_id"), col("media"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val inlineNew = inline.filter { case (a, b, _) => newIds(a) || newIds(b) }
    assert(inlineNew.nonEmpty)
    assert(indexed === inlineNew)

    val before = spark.read.parquet(path).count()
    Multimodal.appendToPhashIndex(spark, path, increment, col("doc_id"), col("media"))
    Multimodal.appendToPhashIndex(spark, path, increment, col("doc_id"), col("media"))
    assert(spark.read.parquet(path).count() === before + newIds.size,
      "replayed append must not duplicate")
  }

  test("phash index streaming append == batch append; streamed docs findable") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sPath = java.nio.file.Files.createTempDirectory("ph_s").toString
    val bPath = java.nio.file.Files.createTempDirectory("ph_b").toString
    val store = media.filter(col("doc_id") < 1000L)
    val increment = media.filter(col("doc_id") >= 1000L)
    Multimodal.buildPhashIndex(store, col("doc_id"), col("media"), sPath)
    Multimodal.buildPhashIndex(store, col("doc_id"), col("media"), bPath)
    Multimodal.appendToPhashIndex(spark, bPath, increment, col("doc_id"), col("media"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val ckpt = java.nio.file.Files.createTempDirectory("ph_ck").toString
    val q = graft.streaming.StreamingIngest.appendStreamToPhashIndex(
      mem.toDF().toDF("doc_id", "media"), sPath, ckpt,
      col("doc_id"), col("media"))
    val rows = increment.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    mem.addData(rows.take(7): _*); q.processAllAvailable()
    mem.addData(rows.drop(7): _*); q.processAllAvailable()
    q.stop()

    def rowsOf(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rowsOf(sPath) === rowsOf(bPath))
    // a later re-encode of a streamed doc finds it through the index
    val probe = increment.filter(col("doc_id") === 1000L)
      .select(lit(5000L).as("doc_id"), col("media"))
    val found = Multimodal.phashAgainstIndex(spark, sPath, probe,
        col("doc_id"), col("media"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1000L, 5000L)))
  }

  test("phashPairs bucket cap drops clone floods, keeps base pairs") {
    import spark.implicits._
    val clone = new Array[Byte](256) // all zeros -> identical fp
    val clones = (0 until 30).map(i => (9000L + i, clone))
    val flooded = media.unionByName(clones.toDF("doc_id", "media"))
    val capped = pairSet(Multimodal.phashPairs(flooded, col("doc_id"),
      col("media"), maxHamming = 2, bucketCap = 20))
    assert(!capped.exists { case (a, b) => a >= 9000L || b >= 9000L })
    assert(capped.nonEmpty, "base near-dups must survive the cap")
  }
}
