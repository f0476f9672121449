package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta classification semantics on a planted snapshot pair, and
  * the reprocess feed's added|changed-only contract. */
class SnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // 1 unchanged, 2 changed, 3 removed, 4 added
  private def fixture = (
    Seq((1L, "same text"), (2L, "old text"), (3L, "gone")).toDF("doc_id", "text"),
    Seq((1L, "same text"), (2L, "new text"), (4L, "fresh")).toDF("doc_id", "text"))

  test("delta classifies all four statuses off fingerprints") {
    val (o, n) = fixture
    val d = Snapshot.delta(o, n, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("fingerprints are null exactly on the absent side") {
    val (o, n) = fixture
    val d = Snapshot.delta(o, n, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(d(3L) === ((false, true)))
    assert(d(4L) === ((true, false)))
    assert(d(1L) === ((false, false)))
  }

  test("reprocess feed carries new-snapshot content for added|changed only") {
    val (o, n) = fixture
    val f = Snapshot.reprocessFeed(o, n, col("doc_id"), col("text"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text"), r.getAs[String]("status"))).toSet
    assert(f === Set((2L, "new text", "changed"), (4L, "fresh", "added")))
  }

  test("a byte-identical re-crawl is unchanged, whitespace edits are not") {
    val o = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val n = Seq((1L, "a b"), (2L, "a  b")).toDF("doc_id", "text")
    val d = Snapshot.delta(o, n, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed"))
  }
  test("plan: only (id, fingerprint) reaches the full-outer exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val (o, n) = fixture
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Snapshot.delta(o, n, col("doc_id"), col("text"))
        .queryExecution.executedPlan
      val ex = plan.collect { case e: ShuffleExchangeExec => e }
      assert(ex.size === 2, plan.toString)
      // text is fingerprinted BELOW the shuffle: the exchanged rows
      // are (id, 16-byte fp), never the content column
      ex.foreach(e => assert(
        e.output.map(_.name).toSet.subsetOf(Set("id", "old_fp", "new_fp")),
        e.output.mkString(",")))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
  test("indexed delta == inline delta; advanceStore settles the diff") {
    val (o, n) = fixture
    val dir = java.nio.file.Files.createTempDirectory("snapfp").toString
    val store = dir + "/fp"
    Snapshot.buildFingerprintStore(o, col("doc_id"), col("text"), store)
    val inline = Snapshot.delta(o, n, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val indexed = Snapshot.deltaAgainstStore(spark, store, n,
        col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(indexed === inline)
    // after advancing the store to the new snapshot, a re-diff of the
    // same crawl reports nothing but 'unchanged'
    Snapshot.advanceStore(n, col("doc_id"), col("text"), store)
    val settled = Snapshot.deltaAgainstStore(spark, store, n,
        col("doc_id"), col("text"))
      .collect().map(r => r.getString(1)).toSet
    assert(settled === Set("unchanged"))
  }
  test("streaming appender is replay-idempotent on the sink") {
    val (o, n) = fixture
    val dir = java.nio.file.Files.createTempDirectory("snapstream").toString
    val store = dir + "/fp"; val out = dir + "/out"
    Snapshot.buildFingerprintStore(o, col("doc_id"), col("text"), store)
    Snapshot.appendDeltaAgainst(spark, store, out, n, col("doc_id"),
      col("text"))
    val once = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // a replayed micro-batch appends nothing new
    Snapshot.appendDeltaAgainst(spark, store, out, n, col("doc_id"),
      col("text"))
    val twice = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(once === twice)
    // stream-side classification: no 'removed' (absent ids never arrive)
    assert(once.map(_._2).toSet === Set("added", "changed", "unchanged"))
  }
}
