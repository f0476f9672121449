package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed range join must return exactly the brute-force
  * BETWEEN-join rows (no misses at bucket boundaries, no duplicate
  * pairs from interval replication) and must plan as an equality
  * join, never a nested loop. */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("matches brute force exactly, incl. boundary and multi-bucket intervals") {
    import spark.implicits._
    // deterministic fixture: intervals of width 0..~37 (some spanning
    // many width-10 buckets, some degenerate, some inverted) and
    // points landing on lo/hi boundaries by construction
    val intervals = (0L until 200L).map { i =>
      val lo = (i * 37) % 500
      (i, s"k${i % 3}", lo, lo + (if (i % 11 == 0) 0 else (i * 13) % 37))
    }.toDF("iv_id", "k", "lo", "hi")
      .unionAll(Seq((999L, "k0", 50L, 40L)).toDF("iv_id", "k", "lo", "hi")) // inverted
    val points = (0L until 300L).map(p => (1000L + p, s"k${p % 3}", (p * 7) % 520))
      .toDF("p_id", "k", "x").where(lit(true))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(points.join(intervals, Seq("k"))
      .filter(col("x") >= col("lo") && col("x") <= col("hi")))
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "x", "lo", "hi", w)
      assert(pairs(got) === brute, s"bucketWidth=$w")
      // no duplicate (point, interval) rows despite interval replication
      assert(got.count() === brute.size.toLong, s"bucketWidth=$w duplicates")
    }
    assert(brute.size > 100, s"fixture too weak: ${brute.size} pairs")
  }

  test("plans as an equality join on (keys, bucket), not a nested loop") {
    import spark.implicits._
    val points = spark.range(0, 1000).select(col("id").as("p_id"),
      (col("id") % 5).as("k"), (col("id") % 400).as("x"))
    val intervals = spark.range(0, 100).select(col("id").as("iv_id"),
      (col("id") % 5).as("k"), (col("id") * 3).as("lo"), (col("id") * 3 + 20).as("hi"))
    val df = RangeJoin.pointInInterval(points, intervals, Seq("k"), "x", "lo", "hi", 20)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("nestedloop"), plan.take(800))
    assert(plan.toLowerCase.contains("join"), plan.take(800))
  }
}
