package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the as-of join: at-or-before inclusion,
  * left-outer nulls, per-key isolation, tie-break determinism, and
  * null handling in time and carry columns. */
class AsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("at-or-before matching, left-outer nulls, key isolation") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 10L))
      .toDF("id", "k", "t")
    val right = Seq(("a", 10L, 1.0), ("a", 15L, 2.0), ("b", 50L, 9.0))
      .toDF("k", "t", "v")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L) === Some(1.0)) // equal time matches (at-or-before)
    assert(got(2L) === Some(2.0)) // latest preceding, not first
    assert(got(3L) === None)      // nothing precedes t=5
    assert(got(4L) === None)      // key isolation: b's row is at t=50
  }

  test("equal-time right rows: tieBreak order decides, deterministically") {
    import spark.implicits._
    val left = Seq((1L, "k", 10L)).toDF("id", "k", "t")
    val right = Seq(("k", 10L, 7L, 1.0), ("k", 10L, 9L, 2.0), ("k", 10L, 8L, 3.0))
      .toDF("k", "t", "seq", "v")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", Seq("v"),
      tieBreak = Some("seq")).collect().head
    assert(got.getDouble(3) === 2.0) // highest seq wins
  }

  test("null right times are dropped; null carry values are skipped") {
    import spark.implicits._
    val left = Seq((1L, "k", 100L)).toDF("id", "k", "t")
    val right = Seq(("k", Some(10L), Some(1.0)), ("k", None, Some(99.0)),
      ("k", Some(20L), None)).toDF("k", "t", "v")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", Seq("v")).collect().head
    // t=20's null v is skipped, null-time 99.0 never leaks: carry = 1.0
    assert(got.getDouble(3) === 1.0)
  }

  test("plan is one shuffle on the keys + window (no join explosion)") {
    import spark.implicits._
    val left = spark.range(0, 1000).select(col("id"), (col("id") % 10).as("k"), col("id").as("t"))
    val right = spark.range(0, 1000).select((col("id") % 10).as("k"), col("id").as("t"),
      col("id").cast("double").as("v"))
    val df = AsOf.joinAsOf(left, right, Seq("k"), "t", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(800))
    assert(!plan.toLowerCase.contains("sortmergejoin") &&
      !plan.toLowerCase.contains("broadcasthashjoin"),
      "as-of must not plan a relational join")
    assert(df.count() === 1000L)
  }
}
