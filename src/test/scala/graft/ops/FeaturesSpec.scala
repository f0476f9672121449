package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rolling feature semantics (frame bounds, first-row nulls, per-key
  * isolation) and the single Exchange+Sort plan promise. */
class FeaturesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("frame bounds, lag nulls, and per-key isolation") {
    import spark.implicits._
    val ev = Seq((1L, 10L, 1L, 4.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 6.0),
      (1L, 40L, 4L, 8.0), (2L, 10L, 5L, 100.0)).toDF("u", "t", "id", "v")
    val got = Features.rolling(ev, Seq("u"), "t", col("v"), nRows = 3,
        tieBreak = Some("id"))
      .select("u", "id", "prev_value", "delta", "roll_mean", "roll_min",
        "roll_max", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

    val first = got((1L, 1L))
    assert(first.isNullAt(2) && first.isNullAt(3)) // no predecessor
    assert(first.getDouble(4) === 4.0 && first.getLong(7) === 1L)

    val fourth = got((1L, 4L))
    assert(fourth.getDouble(2) === 6.0)            // lag 1
    assert(fourth.getDouble(3) === 2.0)            // delta
    assert(fourth.getDouble(4) === (2.0 + 6.0 + 8.0) / 3) // trailing 3 only
    assert(fourth.getDouble(5) === 2.0 && fourth.getDouble(6) === 8.0)

    val other = got((2L, 5L))                      // key 2 sees none of key 1
    assert(other.isNullAt(2) && other.getDouble(4) === 100.0)
  }

  test("plan: all features share one Exchange+Sort") {
    import spark.implicits._
    val ev = Seq((1L, 10L, 1L, 4.0)).toDF("u", "t", "id", "v")
    val plan = Features.rolling(ev, Seq("u"), "t", col("v"), 3, Some("id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(exchanges === 1, plan)
    assert(sorts === 1, plan)
  }
}
