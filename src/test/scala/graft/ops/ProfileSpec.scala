package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Profiling arithmetic on a fixture with nulls and mixed types, and
  * the one-job plan promise. */
class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("null counts, exact cardinality, typed min/max per column") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (2L, "a"), (null, "a"))
      .toDF("num", "s")
    val rows = Profile.table(df, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap

    val num = rows("num")
    assert(num.getLong(1) === 4L)       // n_rows
    assert(num.getLong(2) === 1L)       // n_null
    assert(num.getLong(3) === 2L)       // distinct {1,2}
    assert(num.getDouble(4) === 1.0 && num.getDouble(5) === 2.0)
    assert(num.isNullAt(6) && num.isNullAt(7))

    val s = rows("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) === "a" && s.getString(7) === "b")
  }

  test("map columns profile with null cardinality instead of crashing") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)))
      .toDF("num", "m")
    val rows = Profile.table(df, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("m").getLong(1) === 2L)  // n_rows
    assert(rows("m").getLong(2) === 0L)  // n_null
    assert(rows("m").isNullAt(3))        // cardinality not computable
    assert(rows("num").getLong(3) === 2L) // others unaffected
  }

  test("plan: a single aggregation job, no per-column scans") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("num", "s")
    val plan = Profile.table(df).queryExecution.executedPlan.toString
    // HLL default: one scan feeding one aggregate chain (no Union of
    // per-column subplans)
    assert(!plan.contains("Union"), plan)
    assert("Scan existing".r.findAllIn(plan).length <= 1, plan)
  }
}
