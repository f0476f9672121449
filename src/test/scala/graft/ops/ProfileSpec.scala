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

  test("histogram: exact ntile cut gives equal-depth bins with true edges") {
    import spark.implicits._
    // 97 rows over 8 buckets: first 97%8=1 bucket gets 13 rows, rest 12
    val df = (1 to 97).map(i => (i.toLong, (i % 50).toDouble)).toDF("id", "x")
    val rows = Profile.histogram(df, col("x"), col("id"), 8, exact = true)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 8L))
    assert(rows.map(_.getLong(1)).toSeq === Seq(13L) ++ Seq.fill(7)(12L))
    // bins tile the sorted domain: each lo <= hi and his are ascending
    rows.foreach(r => assert(r.getDouble(3) <= r.getDouble(4)))
    assert(rows.map(_.getDouble(4)).toSeq.sorted === rows.map(_.getDouble(4)).toSeq)
    assert(rows.map(_.getLong(1)).sum === 97L)
  }

  test("histogram: approx path bins the full column, near-equal depth") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, math.pow(i.toDouble, 1.7)))
      .toDF("id", "x")
    val rows = Profile.histogram(df, col("x"), col("id"), 10).collect()
    assert(rows.map(_.getLong(1)).sum === 2000L) // nothing dropped
    // sketch accuracy 1e5 on 2000 distinct values => near-exact cuts
    rows.foreach(r => assert(math.abs(r.getLong(1) - 200L) <= 10,
      rows.map(_.getLong(1)).toSeq))
  }

  test("plan: approx histogram never plans a window or a global sort") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val plan = Profile.histogram(df, col("x"), col("id"), 8)
      .queryExecution.executedPlan.toString
    // the exact path's ntile window (single-reducer sort over the
    // DATA) must be absent from the scale path: edges come from one
    // sketch pass, binning is a codegen'd conditional. The one range
    // exchange allowed is the presentation orderBy over <= `buckets`
    // aggregate rows.
    assert(!plan.contains("Window"), plan)
    assert("Exchange rangepartitioning".r.findAllIn(plan).length <= 1, plan)
  }

  test("heavy hitters: salted funnel is exact vs a brute-force rank") {
    import spark.implicits._
    // zipf-ish counts with deliberate count ties (tie broken by value)
    val vals = (1 to 40).flatMap(i => Seq.fill(1 + 40 / i)(s"v${i % 13}"))
    val df = vals.zipWithIndex
      .map { case (v, i) => (v, (i % 7).toLong) }.toDF("s", "num")
    val got = Profile.heavyHitters(df, Seq("s", "num"), k = 4, salts = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val brute = df.select(explode(array(
      struct(lit("s").as("col_name"), col("s").as("v")),
      struct(lit("num").as("col_name"), col("num").cast("string").as("v"))))
      .as("p")).select("p.*")
      .groupBy("col_name", "v").count()
      .collect().toSeq.groupBy(_.getString(0)).flatMap { case (c, rs) =>
        rs.map(r => (r.getString(1), r.getLong(2)))
          .sortBy { case (v, n) => (-n, v) }.take(4).zipWithIndex
          .map { case ((v, n), i) => (c, v, n, i + 1L) }
      }.toSet
    assert(got.toSet === brute)
    assert(got.sorted === got.toSeq.sortBy(t => (t._1, t._4)))
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
