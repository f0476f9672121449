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

  test("zscoreAnomaly: warm-up null, self-exclusion, verdict never null") {
    import spark.implicits._
    // key A: 4 stable points then a spike; frame of 3
    val ev = (1 to 4).map(i => ("A", i.toLong, 10.0 + (i % 2))) :+
      ("A", 5L, 100.0) :+ ("B", 1L, 1.0)
    val got = Features.zscoreAnomaly(ev.toDF("k", "t", "v"), Seq("k"), "t",
        col("v"), nRows = 3, threshold = 3.0)
      .select("k", "t", "z", "is_anomaly")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap

    // first 3 rows of A: trailing frame not yet full -> z null, verdict false
    (1L to 3L).foreach { t =>
      assert(got(("A", t)).isNullAt(2), s"t=$t should be warm-up")
      assert(!got(("A", t)).getBoolean(3))
    }
    // t=4: frame = {11,10,11}, value 10 -> modest |z|, not anomalous
    assert(!got(("A", 4L)).getBoolean(3))
    // t=5: spike scored against the PRE-spike baseline {10,11,10}
    val z5 = got(("A", 5L)).getDouble(2)
    assert(z5 > 3.0, s"spike z=$z5")
    assert(got(("A", 5L)).getBoolean(3))
    // B: single point, frame never fills, verdict false not null
    assert(got(("B", 1L)).isNullAt(2) && !got(("B", 1L)).getBoolean(3))
  }

  test("zscoreAnomaly: constant baseline (zero spread) yields no verdict") {
    import spark.implicits._
    val ev = Seq(("A", 1L, 5.0), ("A", 2L, 5.0), ("A", 3L, 5.0), ("A", 4L, 99.0))
    val got = Features.zscoreAnomaly(ev.toDF("k", "t", "v"), Seq("k"), "t",
        col("v"), nRows = 3, threshold = 3.0)
      .filter(col("t") === 4L).select("z", "is_anomaly").head()
    assert(got.isNullAt(0), "zero-spread baseline must not divide")
    assert(!got.getBoolean(1))
  }

  test("seasonalAnomaly: flags the off-phase spike a plain rolling window can't isolate") {
    import spark.implicits._
    // 10 days of hourly data with a strong daily peak at phase 12;
    // day 8 carries an equally strong spike at phase 3 (the anomaly)
    val rows = for (d <- 0 until 10; h <- 0 until 24) yield {
      val base = if (h == 12) 100.0 else 10.0
      val v = if (d == 8 && h == 3) 100.0 else base + (d % 3) * 0.5
      (("k"), (d * 24 + h).toLong, v)
    }
    val df = rows.toDF("k", "t", "v")
    val out = Features.seasonalAnomaly(df, Seq("k"), "t", col("v"),
      period = 24L, nRows = 5, threshold = 3.0)
    val flagged = out.filter(col("is_anomaly")).select("t", "phase")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly the planted point: the daily peaks are NORMAL in their
    // phase partition (constant-ish baseline at phase 12)
    assert(flagged.toSeq === Seq((8L * 24 + 3, 3L)))
    // warm-up rows (fewer than nRows same-phase predecessors) have no z
    assert(out.filter(col("t") < 5 * 24).filter(col("z").isNotNull)
      .count() === 0L)
  }

  test("interpolateLinear: interior gaps weighted by time, edges stay null") {
    import spark.implicits._
    val rows = Seq(
      ("A", 0L, None: Option[Double]),          // leading edge: stays null
      ("A", 10L, Some(10.0)),
      ("A", 20L, None), ("A", 25L, None),       // irregular-space gap
      ("A", 40L, Some(40.0)),
      ("A", 50L, None),                         // trailing edge: stays null
      ("B", 10L, Some(7.0))).toDF("k", "t", "v")
    val got = Features.interpolateLinear(rows, Seq("k"), "t", col("v"))
      .select("k", "t", "filled", "interpolated")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap

    assert(got(("A", 0L)).isNullAt(2) && !got(("A", 0L)).getBoolean(3))
    assert(got(("A", 10L)).getDouble(2) === 10.0 && !got(("A", 10L)).getBoolean(3))
    // time-weighted, not row-weighted: 10 + 30*(20-10)/(40-10) = 20
    assert(got(("A", 20L)).getDouble(2) === 20.0 && got(("A", 20L)).getBoolean(3))
    assert(got(("A", 25L)).getDouble(2) === 25.0)
    assert(got(("A", 40L)).getDouble(2) === 40.0)
    assert(got(("A", 50L)).isNullAt(2) && !got(("A", 50L)).getBoolean(3))
    assert(got(("B", 10L)).getDouble(2) === 7.0)  // keys isolated
  }

  test("plan: interpolateLinear's four frames share one Exchange+Sort") {
    import spark.implicits._
    val rows = Seq(("A", 1L, Option(1.0))).toDF("k", "t", "v")
    val plan = Features.interpolateLinear(rows, Seq("k"), "t", col("v"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    assert("Sort \\[".r.findAllIn(plan).length === 1, plan)
  }

  test("approx_percentile rank error vs exact is within the GK accuracy bound") {
    import spark.implicits._
    // skewed + heavy-tie distribution, the shape that breaks naive
    // sketches: zipf-ish values with a long tail
    val n = 50000
    val rows = (0 until n).map { i =>
      val v = if (i % 10 < 7) (i % 97).toDouble
              else math.pow(1.3, (i % 40).toDouble)
      (s"g${i % 3}", v)
    }.toDF("k", "v")
    val ps = Seq(0.25, 0.5, 0.75, 0.9)
    val acc = 10000 // accuracy parameter used by events_value_quantiles_approx
    val approx = rows.groupBy("k")
      .agg(expr(s"approx_percentile(v, array(${ps.mkString(",")}), $acc)").as("a"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val sorted = rows.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((k, vs) <- sorted; (p, i) <- ps.zipWithIndex) {
      val got = approx(k)(i)
      // rank of the returned value must be within eps*n of the target
      // rank (the GK guarantee, eps = 1/accuracy)
      val lo = vs.count(_ < got)
      val hi = vs.count(_ <= got)
      val target = p * (vs.length - 1)
      val tol = math.max(1.0, vs.length.toDouble / acc * 2)
      assert(target >= lo - tol && target <= hi + tol,
        s"$k p$p: value $got rank [$lo,$hi] vs target $target (n=${vs.length})")
    }
  }
}
