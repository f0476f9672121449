package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.time._

/** Port of the reference's backend-agnostic golden tests
  * (test/functional/{series,histogram,count,gauge,set}_helper.py) over
  * the canonical fixtures: minute{step:60,steps:5} +
  * hour{step:3600,resolution:60}, timestamps relative to
  * _time(t) = 500000*3600 + t (helper_helper.py:10-12). */
class GoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val T0 = 500000L * 3600L
  def T(t: Long): Long = T0 + t
  def Td(t: Long): Double = (T0 + t).toDouble

  val minuteHour: Map[String, IntervalSpec] = Map(
    "minute" -> IntervalSpec(TimeStep(60L), Some(5), None),
    "hour"   -> IntervalSpec(TimeStep(3600L), None, Some(TimeStep(60L))))

  def mk(st: SeriesType): Timeseries =
    new Timeseries(spark, st, minuteHour,
      readFunc = _.cast(LongType)) // read_func=int

  /** dense ramp: insert(name, f(t), _time(t)) for t in 1..n */
  def ramp(t: Timeseries, name: String = "test", n: Int = 7200, f: Long => Double = _.toDouble): Unit =
    (1 until n).foreach(i => t.insert(name, f(i.toLong), Td(i)))

  // result readers
  def coarseMap(df: DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  def coarseScalar(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  def keys(df: DataFrame): Seq[Long] = df.select("i_time").collect().map(_.getLong(0)).toSeq

  // ---- series type ---------------------------------------------------

  test("series get: coarse buckets, transforms (series_helper.py:152-186)") {
    val t = mk(SeriesT); ramp(t)
    // middle of an interval
    val i1 = coarseMap(t.get(Seq("test"), "minute", Td(100)))
    assert(i1.keySet === Set(T(60)))
    assert(i1(T(60)) === (60L until 120L))
    // end of an interval
    val i2 = coarseMap(t.get(Seq("test"), "minute", Td(59)))
    assert(i2(T(0)) === (1L until 60L))
    // no data at "now" → single empty bucket
    val i3 = coarseMap(t.get(Seq("test"), "minute", Td(90000)))
    assert(i3.size === 1 && i3.values.head.isEmpty)
    // transform count
    val i4 = t.get(Seq("test"), "minute", Td(100), transform = Transforms("count"))
    assert(i4.collect().head.getLong(1) === 60L)
    // transform list [min,max]
    val i5 = t.get(Seq("test"), "minute", Td(100), transform = Transforms(Seq("min", "max")))
    val r5 = i5.collect().head
    assert(r5.getAs[Double]("min") === 60.0 && r5.getAs[Double]("max") === 119.0)
  }

  test("series get: fine + condensed (series_helper.py:188-208)") {
    val t = mk(SeriesT); ramp(t)
    // fine: 60 resolution rows
    val fine = t.get(Seq("test"), "hour", Td(100)).collect()
    assert(fine.length === 60)
    val r60 = fine.find(_.getLong(1) == T(60)).get
    assert(r60.getSeq[Long](2) === (60L until 120L))
    // condensed: single row of 1..3599
    val cond = coarseMap(t.get(Seq("test"), "hour", Td(100), condense = true))
    assert(cond.keySet === Set(T(0)))
    assert(cond(T(0)) === (1L until 3600L))
    // condensed with transforms
    val tr = t.get(Seq("test"), "hour", Td(100), condense = true,
      transform = Transforms(Seq("min", "max"))).collect().head
    assert(tr.getAs[Double]("min") === 1.0 && tr.getAs[Double]("max") === 3599.0)
  }

  test("series get joined (series_helper.py:210-256)") {
    val t = mk(SeriesT)
    for (i <- 1 until 120) { t.insert("test1", i, Td(i)); t.insert("test2", i, Td(i)) }
    for (i <- 3600 until 3720) { t.insert("test1", i, Td(i)); t.insert("test2", i, Td(i)) }
    for (i <- 120 until 240) t.insert("test1", i, Td(i))
    for (i <- 3721 until 3840) t.insert("test1", i, Td(i))

    val j1 = coarseMap(t.get(Seq("test1", "test2"), "minute", Td(100)))
    assert(j1(T(60)) === ((60L until 120L) ++ (60L until 120L)))
    val j2 = coarseMap(t.get(Seq("test1", "test2"), "minute", Td(122)))
    assert(j2(T(120)) === (120L until 180L))
    // fine joined
    val jf = t.get(Seq("test1", "test2"), "hour", Td(100)).collect()
    assert(jf.map(_.getLong(1)).toSeq === Seq(T(0), T(60), T(120), T(180)))
    assert(jf(0).getSeq[Long](2) === ((1L until 60L) ++ (1L until 60L)))
    // condensed joined
    val jc = coarseMap(t.get(Seq("test1", "test2"), "hour", Td(100), condense = true))
    assert(jc(T(0)) ===
      ((1L until 60L) ++ (1L until 60L) ++ (60L until 120L) ++ (60L until 120L) ++
        (120L until 180L) ++ (180L until 240L)))
    // transforms on joined condensed
    val jt = t.get(Seq("test1", "test2"), "hour", Td(100), condense = true,
      transform = Transforms(Seq("min", "max", "count"))).collect().head
    assert(jt.getAs[Double]("min") === 1.0)
    assert(jt.getAs[Double]("max") === 239.0)
    assert(jt.getAs[Long]("count") === 358L)
  }

  test("series series(): anchoring, dense fill, collapse (series_helper.py:260-330)") {
    val t = mk(SeriesT); ramp(t)
    // end only → config steps=5
    val s1 = coarseMap(t.series(Seq("test"), "minute", end = Some(Td(250))))
    assert(s1.keySet === Set(T(0), T(60), T(120), T(180), T(240)))
    assert(s1(T(0)) === (1L until 60L))
    assert(s1(T(240)) === (240L until 300L))
    // steps=2
    val s2 = coarseMap(t.series(Seq("test"), "minute", end = Some(Td(250)), steps = Some(2)))
    assert(s2.keySet === Set(T(180), T(240)))
    // transforms
    val s3 = t.series(Seq("test"), "minute", end = Some(Td(250)),
      transform = Transforms(Seq("min", "count"))).collect()
    val by3 = s3.map(r => r.getLong(0) -> r).toMap
    assert(by3(T(0)).getAs[Double]("min") === 1.0 && by3(T(0)).getAs[Long]("count") === 59L)
    assert(by3(T(240)).getAs[Double]("min") === 240.0 && by3(T(240)).getAs[Long]("count") === 60L)
    // collapse
    val s4 = coarseMap(t.series(Seq("test"), "minute", end = Some(Td(250)), collapse = true))
    assert(s4.keySet === Set(T(0)))
    assert(s4(T(0)) === (1L until 300L))
    // collapse + transforms
    val s5 = t.series(Seq("test"), "minute", end = Some(Td(250)), collapse = true,
      transform = Transforms(Seq("min", "count"))).collect().head
    assert(s5.getAs[Double]("min") === 1.0 && s5.getAs[Long]("count") === 299L)
  }

  test("series series(): fine + condensed + collapse (series_helper.py:292-330)") {
    val t = mk(SeriesT); ramp(t)
    // fine: sparse outer, 60 r rows in hour 0
    val f1 = t.series(Seq("test"), "hour", end = Some(Td(250))).collect()
    assert(f1.map(_.getLong(0)).distinct.toSeq === Seq(T(0)))
    assert(f1.length === 60)
    assert(f1.head.getSeq[Long](2) === (1L until 60L))
    // fine + transforms
    val f2 = t.series(Seq("test"), "hour", end = Some(Td(250)),
      transform = Transforms(Seq("count", "max"))).collect()
    assert(f2.head.getAs[Long]("count") === 59L && f2.head.getAs[Double]("max") === 59.0)
    // condensed single step
    val c1 = coarseMap(t.series(Seq("test"), "hour", end = Some(Td(4200)), condense = true))
    assert(c1.keySet === Set(T(3600)))
    assert(c1(T(3600)) === (3600L until 7200L))
    // condensed steps=2
    val c2 = coarseMap(t.series(Seq("test"), "hour", end = Some(Td(4200)), condense = true, steps = Some(2)))
    assert(c2.keySet === Set(T(0), T(3600)))
    assert(c2(T(0)).length === 3599 && c2(T(3600)).length === 3600)
    // condensed + transform
    val c3 = t.series(Seq("test"), "hour", end = Some(Td(4200)), condense = true,
      transform = Transforms(Seq("min", "max"))).collect().head
    assert(c3.getAs[Double]("min") === 3600.0 && c3.getAs[Double]("max") === 7199.0)
    // collapse over 2 steps
    val c4 = coarseMap(t.series(Seq("test"), "hour", end = Some(Td(4200)), steps = Some(2), collapse = true))
    assert(c4.keySet === Set(T(0)))
    assert(c4(T(0)) === (1L until 7200L))
    // collapse + transforms
    val c5 = t.series(Seq("test"), "hour", end = Some(Td(4200)), steps = Some(2), collapse = true,
      transform = Transforms(Seq("min", "count", "max"))).collect().head
    assert(c5.getAs[Double]("min") === 1.0 && c5.getAs[Double]("max") === 7199.0 &&
      c5.getAs[Long]("count") === 7199L)
  }

  test("series joined series() incl. empty dense fill (series_helper.py:332-419)") {
    val t = mk(SeriesT)
    for (i <- 1 until 120) { t.insert("test1", i, Td(i)); t.insert("test2", i, Td(i)) }
    for (i <- 3600 until 3720) { t.insert("test1", i, Td(i)); t.insert("test2", i, Td(i)) }
    for (i <- 120 until 240) t.insert("test1", i, Td(i))
    for (i <- 3720 until 3840) t.insert("test1", i, Td(i))

    val s1 = coarseMap(t.series(Seq("test1", "test2"), "minute", end = Some(Td(250))))
    assert(s1.keySet === Set(T(0), T(60), T(120), T(180), T(240)))
    assert(s1(T(0)) === ((1L until 60L) ++ (1L until 60L)))
    assert(s1(T(60)) === ((60L until 120L) ++ (60L until 120L)))
    assert(s1(T(120)) === (120L until 180L))
    assert(s1(T(240)) === Seq.empty)
    // transforms incl. empty-bucket {min:0,count:0}
    val s2 = t.series(Seq("test1", "test2"), "minute", end = Some(Td(250)),
      transform = Transforms(Seq("min", "count"))).collect()
    val by2 = s2.map(r => r.getLong(0) -> r).toMap
    assert(by2(T(0)).getAs[Double]("min") === 1.0 && by2(T(0)).getAs[Long]("count") === 118L)
    assert(by2(T(240)).getAs[Double]("min") === 0.0 && by2(T(240)).getAs[Long]("count") === 0L)
    // collapse
    val s3 = coarseMap(t.series(Seq("test1", "test2"), "minute", end = Some(Td(250)), collapse = true))
    assert(s3(T(0)) ===
      ((1L until 60L) ++ (1L until 60L) ++ (60L until 120L) ++ (60L until 120L) ++
        (120L until 180L) ++ (180L until 240L)))
    // fine joined nested
    val f1 = t.series(Seq("test1", "test2"), "hour", end = Some(Td(250))).collect()
    assert(f1.map(_.getLong(1)).toSeq === Seq(T(0), T(60), T(120), T(180)))
    assert(f1(0).getSeq[Long](2) === ((1L until 60L) ++ (1L until 60L)))
    // fine joined condensed + collapse over 2 steps
    val f2 = coarseMap(t.series(Seq("test1", "test2"), "hour", end = Some(Td(4200)),
      steps = Some(2), condense = true, collapse = true))
    assert(f2(T(0)) ===
      ((1L until 60L) ++ (1L until 60L) ++ (60L until 120L) ++ (60L until 120L) ++
        (120L until 180L) ++ (180L until 240L) ++
        (3600L until 3660L) ++ (3600L until 3660L) ++ (3660L until 3720L) ++ (3660L until 3720L) ++
        (3720L until 3780L) ++ (3780L until 3840L)))
    val f3 = t.series(Seq("test1", "test2"), "hour", end = Some(Td(4200)),
      steps = Some(2), condense = true, collapse = true,
      transform = Transforms(Seq("min", "max", "count"))).collect().head
    assert(f3.getAs[Double]("min") === 1.0 && f3.getAs[Double]("max") === 3839.0 &&
      f3.getAs[Long]("count") === 718L)
  }

  // ---- other types ----------------------------------------------------

  test("count: condensed sum and bulk (count_helper.py)") {
    val t = mk(CountT)
    (1 until 7200).foreach(i => t.insert("test", 1.0, Td(i)))
    val c = coarseScalar(t.get(Seq("test"), "hour", Td(100), condense = true))
    assert(c(T(0)) === 3599.0)
    // rate transform: count per second over hour condensed
    val r = t.get(Seq("test"), "hour", Td(100), condense = true,
      transform = Transforms("rate")).collect().head.getDouble(1)
    assert(math.abs(r - 3599.0 / 3600.0) < 1e-9)
  }

  test("gauge: last write wins; joined gauge = last named series (gauge_helper.py)") {
    val t = mk(GaugeT)
    (1 until 7200).foreach(i => t.insert("test", i.toDouble, Td(i)))
    val g = t.get(Seq("test"), "minute", Td(100)).collect().head
    assert(g.getLong(1) === 119L)
    // joined: test2 has data later in list order
    val t2 = mk(GaugeT)
    t2.insert("a", 1.0, Td(10)); t2.insert("b", 2.0, Td(20))
    val gj = t2.get(Seq("a", "b"), "minute", Td(30)).collect().head
    assert(gj.getLong(1) === 2L) // b is last named series with data
    val gj2 = t2.get(Seq("b", "a"), "minute", Td(30)).collect().head
    assert(gj2.getLong(1) === 1L) // a is last in this order
  }

  test("gauge get/series: empty fills, condense keying, joined quirks (gauge_helper.py:105-200)") {
    val t = mk(GaugeT)
    (1 until 7200).foreach(i => t.insert("test", i.toDouble, Td(i)))
    // middle of an interval: last write wins
    val i1 = t.get(Seq("test"), "minute", Td(100)).collect().head
    assert(i1.getLong(0) === T(60) && i1.getLong(1) === 119L)
    // no data at "now": single bucket with _type_no_value() = 0
    val i2 = t.get(Seq("test"), "minute", Td(90000)).collect().head
    assert(i2.getLong(1) === 0L)
    // fine: 60 resolution rows, minute bucket 60 holds 119
    val f = t.get(Seq("test"), "hour", Td(100)).collect()
    assert(f.length === 60)
    assert(f.find(_.getLong(1) == T(60)).get.getLong(2) === 119L)
    // condensed: last value of the hour
    val c1 = t.get(Seq("test"), "hour", Td(100), condense = true).collect().head
    assert(c1.getLong(0) === T(0) && c1.getLong(1) === 3599L)
    val c2 = t.get(Seq("test"), "hour", Td(4000), condense = true).collect().head
    assert(c2.getLong(0) === T(3600) && c2.getLong(1) === 7199L)
    // series: dense fill of an empty bucket is 0 for a single gauge
    val t2 = mk(GaugeT)
    t2.insert("test", 5.0, Td(10))
    val s = t2.series(Seq("test"), "minute", end = Some(Td(130)), steps = Some(3))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(s === Map(T(0) -> 5L, T(60) -> 0L, T(120) -> 0L))
    // joined gauge: empty bucket is None (Gauge._join skips falsy rows)
    t2.insert("other", 7.0, Td(10))
    val j = t2.series(Seq("test", "other"), "minute", end = Some(Td(130)), steps = Some(3))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(j(T(0)) === 7L && j(T(60)) === null && j(T(120)) === null)
  }

  test("set: dedup per bucket (set_helper.py:107-136)") {
    val t = mk(SetT)
    (1 until 7200).foreach(i => t.insert("test", (i / 15).toDouble, Td(i)))
    val s = t.get(Seq("test"), "minute", Td(100)).collect().head.getSeq[Long](1)
    assert(s.toSet === Set(4L, 5L, 6L, 7L))
    val cnt = t.get(Seq("test"), "minute", Td(100), transform = Transforms("count"))
      .collect().head.getLong(1)
    assert(cnt === 4L)
  }

  test("histogram: value->count map, condensed, mean (histogram_helper.py:108-137)") {
    val t = mk(HistogramT)
    (1 until 7200).foreach(i => t.insert("test", (i / 2).toDouble, Td(i)))
    // minute bucket at _time(100): t in 60..119 → t/2 in 30..59, each twice
    val h = t.get(Seq("test"), "minute", Td(100)).collect().head
      .getMap[Long, Long](1)
    assert(h.size === 30)
    assert(h(30L) === 2L && h(59L) === 2L)
    // hour condensed: keys 0..1799 each count 2 (t=1..3599 → 1 appears for t=2,3)
    val hc = t.get(Seq("test"), "hour", Td(100), condense = true).collect().head
      .getMap[Long, Long](1)
    assert(hc.size === 1800)
    assert(hc(1L) === 2L && hc(1799L) === 2L)
    // mean transform: weighted
    val m = t.get(Seq("test"), "minute", Td(100), transform = Transforms("mean"))
      .collect().head.getDouble(1)
    assert(math.abs(m - (30L to 59L).map(_ * 2).sum / 60.0) < 1e-9)
  }

  test("joined reads per type: count sums, set unions, histogram merge-sums (…_helper.py test_get_joined)") {
    // count (count_helper.py:146-176): joined = sum of both series
    val c = mk(CountT)
    for (i <- 60 until 120) { c.insert("test1", i, Td(i)); c.insert("test2", i, Td(i)) }
    for (i <- 120 until 180) c.insert("test1", i, Td(i))
    val cj = c.get(Seq("test1", "test2"), "minute", Td(100)).collect().head
    assert(cj.getDouble(1) === 2.0 * (60 until 120).sum)
    val cr = c.get(Seq("test1", "test2"), "minute", Td(100), transform = Transforms("rate"))
      .collect().head.getDouble(1)
    assert(math.abs(cr - 2.0 * (60 until 120).sum / 60.0) < 1e-9)
    val c1 = c.get(Seq("test1", "test2"), "minute", Td(122)).collect().head
    assert(c1.getDouble(1) === (120 until 180).sum.toDouble)

    // set (set_helper.py): joined = union
    val s = mk(SetT)
    s.insert("test1", 1.0, Td(10)); s.insert("test1", 2.0, Td(20))
    s.insert("test2", 2.0, Td(15)); s.insert("test2", 9.0, Td(25))
    val sj = s.get(Seq("test1", "test2"), "minute", Td(10)).collect().head
    assert(sj.getSeq[Long](1).toSet === Set(1L, 2L, 9L))

    // histogram (histogram_helper.py): joined = per-key count sum
    val h = mk(HistogramT)
    h.insert("test1", 5.0, Td(10)); h.insert("test1", 5.0, Td(20)); h.insert("test1", 7.0, Td(30))
    h.insert("test2", 5.0, Td(15)); h.insert("test2", 8.0, Td(25))
    val hj = h.get(Seq("test1", "test2"), "minute", Td(10)).collect().head.getMap[Long, Long](1)
    assert(hj === Map(5L -> 3L, 7L -> 1L, 8L -> 1L))
  }

  test("custom callable transforms, incl. transform maps (README.rst:740-749)") {
    val t = mk(CountT)
    (1 until 120).foreach(i => t.insert("test", 1.0, Td(i)))
    // single custom callable: f(data, duration)
    val perMin = t.get(Seq("test"), "minute", Td(100),
      transform = Transforms(custom = Map("per_minute" -> ((d, step) => d / (step / 60.0)))))
      .collect().head
    assert(perMin.getDouble(1) === 60.0)
    // map of name -> callable fans out into named columns
    val fan = t.get(Seq("test"), "minute", Td(100),
      transform = Transforms(names = Seq("rate"),
        custom = Map("doubled" -> ((d, _) => d * 2)))).collect().head
    assert(fan.getAs[Double]("doubled") === 120.0)
    assert(math.abs(fan.getAs[Double]("rate") - 1.0) < 1e-9)
  }

  test("unknown interval raises (exceptions.py:10-11)") {
    val t = mk(CountT)
    t.insert("test", 1.0, Td(0))
    intercept[UnknownInterval] { t.get(Seq("test"), "decade", Td(0)) }
  }

  test("loosely typed insert: strings flow through insert() into set/gauge (README.rst:41-45)") {
    val st = new Timeseries(spark, SetT, minuteHour, valueType = StringType)
    st.insert("stat", "login", Td(1)); st.insert("stat", "login", Td(2))
    st.insert("stat", "logout", Td(3)); st.insert("stat", 42, Td(4))
    val got = st.get(Seq("stat"), "minute", Td(0)).collect().head.getSeq[String](1).toSet
    assert(got === Set("login", "logout", "42"))

    val g = new Timeseries(spark, GaugeT, minuteHour, valueType = StringType)
    g.insert("stat", "a", Td(1)); g.insert("stat", "b", Td(2))
    assert(g.get(Seq("stat"), "minute", Td(0)).collect().head.getString(1) === "b")
  }

  test("list-valued insert routes to the bulk path (timeseries.py:455-461)") {
    // insert(name, [v1, v2, ...]) ≡ one datapoint per element at the
    // same timestamp — NOT a stringified collection
    val ser = mk(SeriesT)
    ser.insert("test", Seq(1.0, 2.0, 3.0), Td(1))
    ser.insert("test", 4.0, Td(2))
    assert(coarseMap(ser.get(Seq("test"), "minute", Td(0)))(T(0)) ===
      Seq(1L, 2L, 3L, 4L))

    val cnt = mk(CountT)
    cnt.insert("test", Seq(1.0, 2.0, 3.0), Td(1))
    assert(coarseScalar(cnt.get(Seq("test"), "minute", Td(0)))(T(0)) === 6.0)

    val st = new Timeseries(spark, SetT, minuteHour, valueType = StringType)
    st.insert("stat", List("login", "logout", "login"), Td(1))
    st.insert("stat", Array("42"), Td(2))
    assert(st.get(Seq("stat"), "minute", Td(0)).collect().head
      .getSeq[String](1).toSet === Set("login", "logout", "42"))

    // gauge keeps the LAST element of the list — element order is
    // arrival order through the bulk path
    val g = mk(GaugeT)
    g.insert("test", Seq(7.0, 8.0, 9.0), Td(1))
    assert(g.get(Seq("test"), "minute", Td(0)).collect().head.getLong(1) === 9L)
  }

  test("bulk insert None-timestamp maps to now (timeseries.py:424-428)") {
    val t = mk(CountT)
    t.bulkInsertOpt(Map(
      Option.empty[Double] -> Map("test" -> Seq[Any](1.0, 2.0)),
      Option(Td(0))        -> Map("test" -> Seq[Any](5.0))),
      now = () => Td(61))
    val m = coarseScalar(t.series(Seq("test"), "minute", start = Some(Td(0)), end = Some(Td(61))))
    assert(m(T(60)) === 3.0) // the None rows landed at now()=T+61
    assert(m(T(0)) === 5.0)
  }

  test("bulk insert accumulation per type (FIXTURES.md §4)") {
    val inserts = Map(
      Td(0)  -> Map("test1" -> Seq(1.0, 2.0, 3.0), "test2" -> Seq(4.0, 5.0, 6.0), "test3" -> Seq(7.0, 8.0, 9.0)),
      Td(30) -> Map("test1" -> Seq(1.0, 2.0, 3.0), "test2" -> Seq(4.0, 5.0, 6.0)),
      Td(60) -> Map("test1" -> Seq(1.0, 2.0, 3.0), "test3" -> Seq(7.0, 8.0, 9.0)))

    val ser = mk(SeriesT); ser.bulkInsert(inserts)
    assert(coarseMap(ser.get(Seq("test1"), "minute", Td(0)))(T(0)) === Seq(1L, 2L, 3L, 1L, 2L, 3L))
    assert(coarseMap(ser.get(Seq("test3"), "minute", Td(0)))(T(0)) === Seq(7L, 8L, 9L))
    assert(coarseMap(ser.get(Seq("test1"), "minute", Td(60)))(T(60)) === Seq(1L, 2L, 3L))

    val cnt = mk(CountT); cnt.bulkInsert(inserts)
    assert(coarseScalar(cnt.get(Seq("test1"), "minute", Td(0)))(T(0)) === 12.0)

    val g = mk(GaugeT); g.bulkInsert(inserts)
    assert(g.get(Seq("test1"), "minute", Td(0)).collect().head.getLong(1) === 3L)

    val st = mk(SetT); st.bulkInsert(inserts)
    assert(st.get(Seq("test1"), "minute", Td(0)).collect().head.getSeq[Long](1).toSet === Set(1L, 2L, 3L))

    val h = mk(HistogramT); h.bulkInsert(inserts)
    val hm = h.get(Seq("test1"), "minute", Td(0)).collect().head.getMap[Long, Long](1)
    assert(hm === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("histogram series collapse merge-sums maps; set collapse unions (…_helper.py test_series)") {
    // histogram: values t/2 over 3 minutes → collapse merges per-key counts
    val h = mk(HistogramT)
    (1 until 180).foreach(i => h.insert("test", (i / 2).toDouble, Td(i)))
    val hc = h.series(Seq("test"), "minute", end = Some(Td(179)), steps = Some(3),
      collapse = true).collect().head
    assert(hc.getLong(0) === T(0))
    val hm = hc.getMap[Long, Long](1)
    assert(hm.size === 90) // keys 0..89
    assert(hm(0L) === 1L && hm(1L) === 2L && hm(89L) === 2L) // t=1 → 0 once; rest twice
    // set: t/15 over 3 minutes → collapse unions distinct values
    val s = mk(SetT)
    (1 until 180).foreach(i => s.insert("test", (i / 15).toDouble, Td(i)))
    val sc = s.series(Seq("test"), "minute", end = Some(Td(179)), steps = Some(3),
      collapse = true).collect().head
    assert(sc.getLong(0) === T(0))
    assert(sc.getSeq[Long](1).toSet === (0L to 11L).toSet)
    // gauge collapse: last value across the whole range
    val g = mk(GaugeT)
    (1 until 180).foreach(i => g.insert("test", i.toDouble, Td(i)))
    val gc = g.series(Seq("test"), "minute", end = Some(Td(179)), steps = Some(3),
      collapse = true).collect().head
    assert(gc.getLong(1) === 179L)
  }

  test("insert fan-out intervals=±3 (count_helper.py:50-104)") {
    val t = mk(CountT)
    t.insert("test", 1.0, Td(0), intervalsFanout = 3)
    val s = coarseScalar(t.series(Seq("test"), "minute", start = Some(Td(0)), steps = Some(5)))
    assert(s(T(0)) === 1.0 && s(T(60)) === 1.0 && s(T(120)) === 1.0 && s(T(180)) === 1.0)
    assert(s(T(240)) === 0.0)
    val t2 = mk(CountT)
    t2.insert("test", 1.0, Td(240), intervalsFanout = -3)
    val s2 = coarseScalar(t2.series(Seq("test"), "minute", start = Some(Td(0)), steps = Some(5)))
    assert(s2(T(240)) === 1.0 && s2(T(180)) === 1.0 && s2(T(120)) === 1.0 && s2(T(60)) === 1.0)
    assert(s2(T(0)) === 0.0)
  }

  test("properties and list (api_helper.py:43-81)") {
    val t = mk(CountT)
    t.insert("test", 1.0, Td(0)); t.insert("test", 1.0, Td(60)); t.insert("test", 1.0, Td(600))
    val p = t.properties("test")
    assert(p("minute") === (T(0), T(600)))
    assert(t.list().collect().map(_.getString(0)).toSeq === Seq("test"))
  }

  test("iterate: dense walk with empty buckets (api_helper.py:59-81)") {
    val t = mk(CountT)
    t.insert("test", 1.0, Td(0)); t.insert("test", 1.0, Td(60)); t.insert("test", 1.0, Td(600))
    val it = coarseScalar(t.iterate(Seq("test"), "minute"))
    assert(it.size === 11) // buckets 0..600 minute-wise
    assert(it(T(120)) === 0.0) // empty bucket present
    assert(it(T(600)) === 1.0)
  }

  test("expire drops buckets past retention (sql_timeseries_test.py:26-44)") {
    val t = mk(CountT)
    t.insert("test", 1.0, Td(0))
    t.insert("test", 1.0, Td(600))
    // now at _time(600): minute steps=5 → horizon excludes bucket 0
    val kept = t.expired(Td(600))
    val minuteBuckets = kept.filter(col("interval") === "minute")
      .select("i_time").distinct().collect().map(_.getLong(0)).toSet
    assert(minuteBuckets === Set((T0 + 600) / 60))
    // hour interval has no TTL → both buckets stay
    val hourCnt = kept.filter(col("interval") === "hour").count()
    assert(hourCnt === 2L)
  }

  test("§1.3 value-type breadth: DateType gauge and BinaryType set round-trip") {
    // DateType gauge — the reference's SQL/CQL type maps promise
    // date/time value columns (sql_backend.py:29-65 'date',
    // cassandra_backend.py:29-61 'timestamp'); writeFunc derives the
    // typed value from the loosely-typed insert double (P3)
    val day1 = java.time.LocalDate.of(2024, 3, 1).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val day2 = java.time.LocalDate.of(2024, 3, 5).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val tg = new Timeseries(spark, GaugeT, minuteHour,
      valueType = DateType,
      writeFunc = v => to_date(timestamp_seconds(v.cast(DoubleType).cast(LongType))))
    tg.insert("d", day1.toDouble, Td(10))
    tg.insert("d", day2.toDouble, Td(20)) // later write wins (gauge)
    val gotDate = tg.get(Seq("d"), "minute", Td(15)).collect().head.getDate(1)
    assert(gotDate === java.sql.Date.valueOf("2024-03-05"))
    // an empty gauge bucket of a non-numeric type fills null, not 0
    val empt = tg.series(Seq("d"), "minute", start = Some(Td(0)), steps = Some(3))
      .collect().map(r => Option(r.getDate(1)))
    assert(empt.count(_.isEmpty) === 2 && empt.count(_.isDefined) === 1)

    // BinaryType set — 'blob' in both reference type maps; distinct
    // byte strings per bucket, sorted (bytewise) for determinism
    val tb = new Timeseries(spark, SetT, minuteHour,
      valueType = BinaryType,
      writeFunc = v => v.cast(StringType).cast(BinaryType))
    tb.insert("b", 2.0, Td(10)); tb.insert("b", 1.0, Td(20)); tb.insert("b", 2.0, Td(30))
    val gotBin = tb.get(Seq("b"), "minute", Td(15)).collect().head
      .getSeq[Array[Byte]](1).map(new String(_, "UTF-8"))
    assert(gotBin === Seq("1.0", "2.0")) // distinct + bytewise-sorted
  }

  test("DecimalType values fold exactly (§1.3 type map, sql_backend.py:29-65)") {
    // 0.10 summed 100 times: exact decimal arithmetic gives 10.00; a
    // float fold would accumulate binary-representation error — the
    // property the reference's DECIMAL(24,12) column type exists for
    val t = new Timeseries(spark, CountT, minuteHour,
      valueType = DecimalType(12, 2))
    (0 until 100).foreach(i => t.insert("dec", 0.10, Td(i % 30)))
    val out = t.get(Seq("dec"), "minute", Td(10)).collect()
    assert(out.length === 1)
    val v = out.head.getDecimal(1)
    assert(v.compareTo(new java.math.BigDecimal("10.00")) === 0, s"got $v")
    // write-side cast rounds each inserted value to scale 2
    val t2 = new Timeseries(spark, CountT, minuteHour,
      valueType = DecimalType(12, 2))
    t2.insert("dec", 1.004, Td(0)) // → 1.00 at scale 2
    t2.insert("dec", 2.336, Td(1)) // → 2.34
    val v2 = t2.get(Seq("dec"), "minute", Td(30)).collect().head.getDecimal(1)
    assert(v2.compareTo(new java.math.BigDecimal("3.34")) === 0, s"got $v2")
  }
}
