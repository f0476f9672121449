package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

import graft.model._
import graft.ops._
import graft.time._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator from SURVEY.md §2 (or
  * a beyond-reference pipeline operator) through the engine
  * (graft.Timeseries / graft.ops) against the driver's parquet tables;
  * `oracleSql` holds the DuckDB-equivalent SQL the driver hash-compares
  * at sf0.01. Queries without an oracle entry (engine-specific hashing:
  * minhash/simhash/LSH) get the driver's rows-only check.
  *
  * Float policy: any double produced by reordering-sensitive math
  * (sums, means, rates, cosines) is round(_, 4..6) on BOTH sides so the
  * compare is immune to accumulation-order differences; exact values
  * (min/max/last/counts) are left untouched.
  */
object SparkEntry {

  /** The driver's events parquet carries TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; read nanos as LONG and convert to a
    * micros TIMESTAMP (bucket math is second-granular, so the truncation
    * is invisible to every query). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast(LongType)))
    else raw
  }
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Result presentation for BOUNDED outputs (metadata listings, small
    * aggregate grids, top-k): fold the final stage to one task and sort
    * locally. A global `orderBy` plans a RangePartitioning exchange
    * whose bounds require a separate SAMPLING JOB on every execution —
    * for a query whose whole result is a few hundred rows that job
    * dominates warm latency (measured: ts_list 0.39s → the sample job
    * and extra exchange are most of it). Single-task sort of a bounded
    * result is also the right 100 TB shape: the ordering here is
    * presentation, applied AFTER the distributed aggregation has
    * reduced the data, not a distributed sort of raw rows. Unbounded
    * outputs (per-doc tables, pair lists) keep their range-sort. */
  private def presentSorted(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)

  /** Postfix form of [[presentSorted]], overload-compatible with
    * `orderBy` so a bounded-output query swaps sorts with a one-token
    * change. Only used where the result is bounded by the QUERY
    * contract (a stat×bucket grid, a rollup, a confusion matrix) — not
    * by the corpus size; per-doc/per-pair dumps keep `orderBy`. */
  private implicit class BoundedPresentation(df: DataFrame) {
    def presentSorted(cols: Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(cols: _*)
    def presentSorted(c0: String, cs: String*): DataFrame =
      df.coalesce(1).sortWithinPartitions(c0, cs: _*)
  }

  /** Pair queries eagerly checkpoint their verified pair sets so the
    * LSH signature caches release immediately (session cache hygiene).
    * SPARK_GRAFT_EAGER_PAIRS=0 keeps those plans lazy — used by
    * graft.Explain to audit the full physical funnel. */
  private def eagerPairs: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_EAGER_PAIRS", "1") != "0"

  /** Per-JVM memo of persisted side artifacts (IVF index, int8 corpus):
    * built ONCE per (kind, sf-dir) and reused by every later invocation
    * — the write-once-read-many semantic the store paths model (at
    * scale the index build is a day-scale batch job; only the probe
    * side belongs in the query). In Bench the cold run pays the build,
    * the warm run measures the query alone — the scale-relevant
    * number. */
  private val storeMemo = new scala.collection.concurrent.TrieMap[String, String]()
  private def memoStore(kind: String, sfDir: String)(build: String => Unit): String =
    storeMemo.getOrElseUpdate(s"$kind|$sfDir", {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$kind").toString
      build(dir)
      dir
    })

  /** Planted media "re-encodes" for the phash fixtures: every 10th
    * doc's payload with one 8-byte run replaced by bytes copied from
    * elsewhere in the SAME payload — the copy shifts the global byte
    * sum only by the difference of two 8-byte text runs (negligible,
    * so near-tie blocks stay put; measured 48/50 recall at hamming
    * ≤ 3), where a constant overwrite would shift the mean enough to
    * flip near-tie bits across these narrow-range text payloads.
    * Shared by the inline and indexed phash queries — their parity
    * depends on one fixture. */
  private[graft] def reencodedMedia(media: DataFrame): DataFrame =
    media.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("media_type"),
        overlay(col("media"), substring(col("media"), 33, 8), lit(17))
          .as("media"))

  /** Canonical kairos fixture over events: name=event_type, ts,
    * value, seq=event_id (arrival order). */
  def eventLog(spark: SparkSession, dir: String, seriesType: SeriesType,
      intervals: Map[String, IntervalSpec], value: Column = col("value")): Timeseries = {
    val t = new Timeseries(spark, seriesType, intervals)
    t.attach(t.bucketize(events(spark, dir), col("event_type"), col("ts"), value, col("event_id")))
    t
  }

  val minuteHour: Map[String, IntervalSpec] = Map(
    "minute" -> IntervalSpec(TimeStep(60L)),
    "hour"   -> IntervalSpec(TimeStep(3600L), None, Some(TimeStep(60L))))
  val minuteOnly: Map[String, IntervalSpec] = Map("minute" -> IntervalSpec(TimeStep(60L)))
  val minuteTtl: Map[String, IntervalSpec] = Map("minute" -> IntervalSpec(TimeStep(60L), Some(1440)))
  val hourFine: Map[String, IntervalSpec] = Map(
    "hour" -> IntervalSpec(TimeStep(3600L), None, Some(TimeStep(60L))))
  val gregorian: Map[String, IntervalSpec] = Map(
    "daily"   -> IntervalSpec(TimeStep("daily")),
    "weekly"  -> IntervalSpec(TimeStep("weekly")),
    "monthly" -> IntervalSpec(TimeStep("monthly")),
    "yearly"  -> IntervalSpec(TimeStep("yearly")))

  /** 2024-01-01T00:00:00Z — the fixed series anchor for the events data. */
  val START: Long = 1704067200L

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ts_count_minute")(spark, "/root/testdata/sf0.001")

  /** Aggregate the bucket log at (name, i_bucket): the engine core the
    * per-name kairos API fixes `name` on; inventory queries keep it as a
    * grouping column. ord = struct(r_time, seq): resolution order then
    * arrival order — a struct, not a linearized r*K+seq scalar, so seq
    * can't overflow its slot at scale. Output i_time stays a bucket id.
    * The constructor readFunc is applied (the cast step P2). */
  private def grouped(t: Timeseries, interval: String): DataFrame = {
    val prepared = t.log
      .filter(col("interval") === interval)
      .select(col("name"), col("i_time"),
        struct(col("r_time"), col("seq")).as("ord"),
        t.readFunc(col("value")).as("value"))
    t.seriesType.aggregate(prepared, Seq("name", "i_time"))
  }

  private def fromB(c: Column, step: TimeStep): Column = TimeColumns.fromBucket(c, step)

  // =====================================================================
  // kairos-parity queries (SURVEY.md §2)
  // =====================================================================

  private val parityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A3/G2: count fold at minute buckets per stat
    "ts_count_minute" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteOnly)
      grouped(t, "minute")
        .select(col("name"), fromB(col("i_time"), TimeStep(60L)).as("i_time"),
          round(col("value"), 6).as("value"))
        .presentSorted("name", "i_time")
    }),

    // §1.3: DecimalType value end-to-end — the reference's SQL/CQL type
    // maps promise exact-decimal values (sql_backend.py:29-65
    // DECIMAL(24,12); cassandra_backend.py:29-61 'decimal'); here the
    // write path stores DECIMAL(12,2) (writeFunc cast at bucketize) and
    // the count fold sums decimals EXACTLY — no float accumulation
    // anywhere, the property decimal columns exist for
    "ts_count_decimal_hour" -> ((s, dir) => {
      val t = new Timeseries(s, CountT,
        Map("hour" -> IntervalSpec(TimeStep(3600L))),
        valueType = DecimalType(12, 2))
      t.attach(t.bucketize(events(s, dir), col("event_type"), col("ts"),
        col("value"), col("event_id")))
      grouped(t, "hour")
        // exact cents as BIGINT: the decimal write/fold path stays
        // decimal end-to-end; the OUTPUT avoids decimal columns, whose
        // engine-side rendering the driver's hash is sensitive to
        .select(col("name"), fromB(col("i_time"), TimeStep(3600L)).as("i_time"),
          (col("value").cast(DecimalType(18, 2)) * lit(100))
            .cast(LongType).as("value_c"))
        .presentSorted("name", "i_time")
    }),

    // A4/G1+G4: gauge condensed hour from minute resolution
    "ts_gauge_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, GaugeT, hourFine)
      grouped(t, "hour")
        .select(col("name"), fromB(col("i_time"), TimeStep(3600L)).as("i_time"), col("value"))
        .presentSorted("name", "i_time")
    }),

    // A5: set cardinality at hour buckets
    "ts_set_card_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, SetT, hourFine)
      grouped(t, "hour")
        .select(col("name"), fromB(col("i_time"), TimeStep(3600L)).as("i_time"),
          size(col("value")).cast(LongType).as("value"))
        .presentSorted("name", "i_time")
    }),

    // A2: histogram fold exploded to rows
    "ts_histogram_daily" -> ((s, dir) => {
      val t = eventLog(s, dir, HistogramT, Map("daily" -> IntervalSpec(TimeStep("daily"))))
      grouped(t, "daily")
        .select(col("name"), fromB(col("i_time"), TimeStep("daily")).as("i_time"),
          explode(col("value")).as(Seq("v", "cnt")))
        .presentSorted("name", "i_time", "v")
    }),

    // A1 + T1-T5: series fold + transform matrix
    "ts_series_transforms_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, SeriesT, hourFine)
      val step = TimeStep(3600L)
      val stepCol = TimeColumns.stepSize(col("i_time"), step)
      grouped(t, "hour").select(
        col("name"), fromB(col("i_time"), step).as("i_time"),
        round(SeriesT.transformExpr("mean", col("value"), stepCol).get, 6).as("t_mean"),
        SeriesT.transformExpr("count", col("value"), stepCol).get.as("t_count"),
        SeriesT.transformExpr("min", col("value"), stepCol).get.as("t_min"),
        SeriesT.transformExpr("max", col("value"), stepCol).get.as("t_max"),
        round(SeriesT.transformExpr("sum", col("value"), stepCol).get, 6).as("t_sum"),
        round(SeriesT.transformExpr("rate", col("value"), stepCol).get, 6).as("t_rate"))
        .presentSorted("name", "i_time")
    }),

    // S2/G6: fine uncondensed read — sparse (i_time, r_time) grid
    "ts_fine_hour_minute" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, hourFine)
      val prepared = t.log.filter(col("interval") === "hour")
        .select(col("name"), col("i_time"), col("r_time"), col("value"))
      CountT.aggregate(prepared, Seq("name", "i_time", "r_time"))
        .select(col("name"),
          fromB(col("i_time"), TimeStep(3600L)).as("i_time"),
          fromB(col("r_time"), TimeStep(60L)).as("r_time"),
          round(col("value"), 6).as("value"))
        .presentSorted("name", "i_time", "r_time")
    }),

    // G2+G6: series() range read with dense empty-bucket fill
    "ts_series_dense_day" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteOnly)
      t.series(Seq("click"), "minute", start = Some(START.toDouble), steps = Some(1440))
        .select(col("i_time"), round(col("value"), 6).as("value"))
    }),

    // G4: condense fine hour data to interval level over a month range
    "ts_condense_month" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, hourFine)
      t.series(Seq("view"), "hour", start = Some(START.toDouble), steps = Some(720),
        condense = true)
        .select(col("i_time"), round(col("value"), 6).as("value"))
    }),

    // G5: collapse an entire range to one row keyed at first bucket
    "ts_collapse_month" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteOnly)
      t.series(Seq("purchase"), "minute", start = Some(START.toDouble), steps = Some(43200),
        collapse = true)
        .select(col("i_time"), round(col("value"), 6).as("value"))
    }),

    // G7: multi-stat join (union + re-aggregate at bucket level)
    "ts_join_day" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteOnly)
      t.series(Seq("click", "view"), "minute", start = Some(START.toDouble), steps = Some(1440))
        .select(col("i_time"), round(col("value"), 6).as("value"))
    }),

    // G3: iterate — dense walk between first and last extant buckets
    "ts_iterate_minute" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteOnly)
      t.iterate(Seq("error"), "minute")
        .select(col("i_time"), round(col("value"), 6).as("value"))
    }),

    // G10: the per-call `fetch` hook (timeseries.py:575-580) driver-
    // oracled — the hook injects a store-level restriction (even
    // arrival seq only) into query()'s single read pipeline before
    // the fold; iterate()'s walk bounds come from the UNhooked log
    // (the reference walks the store's extant buckets), and the
    // oracle mirrors both sides of that asymmetry
    "ts_fetch_hook_minute" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteOnly)
      t.iterate(Seq("error"), "minute",
          hooks = ReadHooks(fetch = df => df.filter(col("seq") % 2 === 0)))
        .select(col("i_time"), round(col("value"), 6).as("value"))
    }),

    // I6: insert fan-out intervals=+3 (value lands in bucket..bucket+3)
    "ts_fanout_after3" -> ((s, dir) => {
      val t = new Timeseries(s, CountT, minuteOnly)
      val log = t.bucketize(events(s, dir), col("event_type"), col("ts"),
        col("value"), col("event_id"), fanout = lit(3))
      val prepared = log.select(col("name"), col("i_time"), col("value"))
      CountT.aggregate(prepared, Seq("name", "i_time"))
        .select(col("name"), fromB(col("i_time"), TimeStep(60L)).as("i_time"),
          round(col("value"), 6).as("value"))
        .presentSorted("name", "i_time")
    }),

    // D3/D4: retention — drop buckets past the TTL horizon at read
    "ts_expire_day" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteTtl)
      val nowSec = events(s, dir).agg(max(unix_timestamp(col("ts")))).head().getLong(0)
      val kept = t.expired(nowSec.toDouble)
        .select(col("name"), col("i_time"), col("value"))
      CountT.aggregate(kept, Seq("name", "i_time"))
        .select(col("name"), fromB(col("i_time"), TimeStep(60L)).as("i_time"),
          round(col("value"), 6).as("value"))
        .presentSorted("name", "i_time")
    }),

    // G8: properties — first/last bucket timestamps per stat
    "ts_properties_minute" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteOnly)
      presentSorted(
        t.log.filter(col("interval") === "minute")
          .groupBy("name")
          .agg(fromB(min(col("i_time")), TimeStep(60L)).as("first"),
            fromB(max(col("i_time")), TimeStep(60L)).as("last")),
        col("name"))
    }),

    // G9: list — all stat names
    "ts_list" -> ((s, dir) =>
      presentSorted(
        events(s, dir).select(col("event_type").as("name")).distinct(),
        col("name"))),

    // §1.2: Gregorian weekly %Y%U bucket (custom weekly expression)
    "ts_gregorian_weekly" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, Map("weekly" -> IntervalSpec(TimeStep("weekly"))))
      val prepared = t.log.filter(col("interval") === "weekly")
        .select(col("name"), col("i_time"), col("value"))
      CountT.aggregate(prepared, Seq("name", "i_time"))
        .select(col("name"), col("i_time").as("bucket"), round(col("value"), 6).as("value"))
        .presentSorted("name", "bucket")
    }),

    // I7: count default increment (insert with no value counts 1)
    "ts_gregorian_daily_count" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, Map("daily" -> IntervalSpec(TimeStep("daily"))),
        value = lit(1.0))
      val prepared = t.log.filter(col("interval") === "daily")
        .select(col("name"), col("i_time"), col("value"))
      CountT.aggregate(prepared, Seq("name", "i_time"))
        .select(col("name"), col("i_time").as("bucket"), round(col("value"), 6).as("value"))
        .presentSorted("name", "bucket")
    }),

    // §2.10/G4: CUSTOM condense callable — the README variance example
    // (README.rst:670-704): fold each hour's minute-resolution series
    // into its population variance. Exercises the staged hook pipeline
    // end-to-end through series().
    "ts_condense_variance" -> ((s, dir) => {
      val t = eventLog(s, dir, SeriesT, hourFine)
      val variance: Column => Column = entries => {
        val xs = flatten(org.apache.spark.sql.functions.transform(entries, e => e("value")))
        val n = size(xs).cast(DoubleType)
        val mean = aggregate(xs, lit(0.0), (a, x) => a + x) / n
        aggregate(xs, lit(0.0), (a, x) => a + (x - mean) * (x - mean)) / n
      }
      t.series(Seq("click"), "hour", start = Some(START.toDouble), steps = Some(720),
        condense = true, hooks = ReadHooks(condense = Some(variance)))
        .select(col("i_time"), round(col("value"), 6).as("value"))
    }),

    // §2.10/G7: CUSTOM join_rows — cross-series set intersection
    // (README.rst:711-714): values seen in BOTH click and view per hour.
    "ts_join_intersect_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, SetT, Map("hour" -> IntervalSpec(TimeStep(3600L))))
      val intersect: Column => Column = rows =>
        array_sort(array_intersect(
          coalesce(try_element_at(rows, lit(1)), array().cast(ArrayType(DoubleType))),
          coalesce(try_element_at(rows, lit(2)), array().cast(ArrayType(DoubleType)))))
      t.series(Seq("click", "view"), "hour", start = Some(START.toDouble), steps = Some(720),
        hooks = ReadHooks(joinRows = Some(intersect)))
        .select(col("i_time"),
          coalesce(size(col("value")), lit(0)).cast(LongType).as("n_common"))
    }),

    // §1.3: StringType set end-to-end (kairos values are loosely typed,
    // README.rst:41-45) — distinct user keys per hour per stat.
    "ts_set_string_hour" -> ((s, dir) => {
      val t = new Timeseries(s, SetT, Map("hour" -> IntervalSpec(TimeStep(3600L))),
        valueType = StringType)
      t.attach(t.bucketize(events(s, dir), col("event_type"), col("ts"),
        concat(lit("u"), col("user_id").cast(StringType)), col("event_id")))
      grouped(t, "hour")
        .select(col("name"), fromB(col("i_time"), TimeStep(3600L)).as("i_time"),
          size(col("value")).cast(LongType).as("n_vals"),
          array_min(col("value")).as("min_v"),
          array_max(col("value")).as("max_v"))
        .presentSorted("name", "i_time")
    }),

    // §1.3/P2/P3: StringType gauge with write_func + read_func casts
    // (timeseries.py:365-366): last user key per hour, decorated on read.
    "ts_gauge_string_hour" -> ((s, dir) => {
      val t = new Timeseries(s, GaugeT, Map("hour" -> IntervalSpec(TimeStep(3600L))),
        valueType = StringType,
        readFunc = v => concat(v, lit("!")),
        writeFunc = v => concat(lit("u"), v.cast(StringType)))
      t.attach(t.bucketize(events(s, dir), col("event_type"), col("ts"),
        col("user_id"), col("event_id")))
      grouped(t, "hour")
        .select(col("name"), fromB(col("i_time"), TimeStep(3600L)).as("i_time"), col("value"))
        .presentSorted("name", "i_time")
    }),

    // §1.2: Gregorian yearly bucket end-to-end
    "ts_gregorian_yearly" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, Map("yearly" -> IntervalSpec(TimeStep("yearly"))))
      val prepared = t.log.filter(col("interval") === "yearly")
        .select(col("name"), col("i_time"), col("value"))
      CountT.aggregate(prepared, Seq("name", "i_time"))
        .select(col("name"), col("i_time").as("bucket"), round(col("value"), 6).as("value"))
        .presentSorted("name", "bucket")
    }),

    // D1: delete(name) — log rewrite drops the stat everywhere
    "ts_delete_name" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteOnly)
      t.delete("click")
      grouped(t, "minute")
        .select(col("name"), fromB(col("i_time"), TimeStep(60L)).as("i_time"),
          round(col("value"), 6).as("value"))
        .presentSorted("name", "i_time")
    }),

    // I12: write-time TTL guard — rows already past the retention
    // horizon are dropped AT WRITE (redis_backend.py:146-148), not
    // carried and re-filtered forever
    "ts_write_ttl_minute" -> ((s, dir) => {
      val t = new Timeseries(s, CountT, minuteTtl)
      val nowSec = events(s, dir).agg(max(unix_timestamp(col("ts")))).head().getLong(0)
      val log = t.bucketize(events(s, dir), col("event_type"), col("ts"),
        col("value"), col("event_id"), guardNow = Some(nowSec.toDouble))
      val prepared = log.select(col("name"), col("i_time"), col("value"))
      CountT.aggregate(prepared, Seq("name", "i_time"))
        .select(col("name"), fromB(col("i_time"), TimeStep(60L)).as("i_time"),
          round(col("value"), 6).as("value"))
        .presentSorted("name", "i_time")
    }),

    // T5 with variable Gregorian step: monthly rate (per-second)
    "ts_gregorian_monthly_rate" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, Map("monthly" -> IntervalSpec(TimeStep("monthly"))))
      val prepared = t.log.filter(col("interval") === "monthly")
        .select(col("name"), col("i_time"), col("value"))
      CountT.aggregate(prepared, Seq("name", "i_time"))
        .select(col("name"), col("i_time").as("bucket"),
          round(CountT.transformExpr("rate", col("value"),
            TimeColumns.stepSize(col("i_time"), TimeStep("monthly"))).get, 6).as("rate"))
        .presentSorted("name", "bucket")
    }),
  )

  // =====================================================================
  // relational / bench headliners (SURVEY.md §2.8: what Spark adds)
  // =====================================================================

  private val relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: scan + filter + hash agg (pushdown + partial agg)
    "q1_pricing_summary" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .presentSorted("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3 shape: broadcast dim join + shuffle join + top-k
    "q3_top_orders" -> ((s, dir) => {
      val c = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = table(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      // broadcast the customer filter into orders FIRST so the shuffle
      // join's probe side is pre-shrunk (AQE won't reorder a written
      // join order; at scale this is the difference between shuffling
      // all orders and shuffling one segment's)
      li.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // §7.6: JSON prop extraction over the events stream (get_json_object
    // is codegen'd; the scan prunes to the two referenced columns)
    "events_props_json" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type").as("name"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("name")
        .agg(count(lit(1)).as("n"), round(avg(col("k")), 6).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("name")),

    // §2.4: approximate distinct (HLL) — the documented approximate
    // variant of the set type for 100 TB cardinalities. Error bound vs
    // exact is asserted in HooksSpec; the driver records rows-only.
    "ts_set_approx_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, SetT, hourFine)
      t.log.filter(col("interval") === "hour")
        .groupBy(col("name"), col("i_time"))
        .agg(approx_count_distinct(col("value")).as("approx_card"))
        .select(col("name"), fromB(col("i_time"), TimeStep(3600L)).as("i_time"),
          col("approx_card"))
        .presentSorted("name", "i_time")
    }),

    // top-k without global sort (TakeOrdered path)
    "events_top_users" -> ((s, dir) =>
      events(s, dir)
        .groupBy("user_id")
        .agg(round(sum(col("value")), 6).as("total"))
        .orderBy(col("total").desc, col("user_id"))
        .limit(20)),

    // AS-OF join (attribution): each purchase event decorated with the
    // user's latest view value at-or-before it — the timeseries
    // operator Spark lacks, as one shuffle + one per-partition sort
    // (graft.ops.AsOf). DuckDB-oracled against its native ASOF LEFT
    // JOIN; right side pre-aggregated to unique (user, sec) so the
    // tie contract is engine-independent; second granularity keeps
    // both engines' timestamp arithmetic identical
    "events_asof_attrib" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("sec", unix_timestamp(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("sec"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "sec").agg(max("value").as("view_value"))
      AsOf.joinAsOf(purchases, views, Seq("user_id"), "sec", Seq("view_value"))
        .orderBy("event_id")
    }),

    // RANGE join (incident correlation): every click within ±2h of an
    // error by the same user — bucketed interval join (graft.ops
    // .RangeJoin): equality join on (user, 60s-bucket) + exact BETWEEN,
    // never the nested-loop Spark plans for a bare range predicate.
    // DuckDB-oracled against the plain BETWEEN join
    "events_range_correlate" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("sec", unix_timestamp(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("sec").as("x"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          (col("sec") - 7200).as("lo"), (col("sec") + 7200).as("hi"))
      // bucketWidth = the 14400s interval width: ≤ 2 replicas/interval
      RangeJoin.pointInInterval(clicks, errors, Seq("user_id"), "x", "lo", "hi",
        bucketWidth = 14400)
        .select("click_id", "error_id", "user_id")
        .orderBy("click_id", "error_id")
    }),

    // SESSIONIZATION: gap-based sessions (30-min inactivity) per user —
    // one shuffle on user_id, windows + closing agg share the exchange
    // (graft.ops.Sessions). DuckDB-oracled against the identical
    // lag/running-sum window SQL; event_id tie-break makes equal-second
    // ordering engine-independent
    // pre-flight key-skew profile of a prospective shuffle key
    // (events.user_id): rows per md5 bucket — read before choosing
    // partitioning/AQE-skew/salting for a big join; md5 bucketing
    // keeps the profile engine-portable, so fully oracled
    "profile_key_skew" -> ((s, dir) =>
      Profile.keySkew(events(s, dir), col("user_id"), buckets = 32)
        .presentSorted("bucket")),

    // RETENTION COHORTS: users grouped by first-seen day, activity
    // counted at day offsets — the classic product-analytics triangle
    // (kairos-adjacent event analytics the reference's bucket reads
    // feed into). Two aggregations: first-seen per user (map-side
    // combined min), then distinct users per (cohort, offset)
    "events_retention_cohorts" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ev.join(first, Seq("user_id"))
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"),
          col("user_id"))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .presentSorted("cohort_day", "day_offset")
    }),

    "events_sessionize" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("sec", unix_timestamp(col("ts")))
      Sessions.sessionize(ev, Seq("user_id"), "sec", gapSec = 1800,
          tieBreak = Some("event_id"))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"), min("sec").as("start_sec"),
          max("sec").as("end_sec"), round(sum("value"), 6).as("total_value"))
        .orderBy("user_id", "session_idx")
    }),

    // FUNNEL: ordered view→click→purchase reach per user (strict
    // in-order contract; graft.ops.Sessions.funnel) — chained running
    // windows over one sort. DuckDB-oracled against the same chained
    // window construction
    "events_funnel" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("sec", unix_timestamp(col("ts")))
      Sessions.funnel(ev, Seq("user_id"), "sec", col("event_type"),
          Seq("view", "click", "purchase"), tieBreak = Some("event_id"))
        .presentSorted("user_id")
    }),

    // DECONTAMINATION: eval-leakage check (GPT-3 appendix C shape) —
    // test split (doc_id % 5 == 0) scored for word-3-gram overlap
    // against the train split; one gram-hash equality join + one agg
    // (graft.ops.Decontaminate). DuckDB-oracled on the gram STRINGS
    // (the engine joins on xxhash64 — same fractions unless a 64-bit
    // collision)
    "decontaminate_ngram" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Decontaminate.contamination(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          col("text"), col("doc_id"), n = 3)
        .presentSorted("test_id")
    }),

    // SUITE DECONTAMINATION: every benchmark in ONE pass — two
    // labeled eval sets (a disjoint held-out split plus a
    // deliberately LEAKY set that contains train members) score
    // against the same train gram table through a single join+agg,
    // so the expensive train side is scanned once for the whole
    // suite; train members in the leaky set read ~1.0 — the
    // leaked-benchmark signal. DuckDB-oracled per (set, doc)
    "decon_suite_ngram" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val evals = docs.filter(col("doc_id") % 5 === 0)
        .select(lit("holdout").as("eval_set"), col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 0)
          .select(lit("leaky").as("eval_set"), col("doc_id"), col("text")))
      Decontaminate.contaminationSuite(
          docs.filter(col("doc_id") % 5 =!= 0), evals,
          col("text"), col("doc_id"), col("eval_set"), n = 3)
        .presentSorted("eval_set", "test_id")
    }),

    // the combined 100 TB shape: ONE bloom bitmap over the whole
    // suite's grams gates the train stream map-side, one exact join
    // scores every benchmark — output identical to decon_suite_ngram
    // (same oracle SQL proves the gate has no semantic footprint)
    "decon_suite_bloom" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val evals = docs.filter(col("doc_id") % 5 === 0)
        .select(lit("holdout").as("eval_set"), col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 0)
          .select(lit("leaky").as("eval_set"), col("doc_id"), col("text")))
      Decontaminate.contaminationSuiteBloomGated(
          docs.filter(col("doc_id") % 5 =!= 0), evals,
          col("text"), col("doc_id"), col("eval_set"), n = 3,
          mBits = 1L << 18, k = 4, seed = 11L)
        .presentSorted("eval_set", "test_id")
    }),

    // BLOOM-GATED DECONTAMINATION: same contract as
    // decontaminate_ngram (the bitmap gate admits every true member,
    // so the exact join behind it yields identical fractions — the
    // oracle proves exactly that), but the train gram stream passes a
    // zero-shuffle broadcast bit-test before the distinct shuffle —
    // the 100 TB plan (graft.ops.Bloom + contaminationBloomGated)
    "decon_bloom_gated" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Decontaminate.contaminationBloomGated(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          col("text"), col("doc_id"), n = 3, mBits = 1L << 17, k = 4,
          seed = 11L)
        .presentSorted("test_id")
    }),

    // BLOOM BITMAP INTERNALS: the (word, bits) table fit over the
    // document ids — md5-probe positions, 32-bit words, bit_or fold
    // all rebuilt verbatim by the DuckDB oracle, proving the filter
    // is bit-for-bit engine-portable (graft.ops.Bloom.fit)
    "bloom_words" -> ((s, dir) =>
      Bloom.fit(table(s, dir, "documents"), col("doc_id"),
          mBits = 4096L, k = 3, seed = 1L)
        .orderBy("word")),

    // COUNT-MIN SKETCH: fixed-size token-frequency estimation
    // (graft.ops.Sketch) — md5 probe grid is cell-for-cell
    // engine-portable; the query pits the estimate against the true
    // count for the top-50 tokens (total order makes the cut exact)
    "cms_token_freq" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(Dedup.tokens(col("text"))).as("token"))
      val sketch = Sketch.countMinFit(toks, col("token"), depth = 4,
        width = 2048L, seed = 2L)
      val top = toks.groupBy("token").agg(count(lit(1)).as("n_true"))
        .orderBy(col("n_true").desc, col("token")).limit(50)
      Sketch.countMinEstimate(top, col("token"), sketch, depth = 4,
          width = 2048L, seed = 2L)
        .presentSorted(col("n_true").desc, col("token"))
    }),

    // EDIT-DISTANCE FUZZY MATCHING: exact levenshtein<=2 pairs via
    // PassJoin segment blocking (graft.ops.EditDistance) — candidates
    // from a key-equality join on (len, segment_idx, segment_text),
    // threshold-verified; oracled against DuckDB's brute-force
    // quadratic levenshtein on the sample, proving the funnel misses
    // nothing
    "fuzzy_name_pairs_exact_sample" -> ((s, dir) =>
      EditDistance.editPairs(
          table(s, dir, "customer").filter(col("c_custkey") < 300),
          col("c_name"), col("c_custkey"), maxDist = 2)
        .orderBy("id_a", "id_b")),

    // the indexed twin: new names (custkey 300-399) against the
    // stored segment index of custkey < 300, plus new-vs-new inline —
    // oracled against DuckDB brute force over exactly the
    // at-least-one-side-new pair space
    "fuzzy_name_indexed" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
      val store = memoStore("fuzzyidx", dir)(p =>
        EditDistance.buildIndex(cust.filter(col("c_custkey") < 300),
          col("c_name"), col("c_custkey"), maxDist = 2, p))
      EditDistance.editPairsAgainstIndex(s, store,
          cust.filter(col("c_custkey") >= 300 && col("c_custkey") < 400),
          col("c_name"), col("c_custkey"), maxDist = 2)
        .orderBy("id_a", "id_b")
    }),

    // INCREMENTAL CARDINALITY: per-source distinct-token estimates
    // from persisted-mergeable HLL registers (graft.ops.Sketch over
    // Spark's DataSketches natives) — rows-only (sketch binaries
    // aren't engine-portable); estimate accuracy, shard-merge
    // identity, and streaming equivalence measured in SketchSpec
    "hll_tokens_by_source" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("source"), explode(Dedup.tokens(col("text"))).as("token"))
      Sketch.hllEstimate(Sketch.hllFit(toks, col("token"), Seq("source")),
          Seq("source"))
        .presentSorted("source")
    }),

    // MODEL-BASED QUALITY: multinomial Naive-Bayes classifier
    // (graft.ops.Classify) — the closed-form fastText-style filter;
    // trained on the train split's lang=='en' label, scored on the
    // test split. Counting-only training makes the fitted model
    // engine-exact, so per-doc scores oracle at 6 dp
    "classify_nb_score" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val (w, m) = Classify.fitNaiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), col("text"),
        col("lang") === "en", alpha = 0.5)
      Classify.scoreNaiveBayes(docs.filter(col("doc_id") % 5 === 0),
          col("text"), col("doc_id"), w, m)
        .orderBy("doc_id")
    }),

    // calibration curve of the held-out NB probabilities: decile
    // buckets of predicted prob vs observed positive rate — the
    // reliability diagram that tells you whether a 0.9-score doc is
    // actually 90% likely English before you trust the filter's
    // threshold at scale
    "classify_nb_calibration" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val (w, m) = Classify.fitNaiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), col("text"),
        col("lang") === "en", alpha = 0.5)
      val scored = Classify.scoreNaiveBayes(docs.filter(col("doc_id") % 5 === 0),
        col("text"), col("doc_id"), w, m)
      scored
        .join(docs.select(col("doc_id"),
          (col("lang") === "en").cast("int").as("__y")), Seq("doc_id"))
        .select(least(floor(col("prob") * lit(10)), lit(9L)).cast("long")
          .as("bucket"), col("__y"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(col("__y")).cast("long").as("pos"))
        .select(col("bucket"), col("n"), col("pos"),
          (floor(col("pos").cast("double") / col("n").cast("double") *
            lit(1e6) + lit(0.5)) / lit(1e6)).as("obs_rate"),
          ((col("bucket").cast("double") + lit(0.5)) / lit(10.0)).as("mid"))
        .presentSorted("bucket")
    }),

    // the classifier's held-out confusion + precision/recall/F1 —
    // the one-row health report a quality-filter fit job emits
    "classify_nb_eval" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val (w, m) = Classify.fitNaiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), col("text"),
        col("lang") === "en", alpha = 0.5)
      val scored = Classify.scoreNaiveBayes(
        docs.filter(col("doc_id") % 5 === 0), col("text"), col("doc_id"),
        w, m)
      Classify.evalBinary(
        scored.join(docs.select(col("doc_id"),
          (col("lang") === "en").cast("int").as("y")), Seq("doc_id")),
        col("y"))
    }),

    // multi-class NB: predict the language directly (5-way argmax
    // over dense token x class weights, tie broken by class name so
    // the prediction is engine-deterministic); output is the held-out
    // confusion matrix against the labeled lang column
    "classify_nb_lang_confusion" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val (w, m) = Classify.fitNaiveBayesMulti(
        docs.filter(col("doc_id") % 5 =!= 0), col("text"), col("lang"))
      Classify.scoreNaiveBayesMulti(docs.filter(col("doc_id") % 5 === 0),
          col("text"), col("doc_id"), w, m)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .presentSorted("lang", "pred")
    }),

    // char-3-gram NB language ID — the upgrade over the marker-token
    // heuristic (text_langid_quality): character n-grams capture
    // orthography rather than vocabulary (Cavnar & Trenkle), training
    // is engine-exact counting, and tokenization is pure built-in
    // substr/sequence so the ORACLE retrains the same model in SQL.
    // The corpus text is language-independent token soup, so the
    // fixture appends a per-language phrase keyed by the LABEL (both
    // sides generated from the same Scala constant) — the model must
    // learn the orthographic grams through ~600 chars of shared-
    // vocabulary noise per doc; output is the held-out confusion vs
    // the labeled lang column (accuracy floor lives in METRICS)
    "langid_nb_eval" -> ((s, dir) => {
      val marked = langMarkedDocs(table(s, dir, "documents"))
      val grams = (t: Column) => Classify.charGrams(t, 3)
      val (w, m) = Classify.fitNaiveBayesMulti(
        marked.filter(col("doc_id") % 5 =!= 0), col("mtext"), col("lang"),
        tok = grams)
      Classify.scoreNaiveBayesMulti(marked.filter(col("doc_id") % 5 === 0),
          col("mtext"), col("doc_id"), w, m, tok = grams,
          broadcastModel = true)
        .join(marked.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .presentSorted("lang", "pred")
    }),

    // ROLLING FEATURES: per-user lag/delta/rolling-window stats
    // (graft.ops.Features) — stacked windows over one Exchange+Sort.
    // DuckDB-oracled against identical window SQL
    "events_rolling_features" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("sec", unix_timestamp(col("ts")))
      Features.rolling(ev, Seq("user_id"), "sec", col("value"), nRows = 3,
          tieBreak = Some("event_id"))
        .select(col("user_id"), col("event_id"),
          round(col("prev_value"), 6).as("prev_value"),
          round(col("delta"), 6).as("delta"),
          round(col("roll_mean"), 6).as("roll_mean"),
          round(col("roll_min"), 6).as("roll_min"),
          round(col("roll_max"), 6).as("roll_max"), col("seq"))
        .orderBy("user_id", "seq")
    }),

    // DISTRIBUTION PROFILE: exact interpolated quantiles of event
    // values per type (Spark `percentile` == DuckDB `quantile_cont`,
    // both p·(n−1) linear interpolation) — the column-profiling
    // primitive for corpus curation dashboards
    // hour-of-day seasonality profile per event type — the diurnal
    // fingerprint anomaly baselines and capacity plans read first
    "events_hourly_profile" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type").as("name"),
          hour(col("ts")).cast("long").as("hour_of_day"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("mean_value"))
        .presentSorted("name", "hour_of_day")),

    // winsorized robust stats per type: clip at the [p05, p95] cuts
    // and compare raw vs clipped means — the outlier-robust
    // aggregation a metrics pipeline uses when a bad sensor can put
    // ±1e9 in `value`. Cuts are floor-quantized BEFORE comparison:
    // interpolated quantiles can land exactly on the 2-decimal value
    // grid, where a 1-ulp engine difference would flip a clip count
    "events_value_winsorized" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type").as("name"),
        col("value"))
      val q = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      val cuts = ev.groupBy("name").agg(
        q(expr("percentile(value, 0.05)")).as("__lo"),
        q(expr("percentile(value, 0.95)")).as("__hi"))
      ev.join(broadcast(cuts), Seq("name"))
        .select(col("name"), col("value"), col("__lo"), col("__hi"),
          greatest(col("__lo"), least(col("__hi"), col("value")))
            .as("__w"))
        .groupBy("name")
        .agg(round(avg(col("__w")), 6).as("wins_mean"),
          round(avg(col("value")), 6).as("raw_mean"),
          sum((col("value") > col("__hi") || col("value") < col("__lo"))
            .cast("long")).as("n_clipped"),
          count(lit(1)).as("n"))
        .presentSorted("name")
    }),

    "events_value_quantiles" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type").as("name"))
        .agg(
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.75)"), 6).as("p75"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(avg(col("value")), 6).as("mean"),
          count(lit(1)).as("n"))
        .presentSorted("name")),

    // the scale path for quantiles: Spark's built-in Greenwald-Khanna
    // sketch (approx_percentile) — mergeable partial state instead of
    // the exact percentile's per-group sorted buffer, the same
    // exact→approx pairing as ts_set_card_hour→ts_set_approx_hour.
    // Rows-only (the sketch is engine-specific); rank-error measured
    // against the exact operator in FeaturesSpec
    "events_value_quantiles_approx" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type").as("name"))
        .agg(
          round(expr("approx_percentile(value, 0.25, 10000)"), 6).as("p25"),
          round(expr("approx_percentile(value, 0.5, 10000)"), 6).as("p50"),
          round(expr("approx_percentile(value, 0.75, 10000)"), 6).as("p75"),
          round(expr("approx_percentile(value, 0.9, 10000)"), 6).as("p90"),
          round(avg(col("value")), 6).as("mean"),
          count(lit(1)).as("n"))
        .presentSorted("name")),

    // TS ANOMALY: rolling z-score outlier detection over the hourly
    // count series (graft.ops.Features.zscoreAnomaly) — each bucket
    // scored against its trailing 24 buckets excluding itself, one
    // Exchange+Sort. DuckDB-oracled against identical window SQL
    "ts_anomaly_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, Map("hour" -> IntervalSpec(TimeStep(3600L))))
      Features.zscoreAnomaly(grouped(t, "hour"), Seq("name"), "i_time",
          col("value"), nRows = 24, threshold = 3.0)
        .select(col("name"), fromB(col("i_time"), TimeStep(3600L)).as("i_time"),
          round(col("value"), 6).as("value"),
          round(col("base_mean"), 6).as("base_mean"),
          round(col("base_std"), 6).as("base_std"),
          round(col("z"), 6).as("z"),
          col("is_anomaly").cast(LongType).as("is_anomaly"))
        .presentSorted("name", "i_time")
    }),

    // SEASONAL ANOMALY: z-score vs the SAME HOUR-OF-DAY's trailing
    // history (graft.ops.Features.seasonalAnomaly) — the phase joins
    // the partition key, so a daily peak is normal at peak hour and
    // anomalous at 3 am; still one Exchange+Sort
    "ts_seasonal_anomaly_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, Map("hour" -> IntervalSpec(TimeStep(3600L))))
      Features.seasonalAnomaly(grouped(t, "hour"), Seq("name"), "i_time",
          col("value"), period = 24L, nRows = 5, threshold = 2.5)
        .select(col("name"), fromB(col("i_time"), TimeStep(3600L)).as("i_time"),
          (col("phase") * 3600).as("phase"),
          round(col("value"), 6).as("value"),
          round(col("base_mean"), 6).as("base_mean"),
          round(col("base_std"), 6).as("base_std"),
          round(col("z"), 6).as("z"),
          col("is_anomaly").cast(LongType).as("is_anomaly"))
        .presentSorted("name", "i_time")
    }),

    // TS INTERPOLATE: linear gap fill of a sparse gauge series over a
    // dense day axis (graft.ops.Features.interpolateLinear) — interior
    // nulls become the line through their non-null neighbors, edges
    // stay null. DuckDB-oracled via IGNORE NULLS window SQL
    "ts_interpolate_minute" -> ((s, dir) => {
      val t = eventLog(s, dir, GaugeT, minuteOnly)
      val axis = s.range(28401120L, 28402560L)
        .select(lit("error").as("name"), col("id").as("i_time"))
      val vals = grouped(t, "minute").filter(col("name") === "error")
      val grid = axis.join(broadcast(vals), Seq("name", "i_time"), "left")
      Features.interpolateLinear(grid, Seq("name"), "i_time", col("value"))
        .select(col("name"), fromB(col("i_time"), TimeStep(60L)).as("i_time"),
          round(col("value"), 6).as("value"),
          round(col("filled"), 6).as("filled"),
          col("interpolated").cast(LongType).as("interpolated"))
        .presentSorted("i_time")
    }),

    // EMBEDDING CENTROIDS: per-label elementwise mean vector
    // (graft.ops.Similarity.labelCentroids) — posexplode + one
    // (label, pos) hash agg with map-side partials, no collect.
    // DuckDB-oracled against generate_series subscripting
    "embed_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(table(s, dir, "embeddings"),
          col("label"), col("embedding"))
        .select(col("label"), col("pos").cast(LongType).as("pos"),
          col("centroid"), col("n"))
        .presentSorted("label", "pos")),

    // embedding drift monitor: per-label centroid cosine to the
    // GLOBAL centroid — the slice-vs-corpus shift a pipeline watches
    // when a source or labeling run goes off-distribution; both
    // centroids on the rounded grid, cosine rounded, fully oracled
    "embed_label_drift" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val lv = Similarity.labelCentroids(emb, col("label"), col("embedding"))
        .groupBy("label")
        .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("centroid")))),
            x => x("centroid")).as("__cv"),
          max(col("n")).as("n"))
      val gc = emb.select(posexplode(col("embedding")).as(Seq("__p", "__x")))
        .groupBy("__p").agg(round(avg(col("__x").cast("double")), 6).as("__m"))
        .orderBy("__p").collect().map(_.getDouble(1))
      lv.select(col("label").cast("int").as("label"), col("n"),
          round(Similarity.cosine(col("__cv"),
            array(gc.map(lit(_)): _*)), 4).as("drift_cos"))
        .presentSorted("label")
    }),

    // NEAREST-CENTROID ASSIGNMENT: each vector classified to its
    // max-cosine label centroid — centroids rebuilt from the rounded
    // (label, pos) rows so BOTH engines score bit-identical inputs;
    // rank-1 cut on (rounded cosine desc, label asc) is deterministic.
    // Corpus side streams once against the broadcast 10-row centroid
    // table; no KMeans, no collect
    "embed_centroid_assign" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val cvec = Similarity.labelCentroids(emb, col("label"), col("embedding"))
        .groupBy(col("label").as("pred_label"))
        .agg(F.transform(array_sort(collect_list(struct(col("pos"), col("centroid")))),
          e => e.getField("centroid")).as("cvec"))
      val scored = emb.select(col("vec_id"), col("label"),
          F.transform(col("embedding"), x => x.cast(DoubleType)).as("e"))
        .join(broadcast(cvec))
        .select(col("vec_id"), col("label"), col("pred_label"),
          round(Similarity.cosine(col("e"), col("cvec")), 6).as("cos"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("vec_id")
        .orderBy(col("cos").desc, col("pred_label").asc)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select("vec_id", "label", "pred_label", "cos")
        .orderBy("vec_id")
    }),

    // EMBEDDING COVARIANCE (graft.ops.Pca): the one-pass moment
    // aggregate behind PCA/whitening — a fixed ~17 KB buffer per
    // partition (CovAccum TypedImperativeAggregate), never rows,
    // expanded to the 2080 upper-triangle entries driver-side (model
    // state, not data). Every entry DuckDB-oracled on the bounded
    // sample
    "embed_covariance_sample" -> ((s, dir) =>
      Pca.covariance(table(s, dir, "embeddings").filter(col("vec_id") < 300),
          col("embedding"), dims = 64)
        .select(col("i"), col("j"), round(col("cov"), 6).as("cov"))
        .orderBy("i", "j")),

    // PCA SPECTRAL INVARIANTS over the FULL corpus: Σλ = trace(C) and
    // Σλ² = ‖C‖²_F — the eigenvalue arithmetic hash-oracled without
    // DuckDB needing an eigensolver (and a convergence oracle: an
    // unconverged Jacobi leaves off-diagonal mass, which shows up as
    // a strict Σλ² deficit at the 6-dp rounding)
    "embed_pca_spectrum" -> ((s, dir) =>
      Pca.spectralInvariants(table(s, dir, "embeddings"),
          col("embedding"), dims = 64)
        .select(round(col("trace"), 6).as("trace"),
          round(col("frobenius_sq"), 6).as("frobenius_sq"), col("n"))),

    // PCA WHITENING: fit (one covariance agg + driver Jacobi on the
    // 64x64 — corpus-size-independent), then project every vector
    // through the fused k x d kernel in the scan. The registered
    // output is the whiten INVARIANT (Pca.whitenInvariant): mean and
    // covariance of the whitened corpus, which are ZERO and IDENTITY
    // by construction — a closed form DuckDB can state WITHOUT the
    // engine-local eigenbasis, so the full fit→whiten pipeline is
    // hash-oracled (every whitened row feeds the aggregate; the raw
    // whitened values themselves are basis-dependent and carry the
    // tighter 1e-2/1e-9 METRICS floors + PcaSpec closed forms)
    "embed_pca_whiten" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val m = Pca.fit(emb, col("embedding"), dims = 64, k = 16)
      Pca.whitenInvariant(emb, col("vec_id"), col("embedding"), m)
        .orderBy("i", "j")
    }),

    // the INCREMENTAL fit: whiten against a persisted moment store
    // (built once, memoized) instead of a from-scratch aggregation —
    // moments are additive so the stored fit IS the from-scratch fit
    // (PcaSpec pins equality incl. the streaming append twin); same
    // identity-invariant oracle as the inline registration
    "embed_pca_whiten_indexed" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val store = memoStore("pcamom", dir)(p =>
        Pca.buildMomentStore(emb, col("embedding"), dims = 64, s"$p/m"))
      val m = Pca.fitFromStore(s, s"$store/m", dims = 64, k = 16)
      Pca.whitenInvariant(emb, col("vec_id"), col("embedding"), m)
        .orderBy("i", "j")
    }),

    // SEARCH: BM25 keyword ranking over inverted postings
    // (graft.ops.Search) — filtered postings scan, broadcast df/stats,
    // TakeOrderedAndProject top-k. DuckDB-oracled against the same
    // Okapi/Lucene-IDF arithmetic in SQL; rounded-score + doc_id
    // ordering makes the cut deterministic on both engines
    "search_bm25" -> ((s, dir) =>
      Search.bm25TopK(table(s, dir, "documents"), col("text"),
        col("doc_id"), query = "customer vector slow", k = 50)),

    // PARAGRAPH BOILERPLATE PRUNE: drop paragraphs recurring across
    // ≥10 docs and reconstruct documents in order
    // (graft.ops.Dedup.paragraphPrune). Corpus docs are single-
    // paragraph, so the fixture appends a universal footer (pruned
    // everywhere) and a unique trailer (kept) in BOTH engines
    "dedup_paragraph_prune" -> ((s, dir) => {
      val aug = concat(substring(col("text"), 1, 60),
        lit("\n\nsubscribe to our newsletter today"),
        lit("\n\nvisit doc number "), col("doc_id").cast(StringType))
      Dedup.paragraphPrune(
          table(s, dir, "documents").withColumn("aug", aug),
          col("aug"), col("doc_id"), minRepeats = 10)
        .orderBy("doc_id")
    }),

    // DATA MIX: deterministic token-budget composition per source
    // (graft.ops.Mix) — md5(id·seed) shuffle order is portable across
    // engines, so the kept set is identical in the DuckDB oracle
    "mix_token_budget" -> ((s, dir) =>
      Mix.build(table(s, dir, "documents"), col("text"), col("doc_id"),
          col("source"), defaultBudget = 700L,
          budgets = Map("src0" -> 200L, "src1" -> 1200L), seed = 7L)
        .orderBy("source", "cum_tokens", "doc_id")),

    // temperature-scaled mixture: per-source weights n^alpha/sum and
    // the budgets they allocate (Mix.temperatureBudgets), plus the
    // full selection under those budgets (Mix.buildTemperature)
    "mix_temperature_weights" -> ((s, dir) =>
      Mix.temperatureBudgets(table(s, dir, "documents"), col("text"),
          col("source"), totalBudget = 12000L, alpha = 0.5)
        .presentSorted("source")),

    "mix_temperature_build" -> ((s, dir) =>
      Mix.buildTemperature(table(s, dir, "documents"), col("text"),
          col("doc_id"), col("source"), totalBudget = 12000L, alpha = 0.5,
          seed = 7L)
        .orderBy("source", "cum_tokens", "doc_id")),

    // EPOCH UPSAMPLING: the multiplicity half of the data mix — per
    // source, ⌈f⌉ deterministic epochs with the fractional last epoch
    // hash-selected (graft.ops.Mix.upsample); md5 hex-threshold
    // selection is portable verbatim to the oracle. Explode-only plan
    "mix_epoch_upsample" -> ((s, dir) =>
      Mix.upsample(table(s, dir, "documents"), col("doc_id"), col("source"),
          defaultFactor = 1.25,
          factors = Map("src0" -> 2.5, "src1" -> 1.0), seed = 0L)
        .select(col("doc_id"), col("source"), col("epoch").cast(LongType).as("epoch"))
        .orderBy("doc_id", "epoch")),

    // VOCABULARY INDUCTION: corpus top-200 tokens by document
    // frequency (graft.ops.TextOps.topVocabulary) — explode + two
    // hash aggs + TakeOrderedAndProject; total order (df, tf, token)
    // makes the cut engine-independent
    "vocab_top200" -> ((s, dir) =>
      TextOps.topVocabulary(table(s, dir, "documents"), col("text"),
          col("doc_id"), k = 200)
        .presentSorted(col("df").desc, col("tf").desc, col("token"))),

    // OOV RATE: per-source fraction of token occurrences outside the
    // stored top-20 vocabulary (graft.ops.TextOps.oovRate) — the
    // persisted-vocab index (memoized write-once) broadcast-joins the
    // exploded token stream; the tokenizer-health metric per source
    "vocab_oov_by_source" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("vocab20", dir)(p =>
        TextOps.buildVocabIndex(docs, col("text"), col("doc_id"), k = 20, p))
      TextOps.oovRate(s, store, docs, col("text"), col("source"))
        .select(col("group").as("source"), col("n_tokens"), col("n_oov"),
          col("oov_rate"))
        .presentSorted("source")
    }),

    // language-ID evaluation against the corpus' labeled lang column:
    // the confusion table (label × prediction × count) that calibrates
    // the n-gram heuristic before it gates a curation funnel
    "text_langid_confusion" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("lang"), TextOps.langIdFused(col("text")).as("pred_lang"))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .presentSorted("lang", "pred_lang")),

    // domain-drift audit: KL(source ‖ corpus) over the stored top-20
    // vocabulary with add-k smoothing (TextOps.klBySource)
    "vocab_kl_by_source" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("vocab20", dir)(p =>
        TextOps.buildVocabIndex(docs, col("text"), col("doc_id"), k = 20, p))
      TextOps.klBySource(s, store, docs, col("text"), col("source"))
        .select(col("group").as("source"), col("n_tokens"), col("kl"))
        .presentSorted("source")
    }),

    // TABLE PROFILE: schema-driven per-column stats in one pass
    // (graft.ops.Profile) — exact distincts here so the DuckDB oracle
    // hash-matches; production default is HLL
    "profile_orders" -> ((s, dir) =>
      Profile.table(table(s, dir, "orders"), exactDistinct = true)),

    // EQUI-DEPTH HISTOGRAM: exact ntile cut on (value, tiebreak) —
    // the audit path; the approx_percentile scale path is spec-tested
    // (ProfileSpec) since sketch bins aren't engine-portable
    "profile_hist_totalprice" -> ((s, dir) =>
      Profile.histogram(table(s, dir, "orders"), col("o_totalprice"),
        col("o_orderkey"), buckets = 8, exact = true)),

    // HEAVY HITTERS: exact per-column top-k values by frequency via
    // the salted two-stage funnel; (n desc, v asc) total order makes
    // the cut engine-independent
    "profile_heavy_hitters" -> ((s, dir) =>
      Profile.heavyHitters(table(s, dir, "documents"),
        Seq("source", "lang", "n_chars"), k = 5)),

    // PII SCRUB: detect + redact emails/IPv4/SSNs
    // (graft.ops.TextOps.piiCounts/redactPii, portable-regex-subset
    // patterns). The corpus is synthetic, so the fixture PII is
    // injected deterministically per doc_id in BOTH engines — the
    // oracle proves the detection/redaction mechanics cross-engine
    // the compliance slice: PII incidence per source over the same
    // planted fixture — per-source doc counts, affected-doc counts,
    // total hits per class, and the affected rate; the table a
    // release review reads before anything ships
    "text_pii_by_source" -> ((s, dir) => {
      val aug = concat(
        substring(col("text"), 1, 40),
        when(col("doc_id") % 3 > 0,
          concat(lit(" u"), col("doc_id").cast(StringType), lit("@ex.org")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 > 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast(StringType),
            lit(".9")))
          .otherwise(lit("")),
        lit(" ref 123-45-6789"))
      table(s, dir, "documents")
        .select(col("source") +: TextOps.piiCounts(aug): _*)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("email_hits"),
          sum(col("n_ipv4")).as("ipv4_hits"),
          sum(col("n_ssn")).as("ssn_hits"),
          sum(when(col("n_email") + col("n_ipv4") + col("n_ssn") > 0, 1L)
            .otherwise(0L)).as("n_affected"))
        .select(col("source"), col("n_docs"), col("email_hits"),
          col("ipv4_hits"), col("ssn_hits"), col("n_affected"),
          (floor(col("n_affected").cast("double") /
            col("n_docs").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("affected_rate"))
        .presentSorted("source")
    }),

    "text_pii_redact" -> ((s, dir) => {
      val aug = concat(
        substring(col("text"), 1, 40),
        when(col("doc_id") % 3 > 0,
          concat(lit(" u"), col("doc_id").cast(StringType), lit("@ex.org")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 > 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast(StringType),
            lit(".9")))
          .otherwise(lit("")),
        lit(" ref 123-45-6789"))
      table(s, dir, "documents")
        .select(col("doc_id") +: TextOps.piiCounts(aug) :+
          TextOps.redactPii(aug).as("redacted"): _*)
        .orderBy("doc_id")
    }),

    // CURATION LEDGER: the composed LLM-data funnel (quality floor →
    // repetition ceiling → language allowlist → exact-dedup
    // keep-first) with first-drop-wins stage attribution
    // (graft.ops.Curate). Thresholds compare rounded scores, so the
    // verdicts are exactly reproducible in the DuckDB oracle
    "curate_ledger" -> ((s, dir) =>
      Curate.ledger(table(s, dir, "documents"), col("text"), col("doc_id"))
        .select("doc_id", "quality", "pred_lang", "top2", "stage", "keep")
        .presentSorted("doc_id")),

    // the funnel with the CCNet-style perplexity ceiling as its LAST
    // stage (self-fit bigram NLL over the dedup survivors) — the LM
    // arithmetic composes into the same oracle, so the full
    // five-stage ledger stays hash-verified end-to-end
    "curate_ledger_lm" -> ((s, dir) =>
      Curate.ledger(table(s, dir, "documents"), col("text"), col("doc_id"),
          Curate.Config(maxNll = Some(3.45)))
        .select("doc_id", "quality", "pred_lang", "top2", "stage", "keep")
        .presentSorted("doc_id")),

    // KEYWORDS: top-5 tf-idf terms per document (Search.tfidfKeywords)
    // — integer tf/df/N make scores bit-identical across engines, so
    // the rank cut is exact. DuckDB-oracled with the same arithmetic
    "search_tfidf_keywords" -> ((s, dir) =>
      Search.tfidfKeywords(table(s, dir, "documents"), col("text"),
          col("doc_id"), k = 5)
        .orderBy("doc_id", "rk")),

    // QUALITY/REPETITION: the Gopher repetition filter family (dup
    // lines, dup line chars, top 2-gram mass, dup 5-gram mass) from
    // one fused kernel pass — map-only, no shuffle
    // (graft.ops.TextOps.repetitionColumns). DuckDB-oracled with the
    // identical line/gram counting in SQL
    "quality_repetition" -> ((s, dir) => {
      val r = graft.functions.GraftFunctions.repetitionStats(col("text"))
      // null text: the oracle's inner join drops such docs; match it
      // explicitly rather than emitting a four-null row
      table(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"),
          round(r.getField("dup_line_frac"), 6).as("dup_line_frac"),
          round(r.getField("dup_line_char_frac"), 6).as("dup_line_char_frac"),
          round(r.getField("top2_char_frac"), 6).as("top2_char_frac"),
          round(r.getField("dup5_char_frac"), 6).as("dup5_char_frac"))
        .orderBy("doc_id")
    }),
  )

  // =====================================================================
  // beyond-reference: training-data pipeline operators
  // =====================================================================

  private val pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup: one shuffle on content hash
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(table(s, dir, "documents"), col("text"), col("doc_id"))
        .orderBy("content_hash")),

    // MinHash+LSH near-dup pairs (engine-specific hashes → rows-only;
    // rows-only checks are order-free, so no global sort of the pair
    // set — at scale that is a whole wasted stage over billions of rows)
    "dedup_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashLSH(table(s, dir, "documents"), col("text"), col("doc_id"),
        shingleK = 2, numHashes = 16, bands = 8, jaccardThreshold = 0.3,
        materialize = eagerPairs)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))),

    // INCREMENTAL near-dup against the persisted minhash index: store
    // built once over doc_id >= 50 (memoized write-once job), the
    // "crawl increment" (doc_id < 50) is hashed and joined against the
    // stored signatures — no stored text re-read. Rows-only (engine
    // hashing); indexed==inline parity is MinhashIndexSpec-proven
    "dedup_minhash_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("minhash", dir)(p =>
        Dedup.buildMinhashIndex(docs.filter(col("doc_id") >= 50),
          col("text"), col("doc_id"), p,
          shingleK = 2, numHashes = 16, bands = 8))
      Dedup.nearDupAgainstIndex(s, store, docs.filter(col("doc_id") < 50),
        col("text"), col("doc_id"), jaccardThreshold = 0.3,
        materialize = eagerPairs)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // SimHash fingerprint near-dup pairs. maxHamming=7 blocks via
    // multi-index hashing (4×16-bit chunks, per-chunk radius 1):
    // candidate generation is EXACT, verified by DedupSpec against
    // brute force. (rows-only, order-free)
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(table(s, dir, "documents"), col("text"), col("doc_id"),
        maxHamming = 7, materialize = eagerPairs)),

    // char-3-gram Jaccard near-dup pairs at the standard 0.8 threshold
    // (this corpus's BACKGROUND inter-doc similarity is ~0.45-0.6, so a
    // 0.5 cutoff would make the true answer set itself quadratic; the
    // 0.5-threshold arithmetic is oracled by dedup_ngram_exact_sample).
    // (rows-only; recall vs exact measured in DedupSpec)
    "dedup_ngram_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(table(s, dir, "documents"), col("text"), col("doc_id"),
        n = 3, threshold = 0.8, materialize = eagerPairs)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))),

    // document-shape heuristics: Flesch-style readability (vowel-
    // group syllables) + code-ness (symbol density, keyword rate) —
    // the routing signals that split code from prose and gate
    // readability slices before language-specific stages
    "text_doc_heuristics" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.sentenceCount(col("text")).cast("long").as("n_sent"),
          TextOps.syllableEstimate(col("text")).cast("long").as("n_syll"),
          (floor(TextOps.fleschScore(col("text")) * lit(1e4) + lit(0.5)) /
            lit(1e4)).as("flesch"),
          TextOps.codeSymbolCount(col("text")).cast("long").as("n_sym"),
          TextOps.codeKeywordCount(col("text")).cast("long").as("n_kw"))
        .orderBy("doc_id")),

    // the datasheet's per-source slice: exact-dup rate by source —
    // dedup is rarely uniform (mirrors and content farms concentrate
    // in specific sources), and this is the table that shows where
    "dedup_rate_by_source" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
      docs.select(col("source"), col("doc_id"),
          md5(col("text").cast("binary")).as("__h"))
        .withColumn("__rn", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          (floor((col("n_docs") - col("n_kept")).cast("double") /
            col("n_docs").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("dup_rate"))
        .presentSorted("source")
    }),

    // effective dataset size: raw token mass vs tokens surviving
    // keep-first exact dedup — the number training-budget planning
    // actually needs (raw counts overstate a duplicated corpus)
    "corpus_effective_tokens" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
      docs.select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("__nt"),
          md5(col("text").cast("binary")).as("__h"))
        .withColumn("__rn", row_number().over(w))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_unique_docs"),
          sum(col("__nt")).as("raw_tokens"),
          sum(when(col("__rn") === 1, col("__nt")).otherwise(0L))
            .as("effective_tokens"))
        .withColumn("dup_token_mass",
          col("raw_tokens") - col("effective_tokens"))
    }),

    // hard per-source cap (the per-domain crawl cap): keep at most 5
    // docs per source, chosen by the portable md5 order so the cut is
    // reproducible across engines, retries, and cluster sizes
    "sample_cap_per_source" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val w = Window.partitionBy(col("source"))
        .orderBy(Mix.ordHash(col("doc_id"), 42L), col("doc_id"))
      docs.select(col("source"), col("doc_id"))
        .withColumn("pick_rank", row_number().over(w).cast("long"))
        .filter(col("pick_rank") <= 5)
        .orderBy("source", "pick_rank")
    }),

    // the one-row dataset datasheet a corpus release ships with:
    // volume, vocabulary-of-languages/sources, exact-dup mass, short-
    // doc mass, mean length — one aggregation pass, all-integer
    // internals, the mean presented on the luck-free floor grid
    "corpus_datasheet" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      docs.agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          (count(lit(1)) -
            countDistinct(md5(col("text").cast("binary"))))
            .as("n_exact_dups"),
          sum(when(length(col("text")) < 100, 1L).otherwise(0L))
            .as("n_short"))
        .withColumn("mean_tokens",
          floor(col("n_tokens").cast("double") / col("n_docs").cast("double")
            * lit(1e6) + lit(0.5)) / lit(1e6))
    }),

    // MMR diverse top-5 (Carbonell & Goldstein): most representative
    // AND mutually different — plain top-k by centroid relevance
    // returns k near-copies of the best item. Every cosine rounds
    // before comparison with id tiebreaks, so the greedy argmax
    // chain is engine-portable and fully oracled (5 unrolled steps)
    "ann_mmr_select" -> ((s, dir) =>
      Similarity.mmrSelect(table(s, dir, "embeddings"), col("vec_id"),
        col("embedding"), k = 5)),

    // cross-modal consistency audit: exact text near-dup pairs
    // (shingle Jaccard >= 0.5, bounded sample) joined to the
    // embedding cosine of the SAME ids — on real data the
    // inconsistent rows (duplicate text, distant vectors) are the
    // embedding-pipeline bugs; text and vector sides share nothing
    // but the id, so this is the integration check
    "audit_dup_text_embedding" -> ((s, dir) => {
      val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      val emb = table(s, dir, "embeddings")
      val pairs = Dedup.shingleJaccardExact(docs, col("text"),
        col("doc_id"), shingleK = 2, threshold = 0.5)
      val cosR = round(Similarity.cosine(col("__va"), col("__vb")), 4)
      pairs
        .join(emb.select(col("vec_id").as("id_a"),
          col("embedding").as("__va")), Seq("id_a"))
        .join(emb.select(col("vec_id").as("id_b"),
          col("embedding").as("__vb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard"),
          cosR.as("cos"), (cosR >= 0.35).as("consistent"))
        .orderBy("id_a", "id_b")
    }),

    // sorted-neighborhood (merge/purge) near-dup: the SORT-based
    // blocking family — global rank by a 24-char key prefix (two-
    // phase bucket rank, no single-task sort), verify only pairs
    // within rank-window 10, exact shingle-Jaccard kernel. Fully
    // oracled: rank and verify are both engine-portable
    "dedup_snm_pairs" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(table(s, dir, "documents"),
          col("text"), col("doc_id"),
          sortKeyLen = 24, window = 10, shingleK = 2, threshold = 0.3)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // INCREMENTAL char-n-gram near-dup: the same persisted-signature
    // store as dedup_minhash_indexed in "chargram" mode (the steep
    // 128×16 S-curve funnel) — increment joins stored signatures, no
    // stored-text re-read (rows-only; indexed==inline proven in
    // MinhashIndexSpec)
    "dedup_ngram_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("ngramidx", dir)(p =>
        Dedup.buildMinhashIndex(docs.filter(col("doc_id") >= 50),
          col("text"), col("doc_id"), p,
          shingleK = 3, numHashes = 128, bands = 16, mode = "chargram"))
      Dedup.nearDupAgainstIndex(s, store, docs.filter(col("doc_id") < 50),
        col("text"), col("doc_id"), jaccardThreshold = 0.8,
        materialize = eagerPairs)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // embedding-cosine near-dup pairs, hyperplane-LSH blocked (rows-only;
    // recall on planted near-dups measured in DedupSpec — the synthetic
    // table's threshold-0.45 tail sits near its background, where no
    // hyperplane scheme is selective, so blocked recall here is S-curve
    // bound; the cosine arithmetic is oracled by dedup_embed_exact_sample)
    "dedup_embed_pairs" -> ((s, dir) =>
      Similarity.cosinePairs(table(s, dir, "embeddings"), col("vec_id"), col("embedding"),
        threshold = 0.45, planes = 8, tables = 16)),

    // INCREMENTAL cosine near-dup: vector store built once (memoized;
    // 16+4·dims bytes/vec), the increment re-buckets under the
    // meta-pinned hyperplanes and joins the store — no stored-vector
    // recompute beyond one fused kernel pass (rows-only;
    // indexed==inline proven in MinhashIndexSpec)
    "dedup_embed_indexed" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val store = memoStore("cosidx", dir)(p =>
        Similarity.buildCosineIndex(emb.filter(col("vec_id") >= 50),
          col("vec_id"), col("embedding"), p, planes = 8, tables = 16))
      Similarity.cosinePairsAgainstIndex(s, store,
        emb.filter(col("vec_id") < 50), col("vec_id"), col("embedding"),
        threshold = 0.45, materialize = eagerPairs)
    }),

    // exact all-pairs cosine over a bounded sample — DuckDB-oracled
    "dedup_embed_exact_sample" -> ((s, dir) =>
      Similarity.cosinePairsExact(
        table(s, dir, "embeddings").filter(col("vec_id") < 300),
        col("vec_id"), col("embedding"), threshold = 0.4)
        .orderBy("id_a", "id_b")),

    // near-dup clustering: connected components (min-label propagation)
    // over the exact sample pair set — the keep/drop assignment stage of
    // a dedup pipeline; DuckDB-oracled via a recursive-CTE closure
    "dedup_cluster_exact_sample" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.ngramJaccardExact(
          table(s, dir, "documents").filter(col("doc_id") < 300),
          col("text"), col("doc_id"), n = 3, threshold = 0.5))
        .orderBy("id")),

    // duplicate-cluster census over the same exact sample: how much
    // of the corpus sits in clusters of which size (singletons
    // included) — the number a dedup run is judged by before anyone
    // looks at pairs. Oracled through the same recursive closure
    "dedup_cluster_census" -> ((s, dir) => {
      val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      val labels = Dedup.connectedComponents(
        Dedup.ngramJaccardExact(docs, col("text"), col("doc_id"),
          n = 3, threshold = 0.5))
      docs.select(col("doc_id").cast("long").as("id"))
        .join(labels, Seq("id"), "left")
        .select(coalesce(col("cluster"), col("id")).as("cluster"))
        .groupBy("cluster").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .presentSorted("sz")
    }),

    // leakage-safe split, oracled end-to-end over the bounded sample:
    // exact pairs -> recursive closure -> portable md5 split of the
    // cluster representative — the oracle twin of split_leakfree
    "split_leakfree_exact_sample" -> ((s, dir) => {
      val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      Curate.leakSafeSplitFromPairs(docs, col("doc_id"),
        Dedup.ngramJaccardExact(docs, col("text"), col("doc_id"),
          n = 3, threshold = 0.5),
        evalFrac = 0.2, seed = 7)
        .orderBy("doc_id")
    }),

    // production shape: minhash-funnel near-dup clusters built ONCE
    // into a persisted label store (memoized write-once batch job —
    // at 100 TB clustering is a day-scale job; split derivation must
    // not repeat it per variant), the split a cheap join against it.
    // Same labels ⇒ byte-identical output to the inline funnel
    // (CurateSpec store==inline identity). (rows-only;
    // leakage-freedom and fraction measured in CurateSpec)
    "split_leakfree" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("splitcc", dir)(p =>
        Curate.buildClusterStore(docs, col("text"), col("doc_id"), p))
      Curate.leakSafeSplitFromLabels(docs, col("doc_id"),
          s.read.parquet(store), evalFrac = 0.2, seed = 7)
        .orderBy("doc_id")
    }),

    // cluster-MASS-aware split: greedy fill in hash order until the
    // document (not cluster) eval target is met — oracled end-to-end
    // against a single global window (the distributed two-phase
    // prefix sum must equal it exactly)
    "split_balanced_exact_sample" -> ((s, dir) => {
      val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      Curate.leakSafeSplitBalancedFromPairs(docs, col("doc_id"),
        Dedup.ngramJaccardExact(docs, col("text"), col("doc_id"),
          n = 3, threshold = 0.5),
        evalFrac = 0.2, seed = 7)
        .orderBy("doc_id")
    }),

    // full-corpus balanced split over the SAME persisted cluster
    // store as split_leakfree — the two splits share one funnel+CC
    // batch artifact instead of re-running it (rows-only;
    // realized-fraction tightness vs the plain split measured in
    // CurateSpec)
    "split_balanced" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("splitcc", dir)(p =>
        Curate.buildClusterStore(docs, col("text"), col("doc_id"), p))
      Curate.leakSafeSplitBalancedFromLabels(docs, col("doc_id"),
          s.read.parquet(store), evalFrac = 0.2, seed = 7)
        .orderBy("doc_id")
    }),

    // brute-force cosine top-k (the exact baseline)
    "ann_brute_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // int8-quantized brute-force cosine top-k over a STORED
    // ARRAY<TINYINT> corpus — the memory-bandwidth scale path (the scan
    // reads a quarter of the float corpus's bytes and scores bytes
    // natively, no cast back to float; quantization cosine error bound
    // + recall vs brute asserted in DedupSpec). The quantized corpus is
    // built once per JVM (write-once job), queries only scan it.
    // (rows-only)
    "ann_q8_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val store = memoStore("q8", dir)(p => Similarity.buildQ8Corpus(emb, p))
      Similarity.q8TopKStored(s, store, emb.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // LSH-bucketed ANN, 12 hash tables of 4 hyperplanes with
    // single-bit-flip multi-probe on the (tiny) query side — recall
    // ≥ 0.9 @10 vs brute force, measured in DedupSpec; rows-only —
    // bucket hash is engine-local
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 10, planes = 4,
        tables = 12, probeBits = 1)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // IVF ANN: k-means coarse quantizer (nlist lists), each query probes
    // its nprobe nearest lists — the FAISS-style scale path (recall
    // measured vs brute force in DedupSpec; rows-only — list ids are
    // engine-local k-means state)
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10, nlist = 16, nprobe = 6)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // IVF ANN over a PERSISTED index: the KMeans fit + full-corpus
    // assignment run once per JVM (a write-once batch job, like every
    // store build); the query reads the tiny centroid table and scans
    // ONLY its nprobe probed list partitions (partition-pruned, proven
    // in DedupSpec). Same seed/fit-set as ann_ivf_topk ⇒ identical
    // rows — the cross-check the driver's rows-only gate records.
    // (rows-only)
    "ann_ivf_indexed" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val store = memoStore("ivf", dir)(p =>
        Similarity.buildIvfIndex(emb, p, nlist = 16))
      Similarity.ivfTopKIndexed(s, store, emb.filter(col("vec_id") < 5),
        k = 10, nprobe = 6)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // ANN over the PCA-16 reduction read from the STORED eigenbasis
    // (fitFromStore over the memoized moment store — the incremental
    // fit the whiten_indexed registration uses): project corpus +
    // queries through the fused kernel, brute cosine top-k in the
    // 16-dim space. The scale trade: a quarter of the scan bytes and
    // dot-product flops per candidate. Rows-only (the basis is
    // engine-local); the recall-vs-64-dim-truth contract carries the
    // ann_pca16_indexed METRICS floor — spectrum-bound by design on
    // this near-isotropic corpus, like ann_pq_adc's quantization bound
    "ann_pca16_indexed" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val store = memoStore("pcamom", dir)(p =>
        Pca.buildMomentStore(emb, col("embedding"), dims = 64, s"$p/m"))
      val m = Pca.fitFromStore(s, s"$store/m", dims = 64, k = 16)
      val proj = Pca.project(emb, col("vec_id"), col("embedding"), m)
        .select(col("vec_id"), col("projected").cast("array<float>").as("embedding"))
      Similarity.bruteForceTopK(proj, proj.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // doc-in-doc CONTAINMENT pairs via winnowing-fingerprint candidates
    // + exact k-gram verification — the duplication mode Jaccard
    // funnels are structurally blind to (rows-only: winnowed candidate
    // generation is engine-local; the containment arithmetic is
    // DuckDB-oracled by dedup_contain_exact_sample; the
    // Jaccard-blind/winnow-guarantee properties are DedupSpec-tested)
    "dedup_contain_pairs" -> ((s, dir) =>
      // bucketCap 200: this corpus has template boilerplate whose
      // fingerprints land in up-to-3280-doc buckets — zero containment
      // signal (a fingerprint shared by most docs is a stopword), and
      // uncapped they mint 15.6M candidate rows at sf0.1
      Dedup.containmentPairs(table(s, dir, "documents"), col("text"), col("doc_id"),
        k = 8, w = 24, threshold = 0.5, bucketCap = 200, materialize = eagerPairs)
        .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))),

    // INCREMENTAL containment: fingerprint+gram store built once
    // (memoized), the increment's winnow fingerprints join stored
    // ones under the same boilerplate cap — stored text never
    // re-read (rows-only; indexed==inline proven in MinhashIndexSpec)
    "dedup_contain_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("ctidx", dir)(p =>
        Dedup.buildContainmentIndex(docs.filter(col("doc_id") >= 50),
          col("text"), col("doc_id"), p))
      Dedup.containmentAgainstIndex(s, store, docs.filter(col("doc_id") < 50),
        col("text"), col("doc_id"), threshold = 0.5, bucketCap = 200,
        materialize = eagerPairs)
        .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))
    }),

    // exact all-pairs char-8-gram containment over a bounded sample —
    // the DuckDB-oracled twin of dedup_contain_pairs' arithmetic
    "dedup_contain_exact_sample" -> ((s, dir) =>
      Dedup.containmentExact(
        table(s, dir, "documents").filter(col("doc_id") < 300),
        col("text"), col("doc_id"), n = 8, threshold = 0.4)
        .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))
        .orderBy("id_a", "id_b")),

    // exact all-pairs char-3-gram Jaccard over a bounded deterministic
    // sample — the DuckDB-oracled twin of dedup_ngram_pairs' arithmetic
    "dedup_ngram_exact_sample" -> ((s, dir) =>
      Dedup.ngramJaccardExact(
        table(s, dir, "documents").filter(col("doc_id") < 300),
        col("text"), col("doc_id"), n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // exact all-pairs word-2-shingle Jaccard over the same sample — the
    // DuckDB-oracled twin of dedup_minhash_pairs' verification stage
    "dedup_shingle_exact_sample" -> ((s, dir) =>
      Dedup.shingleJaccardExact(
        table(s, dir, "documents").filter(col("doc_id") < 300),
        col("text"), col("doc_id"), shingleK = 2, threshold = 0.3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // INCREMENTAL pair counts: base corpus (doc_id>=250) built once
    // into the batch-partitioned store, the crawl increment (<250)
    // appended as its own batch — window pairs never cross documents,
    // so counts are exactly additive and the indexed top-50 equals
    // the inline count over the union (fully oracled; replays
    // overwrite their batch, never double-add)
    "colloc_counts_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("collocCounts", dir) { p =>
        Colloc.buildCountsStore(docs.filter(col("doc_id") >= 250),
          col("text"), window = 3, p)
        Colloc.appendCountsBatch(docs.filter(col("doc_id") < 250),
          col("text"), window = 3, p, batchId = 1L)
      }
      Colloc.readCounts(s, store)
        .orderBy(col("pair_n").desc, col("tok_a"), col("tok_b"))
        .limit(50)
    }),

    // top collocations by LIFT (= e^PMI, but a pure ratio of integer
    // counts → bit-exact cross-engine where PMI's log would pull in
    // libm): window-3 pairs generated inside each doc's token array,
    // two count shuffles, broadcast totals, deterministic tiebreak
    "colloc_top_lift" -> ((s, dir) =>
      Colloc.topCollocations(table(s, dir, "documents"), col("text"),
          window = 3, minCount = 5, k = 100)
        .select(col("tok_a"), col("tok_b"), col("pair_n"),
          (floor(col("lift") * lit(1e6) + lit(0.5)) / lit(1e6)).as("lift"))),

    // multi-pattern blocklist screen: one Aho-Corasick O(len) pass
    // per doc for the whole pattern set (per-pattern contains() is
    // O(len×patterns) passes — the naive blocklist scale trap).
    // Oracled: AC totals equal per-pattern regex occurrence counts
    // for non-self-overlapping patterns
    "text_blocklist_screen" -> ((s, dir) =>
      table(s, dir, "documents")
        .select((col("doc_id") +: TextOps.blocklistColumns(col("text"),
          Seq("slow", "hash", "the part", "query"))): _*)
        .orderBy("doc_id")),

    // compression-ratio quality signal (zlib kernel in the scan):
    // the redundancy-structure filter counted n-gram classes miss.
    // Deflate bytes are the JVM zlib's → rows-only (like minhash
    // signatures); structural semantics spec'd in TextOpsSpec
    "text_compression_signal" -> ((s, dir) =>
      table(s, dir, "documents")
        .select((col("doc_id") +:
          TextOps.compressionColumns(col("text"))): _*)
        .orderBy("doc_id")),

    // text stats: token counts, ratios, fingerprint
    "text_stats" -> ((s, dir) =>
      // one fused kernel pass for the six counters (codegen CSE
      // evaluates the struct once per row), not six regex passes
      table(s, dir, "documents")
        .select((col("doc_id") +: TextOps.statsColumns(col("text"))): _*)
        .orderBy("doc_id")),

    // token-aligned sliding-window chunking (context-window shaping);
    // chunk content rides as md5 so the result stays narrow
    "text_chunk_tokens" -> ((s, dir) =>
      TextOps.chunkTokens(table(s, dir, "documents"), col("text"),
          col("doc_id"), chunkTokens = 64, overlapTokens = 16)
        .orderBy("doc_id", "chunk_id")),

    // rolling-hash document fingerprint (codepoint polynomial mod 1e9+7
    // — engine-independent, custom codegen expression)
    "text_rolling_fp" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        graft.functions.GraftFunctions.rollingHash(col("text")).as("fp"))
        .orderBy("doc_id")),

    // language-ID heuristic + composite quality score (fused kernels:
    // one marker-count tokenization + one counts pass per row)
    "text_langid_quality" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextOps.langIdFused(col("text")).as("pred_lang"),
        TextOps.qualityScoreFused(col("text")).as("quality"))
        .orderBy("doc_id")),

    // adaptive per-source quality gate: each source cut at its OWN
    // quality percentile (fixed global thresholds over-prune
    // low-register sources); per-source audit of cutoff + survival
    "quality_adaptive_by_source" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val scored = docs.select(col("source"),
        TextOps.qualityScore(col("text")).as("quality"))
      val cuts = Curate.adaptiveQualityCutoffs(docs, col("text"),
        col("source"), pct = 0.1)
      scored.join(broadcast(cuts), Seq("source"))
        .groupBy(col("source"), col("cutoff"))
        .agg(sum(when(col("quality") >= col("cutoff"), 1L).otherwise(0L))
          .as("kept"),
          count(lit(1)).as("total"))
        .presentSorted("source")
    }),

    // the surviving documents themselves (broadcast cutoff join, no
    // corpus shuffle)
    "quality_adaptive_kept" -> ((s, dir) =>
      Curate.adaptiveQualityKept(table(s, dir, "documents"), col("text"),
        col("doc_id"), col("source"), pct = 0.1)
        .orderBy("doc_id")),

    // exact-substring dedup primitive (Lee et al. 2022): maximal
    // cross-document duplicated token spans (>= 10 tokens), keep-first
    // ownership — the repeats document-level near-dup funnels miss
    "span_dup_spans" -> ((s, dir) =>
      Spans.duplicatedSpans(table(s, dir, "documents"), col("text"),
        col("doc_id"), n = 10)
        .orderBy("doc_id", "span_start")),

    // the scrubbed corpus: duplicated spans deleted everywhere but
    // their first-owner document
    "span_scrub_clean" -> ((s, dir) =>
      Spans.removeDuplicatedSpans(table(s, dir, "documents"), col("text"),
        col("doc_id"), n = 10)
        .orderBy("doc_id")),

    // link-graph centrality over the corpus: 3 damped PageRank
    // iterations with exact dangling redistribution, on the portable
    // md5-derived link graph (the crawl-frontier / corpus-inclusion
    // quality prior). Ranks ride Graph's 2^-30 dyadic grid, so the
    // bits are engine-identical and the 6-digit presentation floor
    // has NO boundary luck (ranks are rationals that structurally
    // land on decimal half-boundaries — round() would flip rows)
    "graph_pagerank" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val n = docs.count()
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = n)
      Graph.pageRank(edges, docs, col("doc_id"), iters = 3)
        .select(col("node"),
          (floor(col("rank") * lit(n.toDouble) * lit(1e6) + lit(0.5)) /
            lit(1e6)).as("rank_norm"))
        .orderBy("node")
    }),

    // in/out-degree audit of the same graph (zero-filled from the
    // node table) — the pre-flight skew profile a 100 TB PageRank
    // run reads before picking AQE/salting knobs
    "graph_degrees" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = docs.count())
      Graph.degrees(edges, docs, col("doc_id")).orderBy("node")
    }),

    // edge reciprocity: the share of directed links whose reverse
    // also exists — organic link neighborhoods reciprocate, link
    // farms rarely do; one self-semi-join on the flipped key
    "graph_reciprocity" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = docs.count())
        .localCheckpoint(true) // both sides of the semi-join read it
      val recip = edges.join(
        edges.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(recip.agg(count(lit(1)).as("n_reciprocal")))
        .select(col("n_edges"), col("n_reciprocal"),
          (floor(col("n_reciprocal").cast("double") /
            col("n_edges").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("reciprocity"))
    }),

    // in-degree distribution of the link graph: the histogram whose
    // tail shape (power-law vs Poisson) decides whether hub salting
    // is worth configuring before a big graph job
    "graph_degree_hist" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = docs.count())
      Graph.degrees(edges, docs, col("doc_id"))
        .groupBy(col("in_deg")).agg(count(lit(1)).as("n_nodes"))
        .presentSorted("in_deg")
    }),

    // k-core of the link graph (k=4, iterative peel to fixpoint —
    // mean degree is ~6, so the peel genuinely cascades): the link-
    // spam periphery filter — sparse tendrils peel away,
    // organically-linked cores survive. Non-monotone peeling has no
    // SQL-recursive twin → rows-only; semantics spec-pinned on
    // closed-form fixtures (GraphSpec)
    "graph_kcore" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = docs.count())
      Graph.kCore(edges, k = 4).orderBy("node")
    }),

    // full core decomposition of a 200-node heavy-tailed sample
    // graph (powerLawGraph: md5-portable preferential attachment —
    // the modulus graph's cores collapse to one shell, this one
    // spans 1..5): ONE H-index fixpoint yields every node's core
    // number, vs the oracle's per-k unrolled peels (depth chosen
    // past each k's measured fixpoint; extra rounds are idempotent).
    // This is the driver-verified twin of the rows-only graph_kcore
    "graph_kcore_exact_sample" -> ((s, dir) => {
      val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      val edges = Graph.powerLawGraph(docs, col("doc_id"))
      val cores = Graph.coreNumbers(edges)
      docs.select(col("doc_id").cast("long").as("node"))
        .join(cores, Seq("node"), "left")
        .select(col("node"), coalesce(col("core"), lit(0L)).as("core"))
        .orderBy("node")
    }),

    // cross-family composition: per-source top-3 documents by
    // PageRank — the "best of each domain" cut a curation pass
    // exports; the dyadic-grid ranks make the window cut itself
    // oracle-exact (ties broken by node)
    "graph_top_ranked_by_source" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val n = docs.count()
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = n)
      val ranks = Graph.pageRank(edges, docs, col("doc_id"), iters = 3)
        .select(col("node"),
          (floor(col("rank") * lit(n.toDouble) * lit(1e6) + lit(0.5)) /
            lit(1e6)).as("rank_norm"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("rank_norm").desc, col("node"))
      docs.select(col("doc_id").cast("long").as("node"), col("source"))
        .join(ranks, Seq("node"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("source"), col("rk"), col("node"), col("rank_norm"))
        .orderBy("source", "rk")
    }),

    // weakly-connected components of the induced subgraph on nodes
    // <100 (the full random graph is one giant component — the
    // induced slice is sparse enough to have real structure) via the
    // O(log n) star contraction, convergence-asserted; singleton
    // nodes label themselves. Oracle = recursive-CTE reachability
    "graph_components" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = docs.count())
        .filter(col("src") < 100 && col("dst") < 100)
      val und = Graph.undirected(edges)
      val cc = Dedup.connectedComponentsResult(
        und.select(col("a").as("id_a"), col("b").as("id_b")),
        maxIter = 50, algorithm = "star")
      require(cc.converged, "CC must converge before labels are usable")
      docs.filter(col("doc_id") < 100)
        .select(col("doc_id").cast("long").as("node"))
        .join(cc.labels.select(col("id").as("node"),
          col("cluster").as("component")), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("component"), col("node")).as("component"))
        .orderBy("node")
    }),

    // personalized PageRank from a deterministic trusted-seed set
    // (doc_id%50==0): teleport + dangling mass restart at the seeds,
    // unreachable nodes score exactly 0 — seed-based corpus
    // expansion / trust propagation, same bit-exact grid
    "graph_ppr" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val n = docs.count()
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = n)
      val seeds = docs.filter(col("doc_id") % 50 === 0).select("doc_id")
      Graph.personalizedPageRank(edges, docs, col("doc_id"), seeds,
          iters = 3)
        .select(col("node"),
          (floor(col("rank") * lit(n.toDouble) * lit(1e6) + lit(0.5)) /
            lit(1e6)).as("rank_norm"))
        .orderBy("node")
    }),

    // per-node triangle participation + local clustering coefficient
    // via the degree-ORIENTED wedge join (√m out-degree bound: a
    // celebrity hub never enumerates its quadratic neighbor pairs) —
    // enumeration is orientation-independent, so the plain id-ordered
    // oracle matches exactly
    "graph_triangles" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = docs.count())
      Graph.triangles(edges, docs, col("doc_id"))
        .select(col("node"), col("deg"), col("tri"),
          (floor(col("clust") * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("clust"))
        .orderBy("node")
    }),

    // HITS hubs/authorities on the same link graph (2 iterations,
    // L1-normalized each half-step, same bit-exact dyadic grid) —
    // the directory-page-vs-content split PageRank's single score
    // conflates
    "graph_hits" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val n = docs.count()
      val edges = Graph.linkGraph(docs, col("doc_id"), nNodes = n)
      Graph.hits(edges, docs, col("doc_id"), iters = 2)
        .select(col("node"),
          (floor(col("hub") * lit(n.toDouble) * lit(1e6) + lit(0.5)) /
            lit(1e6)).as("hub_norm"),
          (floor(col("auth") * lit(n.toDouble) * lit(1e6) + lit(0.5)) /
            lit(1e6)).as("auth_norm"))
        .orderBy("node")
    }),

    // incremental-crawl delta: yesterday's snapshot (doc_id%13==5
    // not yet crawled; %7==0 docs carried a 40-char truncation) vs
    // today's (%17==3 dropped) — per-id added/removed/changed/
    // unchanged off one fingerprint-only full-outer join
    "snapshot_delta" -> ((s, dir) => {
      val (o, n) = snapshotPair(table(s, dir, "documents"))
      Snapshot.delta(o, n, col("doc_id"), col("text")).orderBy("id")
    }),

    // the same delta against the PERSISTED fingerprint store (built
    // once, ~24 bytes/doc): yesterday's content is never re-read —
    // and because the fingerprints are portable md5, this indexed
    // variant is FULLY oracled, same SQL as the inline twin
    "snapshot_delta_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val (o, n) = snapshotPair(docs)
      val store = memoStore("snapfp", dir)(p =>
        Snapshot.buildFingerprintStore(o, col("doc_id"), col("text"), p))
      Snapshot.deltaAgainstStore(s, store, n, col("doc_id"), col("text"))
        .orderBy("id")
    }),

    // the delta rollup an incremental pipeline alerts on
    "snapshot_delta_counts" -> ((s, dir) => {
      val (o, n) = snapshotPair(table(s, dir, "documents"))
      Snapshot.delta(o, n, col("doc_id"), col("text"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .presentSorted("status")
    }),

    // what downstream stages actually reprocess: added|changed ids
    // semi-joined back to the new snapshot (content materialized for
    // the delta only — the whole point of diffing first)
    "snapshot_reprocess_feed" -> ((s, dir) => {
      val (o, n) = snapshotPair(table(s, dir, "documents"))
      Snapshot.reprocessFeed(o, n, col("doc_id"), col("text"))
        .select(col("doc_id"), col("status"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // BPE trainer, iteration-0 statistics: weighted adjacent char-pair
    // frequencies over the distinct-word table (the corpus-scale pass
    // reduces to vocabulary-scale state) — oracled top-50
    "bpe_pair_counts" -> ((s, dir) =>
      Bpe.pairCounts(Bpe.seedSymbols(
          Bpe.wordCounts(table(s, dir, "documents"), col("text"))))
        .orderBy(col("freq").desc, col("a"), col("b")).limit(50)),

    // the learned merge table after 12 iterations (rows-only; BpeSpec
    // matches it against an independent single-node reference BPE)
    "bpe_merges" -> ((s, dir) => {
      val m = Bpe.train(table(s, dir, "documents"), col("text"),
        numMerges = 12)
      s.createDataFrame(m)
        .select(col("rank").cast("long").as("rank"), col("a"), col("b"),
          col("freq"))
        .presentSorted("rank")
    }),

    // first 5 merges, driver-oracled: the batched trainer at
    // maxBatch=1 (the strict-BPE contract, BpeSpec) vs a DuckDB
    // oracle that re-derives each round from scratch — long-format
    // symbol table, argmax pair per round (freq desc, a, b), greedy
    // non-overlapping application via run-parity position selection.
    // This pins the trainer's acceptance rule to an independent
    // engine; larger maxBatch is the documented fastBPE-style
    // order-approximation (spec-pinned, README)
    "bpe_merges_exact_sample" -> ((s, dir) => {
      val m = Bpe.trainBatched(table(s, dir, "documents"), col("text"),
        numMerges = 5, maxBatch = 1)
      s.createDataFrame(m)
        .select(col("rank").cast("long").as("rank"), col("a"), col("b"),
          col("freq"))
        .presentSorted("rank")
    }),

    // the tokenizer under the strict 5-merge table on a bounded doc
    // sample, fully DuckDB-oracled: per-word token counts fall out of
    // the training unroll's FINAL symbol table (strict training
    // application ≡ rank-order tokenization for the same merges), so
    // the oracle needs no second application pass — it counts sl5
    // rows per word and sums them over each sampled doc's words
    "bpe_token_count_exact_sample" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val merges = Bpe.trainBatched(docs, col("text"), numMerges = 5,
        maxBatch = 1).map(m => (m.a, m.b))
      docs.filter(col("doc_id") < 300).select(col("doc_id"),
        Bpe.tokenCount(col("text"), merges).cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),

    // the tokenizer those merges induce, applied back over the corpus
    // (rows-only; per-doc counts matched against the reference in
    // BpeSpec)
    "bpe_token_count" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val merges = Bpe.train(docs, col("text"), numMerges = 12)
        .map(m => (m.a, m.b))
      docs.select(col("doc_id"),
        Bpe.tokenCount(col("text"), merges).cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),

    // the tokenizer against the PERSISTED merge store (fit once on
    // the corpus, stored as parquet + commit marker; the increment
    // read path loads the ~KB merge table, no training jobs) — same
    // unrolled-CTE truth as bpe_token_count_exact_sample, so the
    // store round-trip is hash-oracled end to end
    "bpe_token_count_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("bpestore", dir)(p =>
        Bpe.fitToStore(docs, col("text"), numMerges = 5, p, maxBatch = 1))
      docs.filter(col("doc_id") < 300).select(col("doc_id"),
        Bpe.tokenCountAgainstStore(s, store, col("text"))
          .cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),

    // multimodal: stubbed decode over BINARY media column (real plumbing)
    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(Multimodal.asMediaTable(table(s, dir, "documents")))
        .orderBy("doc_id")),

    // multimodal: feature stage over decoded metadata (column math)
    "mm_media_features" -> ((s, dir) =>
      Multimodal.mediaFeatures(
        Multimodal.decodeMeta(Multimodal.asMediaTable(table(s, dir, "documents"))))
        .select(col("doc_id"), col("media_type"),
          round(col("aspect"), 6).as("aspect"), col("total_pixels"))
        .orderBy("doc_id")),

    // multimodal: resize planning (fit 224x224, aspect-preserving)
    "mm_resize_plan" -> ((s, dir) =>
      Multimodal.resizePlan(
        Multimodal.decodeMeta(Multimodal.asMediaTable(table(s, dir, "documents"))),
        224, 224)
        .orderBy("doc_id")),

    // multimodal: perceptual-hash near-dup pairs over the BINARY media
    // column — one payload pass to 8-byte fingerprints, then the exact
    // multi-index hamming blocking (MultimodalSpec proves blocked ==
    // brute force; rows-only — the kernel is engine-local). The
    // corpus' text near-dups are NOT media near-dups (word edits shift
    // every downstream byte), so the fixture plants what media dedup
    // actually hunts: a "re-encode" of every 10th doc — same payload
    // with one 8-byte run replaced by bytes copied from elsewhere in
    // the SAME payload. The copy shifts the global byte sum only by
    // the difference of two 8-byte text runs — negligible against the
    // payload total, so near-tie blocks stay put (measured 48/50 at
    // hamming ≤ 3); a constant 0x7f overwrite shifts the mean enough
    // to flip near-tie bits across these narrow-range text payloads
    "media_phash_pairs" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(table(s, dir, "documents"))
      val reenc = reencodedMedia(media)
      Multimodal.phashPairs(media.unionByName(reenc),
        col("doc_id"), col("media"), maxHamming = 3,
        materialize = eagerPairs)
    }),

    // multimodal: INCREMENTAL phash dedup — fingerprint index built
    // once over the original media (memoized write-once job, 16 B/doc),
    // the re-encode increment fingerprints and joins against the store
    // with no payload rescan (rows-only; indexed==inline proven in
    // MultimodalSpec)
    "media_phash_indexed" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(table(s, dir, "documents"))
      val store = memoStore("phash", dir)(p =>
        Multimodal.buildPhashIndex(media, col("doc_id"), col("media"), p))
      val reenc = reencodedMedia(media)
      Multimodal.phashAgainstIndex(s, store, reenc, col("doc_id"),
        col("media"), maxHamming = 3, materialize = eagerPairs)
    }),

    // multimodal REAL decode (r6 verdict item 5): payloads are real
    // BMP/PPM/PGM/WebP containers built in closed form over doc_id
    // (Multimodal.syntheticContainer — since r16 the id%8 cycle adds
    // lossy VP8, lossless VP8L, and animated WebP, JUNK-padded to
    // closed-form byte lengths), parsed back by the pure-JVM byte
    // decoders; every 8th doc is raw text exercising the stub
    // fallback with decoded=0. The oracle recomputes format, byte
    // length (incl. BMP 4-byte row padding and the exact netpbm
    // header string), dimensions, channels, and ANMF frame counts
    // without ever seeing the bytes — a round-trip proof the decoder
    // reads actual header fields
    // Unicode NFC canonicalization (custom codegen kernel — Spark has
    // no built-in): decomposed sequences planted on every doc compose
    // to their precomposed forms; byte-level fingerprints downstream
    // depend on this pass, since unnormalized twins never dedup. The
    // oracle runs DuckDB's independent utf8proc nfc_normalize and
    // compares md5 of the normalized TEXT — two implementations of
    // the Unicode spec agreeing byte-for-byte
    "text_nfc_normalize" -> ((s, dir) => {
      val fixture = concat(col("text"),
        // decomposed escapes (e+U+0301, a+U+030A, a+U+0308): NFC must do
      // real composition work, and escapes keep the source encoding-proof
        lit(" cafe\u0301 bla\u030Aba\u0308r"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.GraftFunctions.unicodeNormalize(fixture, "NFC")
            .as("__n"))
        .select(col("doc_id"),
          length(col("__n")).cast("long").as("n_chars_norm"),
          md5(col("__n").cast("binary")).as("norm_md5"))
        .orderBy("doc_id")
    }),

    // HTML → text extraction over a deterministic page fixture both
    // engines construct identically: script/style/comment content
    // drops, tags become spaces, entities decode (&amp; last),
    // whitespace collapses — all with RE2-safe patterns, fully
    // oracled (the extracted text itself hashes, not a summary)
    "text_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><script>var x = 1 < 2;</script>" +
          "<style>p { color: red }</style></head><body><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1>\n<p>"), col("text"),
        lit(" &amp; more &lt;tags&gt;</p><!-- crawler note -->" +
          "</body></html>"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.htmlToText(html).as("extracted"))
        .withColumn("n_chars_out", length(col("extracted")).cast("long"))
        .orderBy("doc_id")
    }),

    // MAIN-CONTENT extraction over a full synthetic page (nav,
    // header, link-farm sidebar, footer, related-links list) minted
    // identically by both engines: structural chrome drops wholesale,
    // remaining blocks classify by length + link density, and the
    // recovered main text itself hashes — so a wrong block decision
    // anywhere shows up as a text diff, not a fuzzy score drift
    "text_main_content" -> ((s, dir) => {
      val f = htmlPageFixture(table(s, dir, "documents"))
      val mc = TextOps.extractMainContent(col("html"))
      f.select(col("doc_id"), mc.as("mc"))
        .select(col("doc_id"),
          col("mc.main_text").as("main_text"),
          col("mc.n_blocks").as("n_blocks"),
          col("mc.n_content_blocks").as("n_content_blocks"),
          col("mc.content_chars").as("content_chars"),
          col("mc.boiler_chars").as("boiler_chars"))
        .orderBy("doc_id")
    }),

    // Gopher document-quality rules (Rae et al. 2021 A1.1) over the
    // minted multi-line pages: word-count bounds, mean word length,
    // symbol ratio, bullet/ellipsis line fractions, alpha-word
    // fraction, required-stopword count, and the composite keep
    // verdict — the oracle re-mints the page and restates every rule
    // in SQL, so each fixture pathology (bullets every 7th line,
    // ellipsis slot, '#'-heavy and numeric lines, stopword lines)
    // must flip the same rule in both engines
    "text_gopher_rules" -> ((s, dir) => {
      // exchange between minting and the rule projection: the rules
      // reference the page ~20×, and CollapseProject would otherwise
      // inline the higher-order minting tree into every reference
      val f = linePageFixture(table(s, dir, "documents"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
      f.select((col("doc_id") +: TextOps.gopherColumns(col("page"))): _*)
        .orderBy("doc_id")
    }),

    // C4 line-level cleaning (Raffel et al. 2020 §2.2) over the same
    // pages: terminal-punctuation / ≥3-word / no-"javascript" line
    // retention, page reconstruction, and the lorem-ipsum / brace /
    // ≥5-sentence document verdict — the cleaned text itself hashes,
    // so the whole line pipeline must agree byte-for-byte
    "text_c4_clean" -> ((s, dir) => {
      // same minting barrier as text_gopher_rules
      val f = linePageFixture(table(s, dir, "documents"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
      f.select((col("doc_id") +: TextOps.c4CleanColumns(col("page"))): _*)
        .orderBy("doc_id")
    }),

    // domain-level quality gate (the FineWeb/RefinedWeb "block whole
    // domains" stage): per-doc Gopher verdicts rolled up by
    // registered domain (www hosts merge with their apex, co.uk
    // suffixes keep three labels), domains kept when the pass rate
    // clears the floor. One scan computes url + page + verdict, one
    // partial-agg'd groupBy on domain — at 100 TB the map side
    // reduces each partition to |domains| rows before the shuffle
    "url_domain_quality" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val gridded = floor(col("n_pass").cast(DoubleType) / col("n_docs")
        * lit(1e6) + lit(0.5)) / lit(1e6)
      // mint url+page ONCE per row below the exchange: the verdict
      // projection references its input many times, and letting
      // CollapseProject inline the minting trees into every reference
      // multiplies the per-row cost ~20× (measured 17.7s → sub-second
      // with the barrier). The exchange doubles as the spreadById
      // shape that parallelizes the interpreted projection.
      docs.select(col("doc_id"), urlFixtureCol.as("url"),
          linePageFixtureCol.as("page"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(
          Urls.registeredDomain(Urls.hostOf(Urls.canonicalize(col("url"))))
            .as("domain"),
          TextOps.gopherKeep(col("page")).cast(IntegerType).as("k"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), sum(col("k")).cast("long").as("n_pass"))
        .select(col("domain"), col("n_docs"), col("n_pass"),
          gridded.as("pass_rate"),
          (gridded >= 0.25).cast(IntegerType).as("domain_keep"))
        .orderBy("domain")
    }),

    // robots.txt gate: per-host policies parsed by the kernel from
    // REAL robots.txt text (groups, comments, the graftbot group
    // shadowing the Disallow-everything '*' group on even hosts),
    // URLs gated by RFC 9309 longest-match/allow-wins evaluation;
    // the oracle states the expected verdict per (host-parity, path
    // variant) in closed form — group selection, longest-prefix
    // override (Allow /private/ok beats Disallow /private), and the
    // star fallback each decide some rows
    "url_robots_filter" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val robots = robotsFixture(docs)
      val m = (col("doc_id") % 7).cast("string")
      val path = when(col("doc_id") % 4 === 0, concat(lit("/page/"), m))
        .when(col("doc_id") % 4 === 1, concat(lit("/private/doc"), m))
        .when(col("doc_id") % 4 === 2, concat(lit("/private/ok/doc"), m))
        .otherwise(concat(lit("/tmp/x"), m))
      val urls = docs.select(col("doc_id"),
        concat(lit("http://site"), (col("doc_id") % 5).cast("string"),
          lit(".example"), path).as("url"))
      Urls.robotsVerdicts(urls, col("url"), col("doc_id"), robots,
        col("host"), col("robots_txt"), "graftbot")
        .select(col("doc_id"), col("host"), col("path"),
          col("allowed").cast(IntegerType).as("allowed"))
        .orderBy("doc_id")
    }),

    // Sitemap: directives extracted from the same robots corpus — the
    // crawl-frontier feed riding along with the access rules (group-
    // independent per RFC 9309, so a line-anchored extraction is the
    // whole parse); case/whitespace variants in the fixture pin the
    // (?im) anchoring
    "url_sitemaps" -> ((s, dir) => {
      val robots = robotsFixture(table(s, dir, "documents"))
      robots.select(col("host"),
          explode(Urls.sitemapUrls(col("robots_txt"))).as("sitemap_url"))
        .orderBy("host", "sitemap_url")
    }),

    // sitemap DOCUMENT parse (the files the robots `Sitemap:`
    // directives point at): <urlset> and <sitemapindex> payloads,
    // every third one REALLY gzipped (.xml.gz), locs trimmed and
    // entity-decoded, optional lastmod NULL when absent; the oracle
    // restates every entry closed-form from the fixture arithmetic —
    // a full round-trip proof of gunzip + tag walk + unescape
    "url_sitemap_entries" -> ((s, dir) => {
      val mk = udf((id: Long) => Ingest.sitemapFixture(id))
      val payloads = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id")).as("body"))
      Urls.sitemapFrontier(payloads, col("doc_id"), col("body"))
        .orderBy("doc_id", "loc")
    }),

    // END-TO-END crawl frontier: sitemap documents parse into candidate
    // URLs, then the robots gate (with WILDCARD rules) decides each —
    // the composition a crawler actually runs. Even hosts disallow the
    // deep /sub pages with a mid-rule wildcard; odd hosts disallow
    // everything, re-Allow /p/* by specificity, then out-rank that
    // Allow with a longer /p/*/sub* Disallow — both mechanics must
    // produce the same closed-form verdicts
    "url_frontier_gated" -> ((s, dir) => {
      val mk = udf((id: Long) => Ingest.sitemapFixture(id))
      val docs = table(s, dir, "documents")
      val payloads = docs.select(col("doc_id"), mk(col("doc_id")).as("body"))
      val frontier = Urls.sitemapFrontier(payloads, col("doc_id"), col("body"))
        .filter(col("kind") === "url")
        .select((col("doc_id") * 2 +
          when(col("loc").contains("/sub"), 1).otherwise(0)).as("rid"),
          col("loc"))
      val robots = frontierRobotsFixture(docs)
      Urls.robotsVerdicts(frontier, col("loc"), col("rid"), robots,
        col("host"), col("robots_txt"), "graftbot")
        .select(col("doc_id").as("row_id"), col("host"), col("path"),
          col("allowed").cast(IntegerType).as("allowed"))
        .orderBy("row_id")
    }),

    // per-host Crawl-delay (the de-facto politeness extension): group
    // selection identical to the robots gate, LAST valid value wins
    // within the applicable group, invalid values skip, a named group
    // without a delay SHADOWS the star group's delay; the oracle
    // states each policy shape's outcome in closed form
    "url_crawl_delay" -> ((s, dir) => {
      val robots = crawlDelayFixture(table(s, dir, "documents"))
      Urls.crawlDelay(robots, col("host"), col("robots_txt"), "graftbot")
        .orderBy("host")
    }),

    // RFC 9309 special characters ('*' wildcard, '$' end anchor) and
    // canonical percent-encoding in the robots gate: a query-string
    // Disallow, an anchored wildcard Allow overriding a directory
    // Disallow by specificity rank, a bare anchored rule failing open
    // on a longer path, and literal-space / UTF-8-escape rules
    // matching raw URL spellings; the oracle states the verdict per
    // (host-parity, path-variant) pair in closed form
    "url_robots_wildcards" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val robots = robotsWildcardFixture(docs)
      val m = col("doc_id") % 7
      val path = element_at(array(
        lit("/p/x.html"), lit("/p/x.htmlz"), lit("/q?sid=5"),
        lit("/dl"), lit("/dl/x"), lit("/a b"), lit("/café")),
        (m + 1).cast("int"))
      val urls = docs.select(col("doc_id"),
        concat(lit("https://wild"), (col("doc_id") % 2).cast("string"),
          lit(".example"), path).as("url"))
      Urls.robotsVerdicts(urls, col("url"), col("doc_id"), robots,
        col("host"), col("robots_txt"), "graftbot")
        .select(col("doc_id"), col("host"), col("path"),
          col("allowed").cast(IntegerType).as("allowed"))
        .orderBy("doc_id")
    }),

    // the ZERO-SHUFFLE robots gate: the same wildcard matrix decided
    // by the map-side formulation (per-host rule ARRAY broadcast,
    // winner picked by an array fold in the projection — no max_by
    // aggregation, no shuffle); same closed-form verdicts as
    // url_robots_wildcards, so the two formulations are oracle-pinned
    // to each other as well as spec-pinned
    "url_robots_mapside" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val robots = robotsWildcardFixture(docs)
      val m = col("doc_id") % 7
      val path = element_at(array(
        lit("/p/x.html"), lit("/p/x.htmlz"), lit("/q?sid=5"),
        lit("/dl"), lit("/dl/x"), lit("/a b"), lit("/café")),
        (m + 1).cast("int"))
      val urls = docs.select(col("doc_id"),
        concat(lit("https://wild"), (col("doc_id") % 2).cast("string"),
          lit(".example"), path).as("url"))
      Urls.robotsVerdictsMapSide(urls, col("url"), col("doc_id"), robots,
        col("host"), col("robots_txt"), "graftbot")
        .select(col("doc_id"), col("host"), col("path"),
          col("allowed").cast(IntegerType).as("allowed"))
        .orderBy("doc_id")
    }),

    // outlink extraction + RFC 3986 resolution: every anchor class a
    // real page carries — absolute (incl. an uppercase spelling kept
    // verbatim), scheme-relative, root-relative with an entity-encoded
    // query, dotted relatives (../, ./, bare, and an over-popping
    // ../../../ past the root), query-only, fragment-only (→ the base
    // itself), single-quoted attributes, and dropped mailto:/
    // javascript: schemes; the oracle states every (href, resolved)
    // pair in closed form per anchor class
    "url_link_extract" -> ((s, dir) => {
      val pages = linkPageFixture(table(s, dir, "documents"))
      Urls.pageLinks(pages, col("doc_id"), col("base_url"), col("html"))
        .orderBy("doc_id", "ord")
    }),

    // domain-level link graph over the same pages: registered-domain
    // edges with internal links dropped, n_links vs n_pages separating
    // link multiplicity from page reach; the uppercase absolute anchor
    // must land on the same lowercased domain as its lowercase twin
    "url_domain_graph" -> ((s, dir) => {
      val pages = linkPageFixture(table(s, dir, "documents"))
      Urls.domainLinkGraph(pages, col("doc_id"), col("base_url"),
          col("html"))
        .orderBy("src_domain", "dst_domain")
    }),

    // politeness-aware fetch schedule: per-host URL slots spaced by
    // the effective Crawl-delay (composed from the url_crawl_delay
    // policy fixture: last-valid-wins 2.5s, star-group 0.5s, and two
    // NULL-delay shapes falling back to the 1.0s default)
    "url_crawl_schedule" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val frontier = docs.select(concat(lit("https://delay"),
        (col("doc_id") % 4).cast("string"), lit(".example/p/"),
        lpad(col("doc_id").cast("string"), 8, "0")).as("url"))
      val robots = crawlDelayFixture(docs)
      Urls.crawlSchedule(frontier, col("url"), robots,
          col("host"), col("robots_txt"), "graftbot")
        .orderBy("host", "url")
    }),

    // charset sniff + decode of raw payload bytes (the stage between
    // container ingest and every text operator): per-doc fixture
    // cycles ascii / UTF-8 / UTF-8+BOM / UTF-16LE / windows-1252
    // encodings of the document text, the engine sniffs and decodes
    // from actual bytes, and the oracle states the expected charset
    // verdict, the decoded text ITSELF, and the exact byte length in
    // closed form — a full round-trip proof of the validator and both
    // decode tables
    "ingest_charset_decode" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Ingest.charsetFixture(id, txt))
      val raw = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("payload"))
      Ingest.decodeTextAuto(raw, col("payload"))
        .select(col("doc_id"), col("charset"), col("text_decoded"),
          col("n_bytes"))
        .orderBy("doc_id")
    }),

    // CJK + declared-charset decode (the legacy-encoding half of the
    // charset stage): strict UTF-8 beats a lying Shift_JIS header,
    // Shift_JIS/EUC-JP are found by byte STRUCTURE with no hint, the
    // structurally-ambiguous EUC-KR/GB/Big5 resolve via (aliased)
    // declarations kept honest by strict decode, latin-1 maps to
    // windows-1252 per the web platform, and a lying GBK header falls
    // back; the oracle restates charset, the decoded text ITSELF
    // (UTF-8 literals), and exact byte lengths in closed form
    "ingest_charset_cjk" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Ingest.charsetCjkFixture(id, txt))
      val raw = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("f"))
        .select(col("doc_id"), col("f._1").as("payload"), col("f._2").as("hint"))
      Ingest.decodeTextHint(raw, col("payload"), col("hint"))
        .select(col("doc_id"), col("charset"), col("text_decoded"),
          col("n_bytes"))
        .orderBy("doc_id")
    }),

    // anchor (href, TEXT) pairs — the target-description signal a
    // search index and a crawl prioritizer both consume: inner text
    // strips nested tags (<b>Bold</b>), entity-decodes (Q&amp;A),
    // collapses whitespace; non-fetchable schemes drop the whole
    // pair; the oracle states every surviving pair in closed form
    "url_anchor_text" -> ((s, dir) => {
      val pages = linkPageFixture(table(s, dir, "documents"))
      pages.select(col("doc_id"), posexplode(Urls.anchorTexts(col("html"))))
        .select(col("doc_id"), col("pos").as("ord"),
          col("col.href").as("href"), col("col.text").as("anchor_text"))
        .orderBy("doc_id", "ord")
    }),

    // domain-level PageRank: the domain link graph feeds the generic
    // PageRank with md5-portable node ids (domains are strings; the
    // id is the same first-8-nibble md5 value the doc link graph
    // uses, so the oracle rebuilds identical keys) — the authority
    // score a crawl prioritizer ranks frontier hosts by
    "url_domain_pagerank" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val pages = linkPageFixture(docs)
      val g = Urls.domainLinkGraph(pages, col("doc_id"), col("base_url"),
        col("html")).localCheckpoint(true)
      def mdId(c: Column): Column =
        conv(substring(md5(c), 1, 8), 16, 10).cast("long")
      val nodes = g.select(col("src_domain").as("domain"))
        .union(g.select(col("dst_domain").as("domain"))).distinct()
        .select(col("domain"), mdId(col("domain")).as("node"))
        .localCheckpoint(true)
      val edges = g.select(mdId(col("src_domain")).as("src"),
        mdId(col("dst_domain")).as("dst"))
      val n = nodes.count()
      Graph.pageRank(edges, nodes, col("node"), iters = 3)
        .join(nodes, Seq("node"))
        .select(col("domain"),
          (floor(col("rank") * lit(n.toDouble) * lit(1e6) + lit(0.5)) /
            lit(1e6)).as("rank_norm"))
        .orderBy("domain")
    }),

    // the FULL crawl loop, composed end to end: extract outlinks from
    // fetched pages, resolve, canonicalize (tracking params drop,
    // uppercase spellings fold), dedup, anti-join the already-crawled
    // set, gate through per-host robots rules, and emit a politeness-
    // spaced fetch schedule — the query a crawler runs to produce its
    // next round. The oracle states the surviving frontier closed-form
    // per anchor class (blocked /squote, /lib2/, /UP and the crawled
    // bases all absent) with the delay/window restated
    "url_frontier_next" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val pages = linkPageFixture(docs)
      val links = Urls.pageLinks(pages, col("doc_id"), col("base_url"),
        col("html"))
      val cand = links.select(Urls.canonicalize(col("resolved")).as("url"))
        .distinct()
      val crawled = pages.select(Urls.canonicalize(col("base_url")).as("url"))
      val fresh = cand.join(crawled, Seq("url"), "left_anti")
      val robots = frontierNextRobotsFixture(docs)
      val gated = Urls.robotsVerdicts(fresh, col("url"), col("url"), robots,
          col("host"), col("robots_txt"), "graftbot")
        .filter(col("allowed")).select(col("url"))
      Urls.crawlSchedule(gated, col("url"), robots,
          col("host"), col("robots_txt"), "graftbot")
        .orderBy("host", "url")
    }),

    // rule-based sentence segmentation: abbreviation protection
    // (word-bounded and multi-dot forms), decimal numbers never
    // split, terminator-inside-quotes splits after the quote, an
    // ellipsis splits only before a capital, unterminated tails
    // survive; the oracle re-runs the whole pipeline in SQL with the
    // abbreviation folds generated from the same Scala constants
    "text_sentences" -> ((s, dir) => {
      val f = sentencePageFixture(table(s, dir, "documents"))
      f.select(col("doc_id"), posexplode(TextOps.sentenceSplit(col("page"))))
        .select(col("doc_id"), col("pos").as("sent_no"),
          col("col").as("sentence"))
        .orderBy("doc_id", "sent_no")
    }),

    // page-metadata extraction (title / meta description / og:title /
    // link canonical): title entity-decodes and whitespace-collapses,
    // the description carries &quot; escapes, og/description/canonical
    // appear only on their modulus classes ('' when absent); the
    // oracle states every field closed-form from the mint arithmetic
    "text_html_meta" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val d = col("doc_id")
      val k = (d % 5).cast("string")
      val p = (d % 25).cast("string")
      val html = concat(
        lit("<html><head><title> Doc "), d.cast("string"),
        lit(" &amp;  more </title>"),
        when(d % 2 === 0, concat(lit("<meta property=\"og:title\" content=\"OG "),
          p, lit("\">"))).otherwise(lit("")),
        when(d % 3 === 0, concat(
          lit("<meta name=\"description\" content=\"Desc &quot;"), p,
          lit("&quot; here\">"))).otherwise(lit("")),
        when(d % 5 === 0, concat(
          lit("<link rel=\"canonical\" href=\"https://site"), k,
          lit(".example/canon/"), p, lit("\">"))).otherwise(lit("")),
        lit("</head><body><p>x</p></body></html>"))
      docs.select(col("doc_id"), TextOps.htmlMeta(html).as("m"))
        .select(col("doc_id"), col("m.title").as("title"),
          col("m.description").as("description"),
          col("m.og_title").as("og_title"),
          col("m.canonical").as("canonical"))
        .orderBy("doc_id")
    }),

    // HTTP/1.x response parse between WARC ingest and charset decode
    // (a WARC response payload IS an HTTP message): status line,
    // case-insensitive headers (first wins), Content-Type media type
    // + charset parameter, WHATWG-style <meta charset> prescan when
    // the header has none, gzip Content-Encoding inflated — then the
    // body flows straight into the hinted charset decode, proving the
    // whole container-to-text chain on one fixture; the oracle states
    // every field and the decoded text itself in closed form
    "ingest_http_responses" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Ingest.httpFixture(id, txt))
      val raw = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("payload"))
      val parsed = Ingest.parseHttp(raw, col("payload"))
      Ingest.decodeTextHint(parsed, col("body"), col("charset_hint"))
        .select(col("doc_id"), col("status"), col("content_type"),
          col("charset_hint"), col("content_encoding"), col("n_headers"),
          col("charset"), col("text_decoded"), col("n_bytes"))
        .orderBy("doc_id")
    }),

    // mojibake repair (the stage after charset decode): per-doc
    // fixture cycles untouched ASCII, legitimately-accented text the
    // repair must NOT alter, single and DOUBLE UTF-8-as-cp1252
    // mojibake, and a cp1252 0x80-0x9F punctuation case (curly quote,
    // em dash, euro); the oracle states the repaired text ITSELF and
    // the round count in closed form
    // HOMOGLYPH FOLDING (UTS #39 single-codepoint confusable
    // skeleton, Kernels.confusableFold): every doc_id<300 text pushed
    // through the lookalike map and folded back — the oracle
    // recomputes BOTH directions with plain translate() built from
    // the same table, so the kernel's whole mapping is hash-pinned
    "text_confusable_fold" -> ((s, dir) =>
      table(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.confusableFold(
            translate(col("text"), confuseFrom, confuseTo)).as("folded"))
        .orderBy("doc_id")),

    // homoglyph-robust exact dedup: planted lookalike twins (every
    // 20th doc re-spelled through the confusable map) group with
    // their originals under fold-then-lower — plain exact dedup is
    // blind to them (spec-pinned); groups → (id_a=min, id_b) pairs,
    // oracled through the same translate table
    "dedup_confusable_pairs" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val planted = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          translate(col("text"), confuseFrom, confuseTo).as("text"))
      val all = docs.select(col("doc_id"), col("text")).unionByName(planted)
      all.groupBy(md5(lower(
          graft.functions.GraftFunctions.confusableFold(col("text")))).as("k"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(element_at(col("ids"), 1).as("id_a"),
          explode(slice(col("ids"), 2, 1000000)).as("id_b"))
        .orderBy("id_a", "id_b")
    }),

    "text_mojibake_fix" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Ingest.mojibakeFixture(id, txt))
      table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("garbled"))
        .select(col("doc_id"), TextOps.mojibakeFix(col("garbled")).as("f"))
        .select(col("doc_id"), col("f.text").as("text_fixed"),
          col("f.rounds").as("n_rounds"))
        .orderBy("doc_id")
    }),

    // WARC/1.0 crawl-container ingest: real byte-level record walk
    // (version line, case-insensitive headers, Content-Length-
    // delimited payloads). Oracle recomputes every field closed-form
    // WITHOUT the bytes — payload md5 == md5(text) proves the parser
    // cut exact payload boundaries
    "ingest_warc_records" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Ingest.warcFixture(id, txt))
      val containers = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("warc"))
      Ingest.warcRecords(containers)
        .select(col("doc_id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("doc_id", "rec_idx")
    }),

    // GZIPPED WARC ingest (.warc.gz — one gzip member per record,
    // concatenated: the Common-Crawl wire format): containers are
    // REALLY deflate-compressed (java.util.zip on the fixture side,
    // GZIPInputStream multi-member consumption on the decode side);
    // decompressed content is byte-identical to the plain fixture, so
    // the SAME oracle fields (lengths, URIs, payload md5) must come
    // out — a desync or partial-member bug fails the hash.
    "ingest_warc_gz_records" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Ingest.warcGzFixture(id, txt))
      val containers = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("warc"))
      Ingest.warcRecords(containers)
        .select(col("doc_id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("doc_id", "rec_idx")
    }),

    // URL-level dedup — the first stage of crawl curation. The fixture
    // mints 4 raw SPELLINGS of the same logical page per doc (host
    // case + trailing slash / scheme case + default port + tracking
    // param / userinfo + fragment / schemeless), with the logical page
    // keyed by (doc_id%5 host, doc_id%25 path) so ~20 docs collapse
    // per canonical URL at sf0.01. The oracle restates BOTH the mint
    // and the full canonicalization chain (regexp parse, port/
    // fragment/userinfo strip, tracking-param filter + sort) in
    // DuckDB, so any divergence in the string pipeline fails the hash.
    "url_canonical_dedup" -> ((s, dir) => {
      Urls.dedupByCanonical(urlFixture(table(s, dir, "documents")),
          col("url"), col("doc_id"))
        .orderBy("url_canonical")
    }),

    // per-registered-domain rollup over the same fixture: the
    // multi-part-suffix split (site<k>.co.uk stays three labels) and
    // the host parse are what the oracle pins.
    "url_host_stats" -> ((s, dir) => {
      val canon = urlFixture(table(s, dir, "documents"))
        .select(col("doc_id"), Urls.canonicalize(col("url")).as("cu"))
      canon.select(col("doc_id"), col("cu"),
          Urls.registeredDomain(Urls.hostOf(col("cu"))).as("domain"))
        .groupBy("domain")
        .agg(countDistinct(col("cu")).as("n_urls"),
          count(lit(1)).as("n_docs"))
        .orderBy("domain")
    }),

    // exotic public suffixes: two-label ccSLDs beyond the original
    // 18-entry list (com.sg / co.nz / com.hk) plus THREE-label
    // suffixes (k12.ca.us, vic.edu.au) whose registered domains keep
    // four labels — and 5-label hosts ("shop." prefix) that must
    // still split at the same boundary
    "url_exotic_domains" -> ((s, dir) => {
      val f = exoticUrlFixture(table(s, dir, "documents"))
      f.select(Urls.hostOf(col("url")).as("host"))
        .select(col("host"), Urls.registeredDomain(col("host")).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"))
        .orderBy("domain")
    }),

    "mm_decode_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticContainer(id, txt))
      val media = table(s, dir, "documents")
        .select(col("doc_id"), lit("image").as("media_type"),
          mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeMetaAuto(media)
        .select(col("doc_id"), col("format"), col("byte_len"), col("width"),
          col("height"), col("channels"), col("n_frames"),
          col("decoded").cast(IntegerType).as("decoded"))
        .orderBy("doc_id")
    }),

    // multimodal REAL pixel decode: luma-plane sums of the decodable
    // containers — the oracle recomputes BT.601 integer luma of the
    // closed-form pixel pattern per (x, y) and sums it, so a stride,
    // padding, bottom-up, or channel-order mistake in the BMP/PPM/PGM
    // pixel walk shifts the sum and fails the hash; the id%8 cycle's
    // WebP branches (flat-MB VP8, closed-form VP8L, anim poster
    // frame) run the RFC 6386 / VP8L decoders inside the SAME ledger
    // corpus. This is the end-to-end pixel path the phash kernel
    // consumes via decodeGrayStage
    "mm_gray_stats" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticContainer(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var s = 0L; var i = 0
        while (i < b.length) { s += (b(i) & 0xff); i += 1 }; s
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // BMP depth envelope end-to-end (BI_RGB 8-bit palette through the
    // gray-ramp BGRA quads, 24-bit BGR, 32-bit BGRA with the alpha
    // byte ignored): the oracle recomputes BT.601 luma closed-form
    // per depth, so a palette-offset, quad-order, row-alignment, or
    // 32-bit-stride mistake shifts sum_luma and fails the hash
    "mm_bmp_variants" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticBmpVariant(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // palette-PNG pixel path end-to-end: indices expand through the
    // PLTE and the oracle recomputes every luma closed-form (ramp
    // palette v=16i makes BT.601 luma exactly the palette value) —
    // a wrong palette lookup, index byte, or filter pass shifts the
    // sum and fails the hash
    "mm_palette_real" -> ((s, dir) => {
      val mk = udf((id: Long) => Multimodal.syntheticPalettePng(id))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // multimodal: frame sampling plan for video rows
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.decodeMeta(Multimodal.asMediaTable(table(s, dir, "documents"))), 10)
        .select(col("doc_id"), col("n_frames"),
          col("frame_idx").cast(LongType).as("frame_idx"))
        .orderBy("doc_id", "frame_idx")),

    // AUDIO real decode: payloads are real RIFF/WAVE PCM containers
    // built in closed form over doc_id (Multimodal.syntheticWav — 1-2
    // channels, 3 sample rates, 4 clip lengths, 16-bit samples), parsed
    // back by the pure-JVM chunk walker (Codecs.decodeWavHeader). The
    // oracle recomputes every header field and the exact container byte
    // length without seeing the bytes — a fmt-chunk, block-align, or
    // data-length mistake fails the hash. Every 7th doc is raw text
    // exercising the undecodable fallback (excluded here, counted by
    // the decoded filter matching the oracle's doc_id % 7 <> 0).
    "audio_decode_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Multimodal.syntheticWav(id, txt))
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeAudioMeta(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("format"), col("sample_rate"),
          col("channels"), col("bits"), col("n_samples"), col("byte_len"))
        .orderBy("doc_id")
    }),

    // AUDIO windowed features over REAL decoded PCM: the decode stage
    // de-interleaves actual 16-bit LE frames to the integer channel-sum
    // mixdown (exact — no division), then per-256-sample window energy
    // / peak / zero-crossings as higher-order-function column math (no
    // shuffle before the final grid). The oracle regenerates the PCM
    // closed form and recomputes all three features per window — a
    // sign-extension, interleave, or window-boundary mistake fails.
    "audio_features_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Multimodal.syntheticWav(id, txt))
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.audioWindowFeatures(
        Multimodal.decodeAudioMixStage(media), 256)
        .orderBy("doc_id", "win")
    }),

    // AUDIO fingerprint dedup over REAL decoded PCM: 63-bit
    // energy-delta sign profiles (Haitsma-Kalker shape) through the
    // exact multi-index hamming funnel. Planted near-dups are
    // CHANNEL-SWAPPED re-encodes of the stereo clips - byte-different
    // payloads with identical channel-sum mixdowns, the transform
    // byte hashing cannot see. FULLY oracled: DuckDB regenerates the
    // PCM closed form, recomputes window energies, delta bits, packed
    // fingerprints, and brute-force hamming pairs - the engine's
    // banded funnel must land on the identical pair list.
    "audio_dedup_pairs" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Multimodal.syntheticWav(id, txt))
      val mkSwap = udf((id: Long) => Multimodal.syntheticWavSwapped(id))
      val docs = table(s, dir, "documents")
      val media = docs
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      val swapped = docs
        .filter(pmod(col("doc_id"), lit(10)) === 1 &&
          pmod(col("doc_id"), lit(7)) =!= 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          mkSwap(col("doc_id")).as("media"))
      Multimodal.audioFingerprintPairs(media.unionByName(swapped),
        maxHamming = 3, materialize = eagerPairs)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast(IntegerType).as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // INCREMENTAL audio dedup: fingerprint index built once over the
    // original clips (memoized write-once job, 16 B/doc); the
    // channel-swapped increment decodes only its own payloads and
    // joins the store - no payload rescan. Oracled as the >= 1 side
    // new restriction of the brute-force pair list.
    "audio_dedup_indexed" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Multimodal.syntheticWav(id, txt))
      val mkSwap = udf((id: Long) => Multimodal.syntheticWavSwapped(id))
      val docs = table(s, dir, "documents")
      val media = docs
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      val store = memoStore("audiofp", dir)(p =>
        Multimodal.buildAudioFpIndex(media, p))
      val swapped = docs
        .filter(pmod(col("doc_id"), lit(10)) === 1 &&
          pmod(col("doc_id"), lit(7)) =!= 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          mkSwap(col("doc_id")).as("media"))
      Multimodal.audioFpAgainstIndex(s, store, swapped, maxHamming = 3,
        materialize = eagerPairs)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast(IntegerType).as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // G.711 COMPRESSED audio decode (format tags 6/7): payloads are
    // real RIFF containers whose 8-bit code stream is the closed-form
    // fixture contract; the engine expands each code through the CCITT
    // µ-law/A-law arithmetic (Codecs.mulawDecode/alawDecode) into the
    // channel-sum mixdown. The oracle restates the code stream AND the
    // expand (complement/XOR-0x55, segment shift, re-bias) in SQL —
    // a sign, segment, or bias mistake shifts every aggregate
    "audio_g711_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Multimodal.syntheticG711(id, txt))
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeAudioMixStage(media)
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          size(col("mix")).as("n_samples"),
          aggregate(col("mix"), lit(0L), (acc, x) => acc + x).as("mix_sum"),
          array_min(col("mix")).as("mix_min"),
          array_max(col("mix")).as("mix_max"))
        .orderBy("doc_id")
    }),

    // IMA ADPCM audio decode (format tag 0x11): real block-structured
    // containers — per-block header predictor + step index, then the
    // 4-bit nibble stream — decoded through the bit-exact predictor
    // recurrence (step>>3 + conditional halves, ±, clamp, index
    // advance). All block contents are closed-form, so the oracle
    // replays the SAME recurrence as a recursive CTE over (doc,
    // block, nibble); mix_last pins the final state — any mid-stream
    // divergence propagates to it and to mix_sum
    "audio_adpcm_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Multimodal.syntheticAdpcm(id, txt))
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeAudioMixStage(media)
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          size(col("mix")).as("n_samples"),
          aggregate(col("mix"), lit(0L), (acc, x) => acc + x).as("mix_sum"),
          array_min(col("mix")).as("mix_min"),
          array_max(col("mix")).as("mix_max"),
          element_at(col("mix"), size(col("mix"))).as("mix_last"))
        .orderBy("doc_id")
    }),

    // VIDEO real decode: payloads are real YUV4MPEG2 streams built in
    // closed form (Multimodal.syntheticY4m — C420 planes, 2-5 frames),
    // parsed by the pure-JVM tag walker that verifies every FRAME
    // marker (Codecs.decodeY4mHeader). Oracle recomputes dimensions,
    // fps, frame count, and total byte length incl. the ASCII header's
    // variable width.
    "video_decode_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Multimodal.syntheticY4m(id, txt))
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeVideoMeta(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("fps_num"), col("fps_den"), col("n_frames"), col("byte_len"))
        .orderBy("doc_id")
    }),

    // VIDEO real frame sampling: every 2nd frame's ACTUAL luma plane
    // out of the container, summed — the oracle recomputes the Y-plane
    // closed form per (frame, x, y), so a plane-stride, chroma-skip, or
    // frame-offset mistake shifts the sum and fails the hash. This is
    // the real-bytes twin of the planning-only mm_frame_sample.
    "video_frame_luma" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) => Multimodal.syntheticY4m(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.sampleFrameLuma(media, 2)
        .select(col("doc_id"), col("frame_idx"), byteSum(col("gray")).as("sum_y"))
        .orderBy("doc_id", "frame_idx")
    }),

    // REAL GIF decode: literal-LZW GIF89a fixtures through the full
    // LZW decompressor (variable-width codes, CLEAR handling,
    // sub-block framing) and the grayscale palette lookup - the
    // oracle recomputes pixel sums from the closed form, so a bit-
    // unpacking, dictionary, palette, or framing mistake fails the
    // hash on real container bytes.
    "mm_gif_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticGif(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // REAL JPEG decode: payloads are baseline grayscale JPEGs (pure-JVM
    // graft.ops.Jpeg — Annex-K Huffman tables, byte stuffing, marker
    // walk, dequantize + IDCT) of flat 8x8 blocks in closed form, so
    // the oracle recomputes decoded pixel sums with no DCT in SQL
    // while the engine runs the full baseline path on real bytes. A
    // Huffman, DC-prediction, stuffing, dequant, or IDCT mistake
    // shifts the sums and fails the hash.
    "mm_jpeg_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticJpeg(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // PNG Adam7-interlace + 16-bit decode end-to-end: interlaced
    // containers scatter seven filter-passes back onto odd-dimension
    // grids; 16-bit containers filter at the 2-byte sample stride and
    // project the high byte. Pixels are closed-form, so the oracle
    // recomputes luma sums directly — a pass-geometry, stride, or
    // byte-order mistake shifts sum_luma and fails the hash.
    "mm_png_variants" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticPngVariant(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // REAL WebP-lossless (VP8L) decode end-to-end (graft.ops.Webp):
    // RIFF walk, LSB-first bitstream, canonical prefix codes, LZ77 +
    // color cache, and the transform set — the fixture rotates the
    // encode path (plain / subtract-green / predictor / palette /
    // cache+runs / meta-split) per doc while the closed-form pixel
    // grid keeps the expected luma sums computable in plain SQL
    // (lossless ⇒ path-independent). A prefix-code, transform-order,
    // bundling, or cache mistake shifts sum_luma and fails the hash.
    "mm_webp_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticWebp(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // REAL LOSSY-WEBP (VP8 key-frame) decode end-to-end (graft.ops.Vp8):
    // boolean arithmetic decoder, segmentation with absolute per-segment
    // quantizers, kf mode trees, token trees with cat extra bits, Y2
    // WHT + 4x4 DCT inverses, and intra prediction — on fixtures whose
    // luma is flat per macroblock with DC-only residuals chosen so the
    // integer chain reconstructs the closed-form value EXACTLY
    // (mm_jpeg_real's no-DCT trick, extended through the Y2 WHT). The
    // qindex, token-partition count, mode rotation, and ragged dims all
    // rotate with doc_id; a bool-decoder, dequant, WHT, prediction, or
    // context mistake shifts sum_luma and fails the hash. The decoder
    // itself is additionally pinned byte-for-byte against libwebp's
    // decode output on real encodes in Vp8Spec.
    "mm_webp_lossy_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticWebpLossy(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // ANIMATED WebP frame decode end-to-end: the ANMF chunk walk with
    // per-frame subrect headers, each sampled frame decoded standalone
    // through whichever sub-decoder its tag names — LOSSY VP8 frames
    // (DC-exact per-MB-flat fixtures) alternate with LOSSLESS VP8L
    // frames (closed-form RGB), so one oracle pins the container walk,
    // the header fields (frame_x/frame_y), and BOTH decoders at once
    "mm_webp_anim_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticAnimWebp(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.sampleAnimWebpLuma(media, stride = 1)
        .select(col("doc_id"), col("frame_idx"), col("frame_x"),
          col("frame_y"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id", "frame_idx")
    }),

    // COMPOSITED animated-WebP decode: the ANMF disposal/blend state
    // machine applied through the shared Anim compositor — each row is
    // a PRESENTED 40x40 canvas, its sum 256*v_k plus the 256*v_j of
    // every earlier frame whose dispose bit was clear (frames sit on
    // non-overlapping quadrants, so visibility is a pure window sum
    // the oracle reproduces with no pixel code). A dispose/blend flag,
    // background, clipping, or presentation-order mistake shifts
    // sum_luma and fails the hash; overlapping-rect and alpha-blend
    // cases are pinned in AnimCompositorSpec.
    "mm_webp_anim_composited" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticAnimWebpComposited(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.sampleCompositedLuma(media, stride = 1)
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id", "frame_idx")
    }),

    // COMPOSITED animated-GIF decode: same contract through the same
    // compositor, driven by the GCE disposal codes (none/background/
    // previous rotate with (id+f); on non-overlapping rects previous
    // degenerates to background, so the oracle's visibility rule is
    // dispose==none — the overlapping distinction is a spec case)
    "mm_gif_anim_composited" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticAnimGif(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.sampleCompositedLuma(media, stride = 1)
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id", "frame_idx")
    }),

    // PROGRESSIVE (SOF2) JPEG decode end-to-end: multi-scan successive
    // approximation — DC first at Al=1, spectral AC bands, DC and AC
    // refinement scans — reassembled into one coefficient buffer and
    // IDCT'd. Fixtures are flat 8x8 blocks (closed form), so the
    // oracle recomputes decoded pixel sums with no DCT; any scan-
    // script, point-transform, EOB-run, or refinement mistake shifts
    // sum_luma and fails the hash. The decoder is additionally cross-
    // validated against the JDK's libjpeg-backed ImageIO in
    // JpegProgressiveSpec.
    "mm_jpeg_progressive" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticJpegProgressive(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // REAL 3-component color JPEG decode end-to-end: YCbCr baseline
    // with 420/422/444 chroma subsampling cycling across docs, MCU-
    // grid-flat fixtures, per-channel pixel sums — the DuckDB oracle
    // recomputes each block's decoded RGB through the SAME integer
    // fixed-point conversion chain (RGB→YCbCr, quant round-trip is
    // exact on flat blocks, YCbCr→RGB with clamp) without any DCT
    "mm_jpeg_color" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticJpegColor(id, txt))
      val chanSum = udf((b: Array[Byte], c: Int) => {
        var t = 0L; var i = c
        while (i < b.length) { t += (b(i) & 0xff); i += 3 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeRgbStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          chanSum(col("rgb"), lit(0)).as("sum_r"),
          chanSum(col("rgb"), lit(1)).as("sum_g"),
          chanSum(col("rgb"), lit(2)).as("sum_b"))
        .orderBy("doc_id")
    }),

    // REAL 4-component CMYK/YCCK JPEG decode end-to-end: Adobe
    // print-pipeline streams (APP14 transform 0 = plain CMYK on even
    // ids, 2 = YCCK on odd), block-flat component fixtures — the
    // oracle recomputes decoded luma through the SAME integer chain
    // (YCbCr→RGB fixed point where YCCK, ·k/255 un-inking, BT.601)
    // with no DCT, so a transform-flag, component-order, or division
    // mistake fails the hash
    "mm_jpeg_cmyk" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticJpegCmyk(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.decodeGrayStage(media)
        .filter(col("decoded"))
        .select(col("doc_id"), col("width"), col("height"),
          byteSum(col("gray")).as("sum_luma"))
        .orderBy("doc_id")
    }),

    // REAL resize execution (the stage mm_resize_plan only plans):
    // nearest-neighbor resample of genuinely-decoded luma planes to
    // 8x8 — the oracle recomputes the closed-form luma at the exact
    // integer source coordinates (x*w//8, y*h//8) and sums, so an
    // off-by-one in the coordinate mapping, a transposed axis, or a
    // stride mistake in the resampled plane fails the hash.
    "mm_resize_real" -> ((s, dir) => {
      val mk = udf((id: Long, txt: String) =>
        Multimodal.syntheticContainer(id, txt))
      val byteSum = udf((b: Array[Byte]) => {
        var t = 0L; var i = 0
        while (i < b.length) { t += (b(i) & 0xff); i += 1 }; t
      })
      val media = table(s, dir, "documents")
        .select(col("doc_id"), mk(col("doc_id"), col("text")).as("media"))
      Multimodal.resizeGrayStage(
        Multimodal.decodeGrayStage(media).filter(col("decoded")), 8, 8)
        .select(col("doc_id"), col("out_w"), col("out_h"),
          byteSum(col("gray")).as("sum_gray"))
        .orderBy("doc_id")
    }),

    // deterministic 25% Bernoulli sample of documents — the data-mix
    // primitive: hash-derived (reproducible across runs/cluster
    // sizes, nested across fractions, plain pushdown filter). The
    // determinism/rate/nesting contracts are SamplingSpec-tested;
    // rows-only — xxhash64 is engine-local
    "sample_bernoulli" -> ((s, dir) =>
      Sampling.bernoulli(table(s, dir, "documents"), col("doc_id"), 0.25)
        .select("doc_id")),

    // quality-weighted take-k (Efraimidis–Spirakis A-Res): curation's
    // "mostly the best, some exploration" draw — inclusion odds
    // proportional to the fused quality score, O(k)-bounded plan
    // (rows-only; weighting/determinism contracts in SamplingSpec)
    "sample_quality_weighted" -> ((s, dir) =>
      Sampling.weightedTakeK(
        table(s, dir, "documents")
          .withColumn("q", TextOps.qualityScoreFused(col("text"))),
        col("doc_id"), col("q"), k = 200)
        .select("doc_id")),

    // portable twin of sample_quality_weighted: the same A-Res draw
    // with an md5-derived uniform and a 6-decimal score grid + id
    // tiebreak, so the ENTIRE weighted draw — quality weight, uniform,
    // log-score, top-k — reproduces in DuckDB and is fully oracled
    // (the xxhash64 operator above stays the engine-local default)
    "sample_quality_weighted_portable" -> ((s, dir) =>
      Sampling.weightedTakeKPortable(
        table(s, dir, "documents")
          .withColumn("q", TextOps.qualityScoreFused(col("text"))),
        col("doc_id"), col("q"), k = 200)
        .select("doc_id").orderBy("doc_id")),

    // portable twin of sample_bernoulli: md5 hex-threshold selection
    // reproduces byte-identically in ANY md5-capable engine, so this
    // one is fully DuckDB-oracled (the xxhash64 operator above stays
    // the cheap Spark-local default)
    "sample_bernoulli_portable" -> ((s, dir) =>
      Sampling.bernoulliPortable(table(s, dir, "documents"),
          col("doc_id"), 0.25)
        .select("doc_id").orderBy("doc_id")),

    // per-stratum portable sampling: one md5 threshold literal per
    // source — the cross-engine stratified twin, fully oracled
    "sample_stratified_portable" -> ((s, dir) =>
      Sampling.stratifiedPortable(table(s, dir, "documents"),
          col("doc_id"), col("source"),
          Map("src0" -> 0.05, "src1" -> 0.5), default = 0.25)
        .select("doc_id", "source").orderBy("doc_id")),

    // SEQUENCE PACKING (graft.ops.Pack): the trainer-facing layout
    // step. Chopped = concatenate-and-chop at 2048-token boundaries
    // (GPT-style pretraining; window arithmetic, fully oracled);
    // greedy = non-splitting first-fit (SFT-style; a sequential fold
    // per shard, oracled via a DuckDB recursive CTE folding the SAME
    // rule). md5 shard+order makes both layouts engine-portable.
    // Z-ORDER LAYOUT KEY (graft.ops.Layout.zValue): the Morton
    // interleave behind writeZOrdered's dual-dimension data skipping —
    // pure codegen'd bitwise Column ops, and pure bit ARITHMETIC, so
    // the oracle rebuilds every bit position in SQL (a → odd bits,
    // b → even). The layout/locality semantics themselves are
    // LayoutSpec-pinned (quadrant property, per-file rectangles)
    "layout_zorder_keys" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          Layout.zValue(col("doc_id"), col("n_chars")).as("z"))
        .orderBy("doc_id")),

    // 3-dim Morton key (Layout.zValueN, r13 verdict item 5): 21 bits
    // per dimension, bit k of dim d at position 3k+(2-d); the third
    // dimension is arithmetic ((doc_id*31+7) mod 997) so the oracle
    // rebuilds all 63 bit positions in SQL
    "layout_zorder3_keys" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          Layout.zValueN(Seq(col("doc_id"), col("n_chars"),
            pmod(col("doc_id") * 31 + 7, lit(997)))).as("z"))
        .orderBy("doc_id")),

    "pack_chopped" -> ((s, dir) =>
      Pack.packChopped(table(s, dir, "documents"), col("doc_id"),
          TextOps.tokenCount(col("text")), seqLen = 2048, shards = 16,
          seed = 3L)
        .orderBy("shard", "seq_first", "off")),

    "pack_greedy" -> ((s, dir) =>
      Pack.packGreedy(table(s, dir, "documents"), col("doc_id"),
          TextOps.tokenCount(col("text")), seqLen = 2048, shards = 16,
          seed = 3L)
        .orderBy("shard", "bin", "doc_id")),

    // the composed funnel: documents -> overlapping token chunks
    // (TextOps.chunkTokens) -> greedy-packed training sequences
    // (Pack.packGreedy over chunk ids) — chunking bounds every unit at
    // 64 tokens so bins fill tightly; generic string ids ("doc:chunk")
    // exercise the caller-typed id contract end-to-end
    "pack_chunks_greedy" -> ((s, dir) => {
      val chunks = TextOps.chunkTokens(table(s, dir, "documents"),
          col("text"), col("doc_id"), chunkTokens = 64, overlapTokens = 16)
        .select(concat(col("doc_id").cast(StringType), lit(":"),
          col("chunk_id").cast(StringType)).as("cid"), col("n_tokens"))
      Pack.packGreedy(chunks, col("cid"), col("n_tokens"), seqLen = 256,
          shards = 16, seed = 3L)
        .orderBy("shard", "bin", "doc_id")
    }),

    // the loader-facing manifest of the chopped layout: one row per
    // (document, sequence) segment; segments tile every sequence
    // exactly (PackSpec), so a trainer materializes any sequence by
    // range-reading just the docs listed under it
    "pack_manifest" -> ((s, dir) =>
      Pack.chopManifest(table(s, dir, "documents"), col("doc_id"),
          TextOps.tokenCount(col("text")), seqLen = 2048, shards = 16,
          seed = 3L)
        .orderBy("shard", "seq", "off_in_seq")),

    // padding-waste audit of the greedy layout: per-sequence doc
    // count, fill, and pad — the number a packing job reports
    "pack_utilization" -> ((s, dir) =>
      Pack.greedyUtilization(
        Pack.packGreedy(table(s, dir, "documents"), col("doc_id"),
          TextOps.tokenCount(col("text")), seqLen = 2048, shards = 16,
          seed = 3L),
        seqLen = 2048)
        .orderBy("shard", "bin")),

    // INCREMENTAL chopped packing: chopped layout store built once
    // over doc_id >= 50; the increment's stream continues at each
    // shard's stored token total — oracled with the same window SQL
    // under store-first ordering
    "pack_chopped_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("chopidx", dir)(p =>
        Pack.buildChoppedLayout(docs.filter(col("doc_id") >= 50),
          col("doc_id"), TextOps.tokenCount(col("text")), p,
          seqLen = 2048, shards = 16, seed = 3L))
      Pack.packChoppedAppend(s, store, docs.filter(col("doc_id") < 50),
          col("doc_id"), TextOps.tokenCount(col("text")))
        .orderBy("shard", "seq_first", "off")
    }),

    // INCREMENTAL packing: the layout store built once over
    // doc_id >= 50, the increment (doc_id < 50) folds ONTO each
    // shard's open sequence — continuing the stored fold is exactly
    // "stored corpus first, then increment", so even this stateful
    // indexed twin is FULLY ORACLED (recursive CTE with store-first
    // ordering, filtered to the increment)
    "pack_greedy_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("packidx", dir)(p =>
        Pack.buildGreedyLayout(docs.filter(col("doc_id") >= 50),
          col("doc_id"), TextOps.tokenCount(col("text")), p,
          seqLen = 2048, shards = 16, seed = 3L))
      Pack.packGreedyAppend(s, store, docs.filter(col("doc_id") < 50),
          col("doc_id"), TextOps.tokenCount(col("text")))
        .orderBy("shard", "bin", "doc_id")
    }),

    // PERPLEXITY FILTER (graft.ops.LangModel): add-k bigram NLL of
    // each document under the corpus's own statistics — the KenLM/
    // CCNet-style quality signal, fit+scored in one declarative plan
    "lm_bigram_score" -> ((s, dir) =>
      LangModel.scoreBigram(table(s, dir, "documents"), col("text"),
          col("doc_id"), materialize = eagerPairs)
        .orderBy("doc_id")),

    // interpolated trigram NLL (Jelinek–Mercer λ3/λ2/λ1 with an add-k
    // unigram floor) — the higher-order member of the LM family
    "lm_trigram_score" -> ((s, dir) =>
      LangModel.scoreTrigram(table(s, dir, "documents"), col("text"),
          col("doc_id"), materialize = eagerPairs)
        .orderBy("doc_id")),

    // interpolated KNESER-NEY bigram NLL (fixed discount D=0.75,
    // add-k continuation floor): the distinct-continuation smoothing
    // that add-k and JM lack — a word's backoff mass tracks how many
    // contexts it follows, not how often it occurs. Fully oracled
    // (the statistic tables are plain aggregations of the bigram
    // type table)
    "lm_kn_score" -> ((s, dir) =>
      LangModel.scoreKnBigram(table(s, dir, "documents"), col("text"),
          col("doc_id"), materialize = eagerPairs)
        .orderBy("doc_id")),

    // incremental Kneser-Ney: type table + (T, V) stored once on the
    // trusted slice, the increment scored with the same null-tolerant
    // arithmetic (unseen bigram → backoff mass; unseen history →
    // continuation distribution; unseen word → k/(T+kV) floor)
    "lm_kn_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("knstats", dir)(p =>
        LangModel.buildKnBigramStats(docs.filter(col("doc_id") >= 50),
          col("text"), col("doc_id"), p))
      LangModel.scoreKnBigramAgainst(s, store, docs.filter(col("doc_id") < 50),
          col("text"), col("doc_id"))
        .orderBy("doc_id")
    }),

    // interpolated TRIGRAM Kneser-Ney (Chen & Goodman's interpolated
    // form, D=0.75 per level): the middle level runs on trigram-TYPE
    // continuation counts, the base level is the bigram model's
    // continuation distribution unchanged — fully oracled (every
    // statistic is an aggregation of the two type tables)
    "lm_kn3_score" -> ((s, dir) =>
      LangModel.scoreKnTrigram(table(s, dir, "documents"), col("text"),
          col("doc_id"), materialize = eagerPairs)
        .orderBy("doc_id")),

    // incremental trigram KN: both type tables + (T, V) stored once on
    // the trusted slice; the increment degrades through the same
    // arithmetic level by level (unseen trigram → history backoff,
    // unseen history → middle distribution, unseen middle →
    // continuation floor, unseen word → k/(T+kV))
    "lm_kn3_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("kn3stats", dir)(p =>
        LangModel.buildKnTrigramStats(docs.filter(col("doc_id") >= 50),
          col("text"), col("doc_id"), p))
      LangModel.scoreKnTrigramAgainst(s, store, docs.filter(col("doc_id") < 50),
          col("text"), col("doc_id"))
        .orderBy("doc_id")
    }),

    // INCREMENTAL perplexity: stats fit once on doc_id >= 50 (the
    // trusted-corpus store, CCNet shape), the increment scores against
    // the STORED counts with add-k OOV smoothing — fully oracled
    // (left joins + coalesce reproduce the store-miss arithmetic)
    "lm_bigram_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("lmstats", dir)(p =>
        LangModel.buildBigramStats(docs.filter(col("doc_id") >= 50),
          col("text"), col("doc_id"), p))
      LangModel.scoreBigramAgainst(s, store, docs.filter(col("doc_id") < 50),
          col("text"), col("doc_id"))
        .orderBy("doc_id")
    }),

    // incremental Jelinek-Mercer: trigram stats stored once, the
    // increment scored with graceful per-term store-miss degradation
    // (unseen trigram/bigram slots coalesce to 0, unigram add-k floor)
    "lm_trigram_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("lm3stats", dir)(p =>
        LangModel.buildTrigramStats(docs.filter(col("doc_id") >= 50),
          col("text"), col("doc_id"), p))
      LangModel.scoreTrigramAgainst(s, store, docs.filter(col("doc_id") < 50),
          col("text"), col("doc_id"))
        .orderBy("doc_id")
    }),

    // DSIR IMPORTANCE WEIGHTS (graft.ops.Dsir, public: Xie et al.
    // 2023): hashed unigram∪bigram bucket counts, add-α target-vs-raw
    // log-likelihood ratio per document — target domain = the labeled
    // English slice, raw = the whole corpus. Fully oracled: the md5
    // 4-nibble bucket hash is engine-portable verbatim
    "dsir_logweights" -> ((s, dir) =>
      Dsir.logWeights(table(s, dir, "documents"), col("text"),
          col("doc_id"), col("lang") === "en", materialize = eagerPairs)
        .orderBy("doc_id")),

    // DSIR GUMBEL TOP-N RESAMPLE: selection key = logw/τ + Gumbel
    // noise from the portable md5 uniform — sampling-without-
    // replacement ∝ exp(logw/τ), reproduced exactly by the oracle
    "dsir_resample" -> ((s, dir) =>
      Dsir.resampleTopN(
        Dsir.logWeights(table(s, dir, "documents"), col("text"),
          col("doc_id"), col("lang") === "en", materialize = eagerPairs),
        n = 150, temperature = 2.0, seed = 7L)),

    // INCREMENTAL DSIR: bucket statistics fit once on doc_id >= 50
    // (the reference-corpus store, the CCNet shape), the increment
    // scores against the STORED counts with add-α store-miss
    // smoothing — fully oracled (left join + coalesce reproduces the
    // miss arithmetic)
    "dsir_logweights_indexed" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val store = memoStore("dsirstats", dir)(p =>
        Dsir.buildStats(docs.filter(col("doc_id") >= 50), col("text"),
          col("doc_id"), col("lang") === "en", p))
      Dsir.logWeightsAgainst(s, store, docs.filter(col("doc_id") < 50),
          col("text"), col("doc_id"))
        .orderBy("doc_id")
    }),

    // SEMDEDUP (graft.ops.Similarity.semanticDedup, public: Abbas et
    // al. 2023): k-means-clustered embedding space, within-cluster
    // cosine pairs → connected duplicate groups → one keeper per group
    // by the paper's low-centroid-similarity rule. Rows-only (k-means
    // fit isn't oracle-portable); the funnel arithmetic is oracled by
    // the label-blocked twin below and recall by DedupSpec
    "semdedup_kept" -> ((s, dir) =>
      Similarity.semanticDedup(table(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), nClusters = 16,
          threshold = 0.4, materialize = eagerPairs)
        .orderBy("vec_id")),

    // fully-oracled SemDeDup twin: clusters = the labeled domain
    // column, centroids = 6dp-rounded per-label means — every stage
    // (pair cosine, component closure, centroid cosine, keeper
    // marking) deterministic and reproduced verbatim in DuckDB
    "semdedup_label_exact" -> ((s, dir) =>
      Similarity.semanticDedupByCluster(
          table(s, dir, "embeddings").filter(col("vec_id") < 300),
          col("vec_id"), col("embedding"), col("label"),
          threshold = 0.35, materialize = eagerPairs)
        .orderBy("vec_id")),

    // FEATURE-HASHED TF-IDF (graft.ops.TextOps.hashedTfIdf, the
    // hashing trick + smooth idf): the text→vector bridge, emitted
    // sparse as (doc_id, pos, w) — fully oracled (portable md5
    // bucketing + idf + L2 arithmetic verbatim in DuckDB)
    "text_hash_tfidf" -> ((s, dir) =>
      TextOps.hashedTfIdf(table(s, dir, "documents")
          .filter(col("doc_id") < 100), col("text"), col("doc_id"),
          materialize = eagerPairs)
        .orderBy("doc_id", "pos")),

    // SPARSE ALL-PAIRS SIMILARITY (Similarity.sparseCosinePairs,
    // Bayardo et al. 2007): inverted-index join over the hashed
    // TF-IDF rows — text near-dup pairs with NO embedding model,
    // composed from the oracled sparse form and oracled end to end
    "text_sparse_cosine_pairs" -> ((s, dir) =>
      Similarity.sparseCosinePairs(
          TextOps.hashedTfIdf(table(s, dir, "documents")
            .filter(col("doc_id") < 100), col("text"), col("doc_id"),
            materialize = eagerPairs),
          threshold = 0.85)
        .orderBy("id_a", "id_b")),

    // COMPOSED PIPELINE: DSIR Gumbel resample → greedy sequence
    // packing — the domain-tilted selection flowing straight into a
    // trainer-ready layout, oracled END TO END (the selection CTEs
    // feed the pack fold inside one oracle query)
    "dsir_pack_greedy" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val sel = Dsir.resampleTopN(
        Dsir.logWeights(docs, col("text"), col("doc_id"),
          col("lang") === "en", materialize = eagerPairs),
        n = 150, temperature = 2.0, seed = 7L)
      Pack.packGreedy(docs.join(sel.select("doc_id"), Seq("doc_id")),
          col("doc_id"), TextOps.tokenCount(col("text")), seqLen = 2048,
          shards = 8, seed = 3L)
        .orderBy("shard", "bin", "doc_id")
    }),

    // HARD-NEGATIVE MINING (graft.ops.Similarity.hardNegatives, DPR
    // practice): per anchor, top-k corpus vectors inside a cosine
    // band — similar enough to be hard, under the near-dup ceiling.
    // Fully oracled (banded brute-force arithmetic)
    "mine_hard_negatives" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5),
          k = 10, lo = 0.15, hi = 0.30)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // IVF-PQ composite ANN (graft.ops.Similarity, the FAISS IndexIVFPQ
    // shape): coarse k-means lists + residual PQ codes + the stored
    // exact reconstructed norm, queries ADC-scanning only their
    // probed lists' (m+8)-byte rows from the PERSISTED partition-
    // pruned index, with the refine-by-default 4x exact re-rank (the
    // float corpus handed to the stored path). Rows-only (list/code
    // assignments are engine-local k-means state); recall floors in
    // METRICS.json, stored==inline + reconstruction exactness
    // spec-proven in PqSpec
    "ann_ivfpq_indexed" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val store = memoStore("ivfpq", dir)(p =>
        Similarity.buildIvfPqIndex(emb, p, nlist = 16, m = 16, ks = 16))
      Similarity.ivfPqTopKStored(s, store, emb.filter(col("vec_id") < 5),
          k = 10, nprobe = 6, corpus = emb)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // PQ/ADC ANN (graft.ops.Similarity.pqTopK, public: Jégou et al.
    // 2011): the corpus scanned as 16-byte code rows (16× less
    // bandwidth than float32), each query scoring via its precomputed
    // dot lookup table, then the standard exact refine of the
    // over-fetched candidates. Rows-only: recall + refine measured in
    // PqSpec; the ADC arithmetic is oracled by the firstk twin below
    "ann_pq_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      // refine=8: measured recall@10 0.726 (4x) -> 0.874 (8x) at sf0.1
      // (METRICS.json) for 80 exact re-scores per query — still <'4% of
      // the corpus and far cheaper than the recall-equivalent ADC width
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          refine = 8)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // OPQ-rotated PQ/ADC (graft.ops.Similarity.opqPqTopK, public: Ge
    // et al. 2013/2014, parametric variant): the PCA eigenbasis with
    // eigenvalue-balanced subspace allocation pre-rotates the corpus
    // so the 16 subquantizers carry equal variance — better recall at
    // the same 16-byte code budget. Rows-only: the rotation's
    // orthogonality/cosine-preservation and the recall lift over
    // unrotated PQ are spec- and METRICS-pinned
    "ann_opq_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.opqPqTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          refine = 8)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // IVF-PQ under the OPQ pre-rotation — the composed FAISS
    // "OPQ,IVF,PQ" chain (cosine variant): rotation balances the
    // residual-code subspaces, coarse lists prune, 4x exact refine
    // re-ranks in rotated space. Rows-only; the recall floor lives in
    // METRICS (ann_opq_ivfpq row, above the unrotated ivfpq floor)
    "ann_opq_ivfpq_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.opqIvfPqTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          nlist = 16, nprobe = 6)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // NON-PARAMETRIC OPQ (Ge et al. §4, public): alternating
    // Procrustes/Lloyd refinement of the rotation, seeded from the
    // parametric eigenbasis — driver-side over the bounded fit sample
    // (zero Spark jobs in the alternation), then the same rotated
    // PQ/ADC + refine scan. Rows-only: orthogonality, the monotone
    // sample objective, and the recall ordering on an anisotropic
    // planted corpus are spec- and METRICS-pinned
    "ann_opq_np_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.opqNpPqTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          refine = 8)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // the same scan over a PERSISTED code table (buildPqIndex):
    // spec-proven to reproduce the inline rows exactly
    "ann_pq_indexed" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val store = memoStore("pqidx", dir)(p =>
        Similarity.buildPqIndex(emb, p))
      Similarity.pqTopKStored(s, store, emb.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // PERSISTED OPQ index (buildOpqIndex): the rotation is solved
    // once at build time and stored beside the rotated-corpus PQ
    // codes — the fit-once shape a 100 TB corpus wants (queries and
    // appends pay one mat-vec, never a refit). Spec-proven to
    // reproduce the inline opqPqTopK rows exactly, incl. the refined
    // path (the refine re-ranks in rotated space so the arithmetic
    // matches float-for-float)
    "ann_opq_indexed" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val store = memoStore("opqidx", dir)(p =>
        Similarity.buildOpqIndex(emb, p))
      Similarity.opqPqTopKStored(s, store, emb.filter(col("vec_id") < 5),
          k = 10, refine = 8, corpus = emb)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),

    // fully-oracled ADC twin: the closed-form "firstk" codebook
    // (codeword c = subspace slices of corpus vector c) lets DuckDB
    // derive the IDENTICAL codebook, encoding (argmin-L2, ties to the
    // lower code), lookup tables, and ADC cosine — the kernel
    // arithmetic verified end to end
    "ann_pq_adc_exact_sample" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.pqTopK(emb.filter(col("vec_id") < 200),
          emb.filter(col("vec_id") < 5), k = 10, mode = "firstk")
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parityQueries ++ relationalQueries ++ pipelineQueries ++
      graft.streaming.StreamQueries.queries

  // =====================================================================
  // DuckDB oracles (column names/types must match the Spark side)
  // =====================================================================

  private val minuteAxisDay = "SELECT unnest(generate_series(28401120, 28402559)) AS b"

  /** DuckDB integer value of the first `n` hex digits of SQL
    * expression `h` (a lowercase md5 string) — the portable twin of
    * Spark's `conv(substring(h, 1, n), 16, 10)`, built from the same
    * strpos nibble parse the pack oracles use. */
  /** DuckDB CTE chain canonicalizing `src.url` → `canon(doc_id, url,
    * chost, url_canonical)` — the 1:1 SQL twin of
    * [[graft.ops.Urls.canonicalize]], shared by both url_* oracles. */
  private def urlCanonCteSql(src: String): String =
    s"""s1 AS (SELECT doc_id, url,
           regexp_replace(trim(url), '#.*', '') AS nofrag FROM $src),
         s2 AS (SELECT *,
           lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme0,
           regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest FROM s1),
         s3 AS (SELECT *,
           CASE WHEN scheme0 = '' THEN 'http' ELSE scheme0 END AS scheme,
           regexp_replace(regexp_extract(rest, '^([^/?]*)', 1), '^.*@', '') AS hostport,
           regexp_replace(rest, '^[^/?]*', '') AS pathq FROM s2),
         s4 AS (SELECT *,
           regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)), '\\.$$', '') AS chost,
           regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
           regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$$', '') AS path0,
           regexp_extract(pathq, '\\?(.*)', 1) AS query FROM s3),
         s5 AS (SELECT *, coalesce(array_to_string(list_sort(list_filter(
             string_split(query, '&'),
             x -> x <> '' AND NOT regexp_matches(x,
               '^(utm_[A-Za-z]+|gclid|fbclid|msclkid|ref|ref_src)(=|$$)'))), '&'), '') AS qc
           FROM s4),
         canon AS (SELECT doc_id, url, chost,
           scheme || '://' || chost ||
           (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                  OR (scheme = 'https' AND port = '443')
             THEN '' ELSE ':' || port END) ||
           (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
           (CASE WHEN qc = '' THEN '' ELSE '?' || qc END) AS url_canonical
           FROM s5)"""

  /** DuckDB CASE computing [[graft.ops.Urls.registeredDomain]] of host
    * expression `h` — the IN lists are generated from the SAME Scala
    * constants the engine compiles into its InSet, so the embedded
    * suffix snapshot can never drift between engine and oracle. */
  private def registeredDomainSql(h: String): String = {
    def lst(xs: Seq[String]) = xs.map("'" + _ + "'").mkString(",")
    val two = lst(graft.ops.Urls.MultiPartSuffixes)
    val three = lst(graft.ops.Urls.ThreePartSuffixes)
    val exc2 = lst(graft.ops.Urls.SuffixExceptions.filter(_.count(_ == '.') == 1))
    val exc3 = lst(graft.ops.Urls.SuffixExceptions.filter(_.count(_ == '.') == 2))
    val wild1 = lst(graft.ops.Urls.WildcardSuffixBases.filterNot(_.contains('.')))
    val wild2 = lst(graft.ops.Urls.WildcardSuffixBases.filter(_.count(_ == '.') == 1))
    val t1 = s"regexp_extract($h, '([^.]+)$$', 1)"
    val t2 = s"regexp_extract($h, '([^.]+\\.[^.]+)$$', 1)"
    val t3 = s"regexp_extract($h, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)"
    val t4 = s"regexp_extract($h, '([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$$', 1)"
    s"""CASE WHEN $t3 IN ($exc3) THEN $t3
            WHEN $t2 IN ($exc2) THEN $t2
            WHEN $t2 IN ($wild2)
            THEN (CASE WHEN $t4 <> '' THEN $t4
                       WHEN $t3 <> '' THEN $t3 ELSE $h END)
            WHEN $t1 IN ($wild1)
            THEN (CASE WHEN $t3 <> '' THEN $t3 ELSE $h END)
            WHEN $t3 IN ($three) AND $t4 <> '' THEN $t4
            WHEN $t2 IN ($two) AND $t3 <> '' THEN $t3
            WHEN $t2 = '' THEN $h
            ELSE $t2 END"""
  }

  /** Confusable-fold translate tables, derived from the ONE source of
    * truth ([[graft.functions.Kernels.confusablePairs]]) so the Spark
    * fixture, the kernel, and the DuckDB oracle can never drift:
    * confuse = first lookalike per ASCII letter (the plant direction),
    * fold = every lookalike back to its skeleton. */
  private val (confuseFrom, confuseTo) = {
    val seen = scala.collection.mutable.LinkedHashMap[Int, Int]()
    graft.functions.Kernels.confusablePairs.foreach { case (src, tgt) =>
      if (tgt < 128 && Character.isLetter(tgt) && !seen.contains(tgt))
        seen(tgt) = src
    }
    (seen.keys.map(_.toChar).mkString, seen.values.map(_.toChar).mkString)
  }
  private val foldFrom =
    graft.functions.Kernels.confusablePairs.map(_._1.toChar).mkString
  private val foldTo =
    graft.functions.Kernels.confusablePairs.map(_._2.toChar).mkString
  /** SQL string-literal escape: the fold tables contain the ASCII
    * quote (fullwidth block → !..~). */
  private def sqlLit(s: String): String = s.replace("'", "''")

  /** Shared oracle of the suite-decontamination pair: per-(eval set,
    * doc) word-3-gram overlap vs the %5!=0 train split, over a
    * held-out (%5==0) plus a deliberately leaky (%3==0) set. Used by
    * both decon_suite_ngram and decon_suite_bloom — the bloom gate
    * must have zero semantic footprint. */
  private val deconSuiteSql: String =
    """WITH s AS (SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(generate_series(0, len(toks)-3),
                i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]
                     || ' ' || toks[CAST(i+3 AS INT)]) END AS sh
         FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
               FROM documents)),
       tr AS (SELECT DISTINCT unnest(list_distinct(sh)) AS gram FROM s
              WHERE doc_id % 5 != 0),
       ev AS (SELECT 'holdout' AS eval_set, doc_id FROM documents WHERE doc_id % 5 = 0
              UNION ALL
              SELECT 'leaky' AS eval_set, doc_id FROM documents WHERE doc_id % 3 = 0),
       te AS (SELECT e.eval_set, s.doc_id AS test_id,
                unnest(list_distinct(s.sh)) AS gram
              FROM s JOIN ev e ON s.doc_id = e.doc_id)
       SELECT eval_set, test_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_matched,
         round(CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*), 6) AS contamination
       FROM te LEFT JOIN tr ON te.gram = tr.gram
       GROUP BY 1, 2 ORDER BY 1, 2"""

  private def hexValSql(h: String, n: Int): String =
    (1 to n).map(i =>
      s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1) * ${1L << (4 * (n - i))}")
      .mkString("(", " + ", ")")

  /** Shared CTE chain of the BPE exact-sample oracles: strict
    * (maxBatch=1) BPE training unrolled `n` rounds over the full
    * corpus word table — w/wi/c/s0/sl0 plus per-round
    * p_t/m_t/cand_t/keep_t/sl_t. Per round: the argmax pair over the
    * long-format symbol table, then greedy left-to-right
    * non-overlapping application — candidate positions grouped into
    * runs of consecutive matches (pos - row_number), keeping even
    * offsets from each run head, which IS the left-to-right rule (a
    * freshly merged symbol never re-merges in-pass). MATERIALIZED
    * everywhere: each round references its predecessor 3x and plain
    * CTE inlining goes exponential. Callers prepend "WITH " and
    * append their final SELECT over m1..m`n` / sl`n`. */
  private def bpeTrainSql(n: Int): String = {
    def round(t: Int): String = {
      val p = s"sl${t - 1}"
      s"""p$t AS MATERIALIZED (SELECT s.wid, s.pos, s.sym AS a,
             nx.sym AS b, s.wcount
           FROM $p s JOIN $p nx ON nx.wid = s.wid AND nx.pos = s.pos + 1),
         m$t AS MATERIALIZED (SELECT a, b,
             CAST(sum(wcount) AS BIGINT) AS freq FROM p$t
           GROUP BY 1, 2 ORDER BY freq DESC, a, b LIMIT 1),
         cand$t AS MATERIALIZED (SELECT p.wid, p.pos FROM p$t p, m$t m
           WHERE p.a = m.a AND p.b = m.b),
         keep$t AS MATERIALIZED (SELECT wid, pos FROM
             (SELECT wid, pos, min(pos) OVER (PARTITION BY wid, grp) AS rs
              FROM (SELECT wid, pos,
                  pos - row_number() OVER (PARTITION BY wid ORDER BY pos) AS grp
                FROM cand$t))
           WHERE (pos - rs) % 2 = 0),
         sl$t AS MATERIALIZED (SELECT wid, wcount,
             row_number() OVER (PARTITION BY wid ORDER BY pos) AS pos, sym
           FROM (SELECT s.wid, s.wcount, s.pos,
               CASE WHEN k.pos IS NOT NULL
                 THEN s.sym || (SELECT b FROM m$t) ELSE s.sym END AS sym
             FROM $p s
             LEFT JOIN keep$t k ON s.wid = k.wid AND s.pos = k.pos
             LEFT JOIN keep$t k2 ON s.wid = k2.wid AND s.pos = k2.pos + 1
             WHERE k2.pos IS NULL))"""
    }
    val rounds = (1 to n).map(round).mkString(",\n         ")
    s"""w AS MATERIALIZED (SELECT word, count(*) AS wcount FROM
           (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
            FROM documents) t
           WHERE length(word) > 0 GROUP BY 1),
       wi AS MATERIALIZED (SELECT row_number() OVER (ORDER BY word) AS wid,
           word, wcount FROM w),
       c AS MATERIALIZED (SELECT wid, wcount,
           regexp_split_to_array(word, '') AS ch FROM wi),
       s0 AS MATERIALIZED (SELECT wid, wcount,
           unnest(generate_series(1, len(ch))) AS pos, ch FROM c),
       sl0 AS MATERIALIZED (SELECT wid, wcount, pos, ch[pos] AS sym FROM s0),
       $rounds"""
  }

  /** Shared CTE pair of the graph oracles: `nn` (node count as BIGINT
    * `nb` for the modulus / DOUBLE `nd` for rank arithmetic) and `e`,
    * the portable md5-derived link graph — dst_j = first-8-nibble
    * value of md5("<doc_id>#l<j>") mod N, j = 1..3, self-loops out,
    * parallel edges collapsed; the DuckDB twin of
    * [[graft.ops.Graph.linkGraph]]. */
  /** Deterministic snapshot pair for the incremental-delta queries,
    * derived from the documents table so the oracle can rebuild both
    * sides: OLD = docs not yet crawled removed (doc_id % 13 == 5
    * absent) with %7==0 docs truncated to 40 chars (yesterday's
    * content); NEW = today's crawl (doc_id % 17 == 3 dropped). */
  /** Deterministic raw-URL fixture for the url_* queries: four raw
    * spellings of the logical page keyed by (doc_id%5 → host,
    * doc_id%25 → path and www-prefix), all of which canonicalize to
    * `http://[www.]site<k>.<tld>/page/<p>`. */
  private[graft] def urlFixtureCol: Column = {
    val host = concat(
      when(col("doc_id") % 25 < 5, lit("www.")).otherwise(lit("")),
      lit("site"), (col("doc_id") % 5).cast("string"),
      when((col("doc_id") % 5) % 2 === 0, lit(".co.uk")).otherwise(lit(".com")))
    val p = (col("doc_id") % 25).cast("string")
    val v = col("doc_id") % 4
    when(v === 0, concat(lit("http://"), upper(host), lit("/page/"), p, lit("/")))
      .when(v === 1, concat(lit("HTTP://"), host, lit(":80/page/"), p,
        lit("?utm_source=feed")))
      .when(v === 2, concat(lit("http://user@"), host, lit("/page/"), p,
        lit("#section")))
      .otherwise(concat(host, lit("/page/"), p))
  }

  private[graft] def urlFixture(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), urlFixtureCol.as("url"))

  /** Deterministic full-page HTML fixture for `text_main_content`: the
    * document text split into two `<p>` blocks inside `<main>`,
    * wrapped in the chrome a real crawl page carries — head with
    * style+script, nav menu, header banner, a link-farm related-list
    * on every 4th doc (one entry LONG, so only link density can kill
    * it), an aside ad, an entity-bearing footer — plus an in-content
    * anchor ("the source") that must SURVIVE extraction. */
  private[graft] def htmlPageFixture(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val n = size(words)
    val half = greatest((n.cast(DoubleType) / 2).cast(IntegerType), lit(1))
    val p1 = array_join(slice(words, lit(1), half), " ")
    val p2 = array_join(slice(words, half + 1, greatest(n - half, lit(0))), " ")
    docs.select(col("doc_id"), concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>body{margin:0}</style><script>var x=1;</script></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>"),
      lit("<header><h1>Site "), (col("doc_id") % 7).cast("string"),
      lit("</h1></header><main><p>"), p1,
      lit("</p><p>"), p2, lit(" See also <a href=\"/ref\">the source</a>.</p>"),
      when(col("doc_id") % 4 === 0,
        lit("<ul><li><a href=\"/r1\">Related one: how the spark shuffle works in practice</a></li><li><a href=\"/r2\">Related two</a></li></ul>"))
        .otherwise(lit("")),
      lit("</main><aside><a href=\"/ad\">Sponsored links</a></aside><footer>&copy; 2026 Site <a href=\"/terms\">Terms</a></footer></body></html>"))
      .as("html"))
  }

  /** Deterministic multi-line page fixture for the line-level quality
    * gates (`text_gopher_rules`, `text_c4_clean`): the flat corpus
    * text re-chunked into 4–6-word lines with structure the rules
    * must react to — bullet prefixes (every 7th line), rotating
    * terminal punctuation incl. a no-punct and an ellipsis slot
    * (mod 6), "javascript" insertions (every 13th line), and
    * doc-keyed extra lines (Gopher stopwords, "lorem ipsum", a
    * braced code line, a numeric line, a '#'-heavy line). The oracle
    * SQL re-mints the identical page from the same arithmetic, so
    * fixture and oracle cannot drift. */
  private[graft] def linePageFixture(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), linePageFixtureCol.as("page"))

  private[graft] def linePageFixtureCol: Column = {
    val ws = split(col("text"), " ")
    val nw = size(ws).cast("long")
    val kk = lit(4L) + col("doc_id") % 3
    val nChunks = floor((nw + kk - lit(1L)) / kk).cast("long")
    val d = col("doc_id")
    val lines = transform(sequence(lit(0L), nChunks - 1), i =>
      concat(
        when((d + i) % 7 === 0, lit("- ")).otherwise(lit("")),
        array_join(slice(ws, (i * kk + 1).cast("int"), kk.cast("int")), " "),
        when((d + i) % 13 === 0, lit(" javascript")).otherwise(lit("")),
        when((d + i) % 6 === 0, lit("."))
          .when((d + i) % 6 === 1, lit("!"))
          .when((d + i) % 6 === 2, lit("?"))
          .when((d + i) % 6 === 3, lit("..."))
          .when((d + i) % 6 === 4, lit(""))
          .otherwise(lit("."))))
    val page = concat(
      array_join(lines, "\n"),
      when(d % 3 === 0, lit("\nthat will be of and with the."))
        .otherwise(lit("")),
      when(d % 17 === 0, lit("\nlorem ipsum dolor sit amet."))
        .otherwise(lit("")),
      when(d % 19 === 0, lit("\nfunction() { var x = 1; }."))
        .otherwise(lit("")),
      when(d % 23 === 0, lit("\n12345 67890 11 22 33."))
        .otherwise(lit("")),
      when(d % 29 === 0, lit("\n# header # tags # # #."))
        .otherwise(lit("")))
    page
  }

  /** The page-minting CTE shared verbatim by the `text_gopher_rules`
    * and `text_c4_clean` oracles — the SQL restatement of
    * [[linePageFixture]]'s arithmetic. */
  private[graft] val linePageFixtureSql: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       p AS (SELECT doc_id, ws, len(ws) AS nw, 4 + doc_id % 3 AS k FROM w),
       lns AS (SELECT doc_id,
         list_transform(generate_series(0, (nw + k - 1)//k - 1), i ->
           (CASE WHEN (doc_id + i) % 7 = 0 THEN '- ' ELSE '' END) ||
           array_to_string(list_slice(ws, i*k + 1, least((i+1)*k, nw)), ' ') ||
           (CASE WHEN (doc_id + i) % 13 = 0 THEN ' javascript' ELSE '' END) ||
           (CASE (doc_id + i) % 6 WHEN 0 THEN '.' WHEN 1 THEN '!'
             WHEN 2 THEN '?' WHEN 3 THEN '...' WHEN 4 THEN ''
             ELSE '.' END)) AS lines
         FROM p),
       fix AS (SELECT doc_id,
         array_to_string(lines, chr(10)) ||
         (CASE WHEN doc_id % 3 = 0
            THEN chr(10) || 'that will be of and with the.' ELSE '' END) ||
         (CASE WHEN doc_id % 17 = 0
            THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END) ||
         (CASE WHEN doc_id % 19 = 0
            THEN chr(10) || 'function() { var x = 1; }.' ELSE '' END) ||
         (CASE WHEN doc_id % 23 = 0
            THEN chr(10) || '12345 67890 11 22 33.' ELSE '' END) ||
         (CASE WHEN doc_id % 29 = 0
            THEN chr(10) || '# header # tags # # #.' ELSE '' END) AS page
         FROM lns)"""

  /** Multi-dot abbreviation protection as a DuckDB replace chain —
    * generated from [[graft.ops.TextOps.SentMultiDotAbbrevs]] so the
    * `text_sentences` oracle and the engine share one constant list
    * (each dot becomes chr(1), restored after the split). */
  private[graft] val sentMultiFoldSql: String =
    TextOps.SentMultiDotAbbrevs.foldLeft("s") { (acc, a) =>
      val repl = a.split("\\.").map(p => s"'$p'")
        .mkString(" || chr(1) || ") + " || chr(1)"
      s"replace($acc, '$a', $repl)"
    }

  /** Word-bounded single-abbreviation protection, generated from
    * [[graft.ops.TextOps.SentAbbrevs]] — same shared-constant
    * contract as [[sentMultiFoldSql]]. */
  private[graft] val sentAbbrevFoldSql: String =
    TextOps.SentAbbrevs.foldLeft("s") { (acc, a) =>
      s"regexp_replace($acc, '\\b$a\\.', '$a' || chr(1), 'g')"
    }

  /** The Gopher-rule CTE chain shared by the `text_gopher_rules` and
    * `url_domain_quality` oracles: consumes the `fix` CTE from
    * [[linePageFixtureSql]], ends in `gr` (doc_id, per-rule stats on
    * the 1e-6 floor grid, `gopher_keep`). The required-stopword sum
    * is generated from [[graft.ops.TextOps.gopherStopwords]], so the
    * oracle and the engine share one constant list. */
  private[graft] val gopherRulesCteSql: String =
    s"""g AS (SELECT doc_id, page,
           regexp_split_to_array(trim(page), '\\s+') AS words,
           string_split(page, chr(10)) AS lines FROM fix),
         s AS (SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(greatest(len(words), 1) AS DOUBLE) AS nw,
           length(regexp_replace(page, '\\s+', '', 'g')) AS nonws,
           len(regexp_extract_all(page, '#')) +
             len(regexp_extract_all(page, '\\.\\.\\.')) +
             len(regexp_extract_all(page, '…')) AS nsym,
           CAST(greatest(len(lines), 1) AS DOUBLE) AS nl,
           len(list_filter(lines, l -> regexp_matches(l, '^[-•*]'))) AS nbul,
           len(list_filter(lines,
             l -> regexp_matches(l, '(\\.\\.\\.|…)$$'))) AS nell,
           len(list_filter(words,
             w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
           CAST(${TextOps.gopherStopwords.map(w =>
             s"(CASE WHEN regexp_matches(lower(page), '\\b$w\\b')" +
               " THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT) AS n_req
           FROM g),
         r AS (SELECT doc_id, n_words, n_req,
           floor(CAST(nonws AS DOUBLE) / nw * CAST(1000000 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS mwl,
           floor(CAST(nsym AS DOUBLE) / nw * CAST(1000000 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS swr,
           floor(CAST(nbul AS DOUBLE) / nl * CAST(1000000 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS blf,
           floor(CAST(nell AS DOUBLE) / nl * CAST(1000000 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS elf,
           floor(CAST(nalpha AS DOUBLE) / nw * CAST(1000000 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS awf
           FROM s),
         gr AS (SELECT doc_id, n_words, n_req, mwl, swr, blf, elf, awf,
           CAST((n_words BETWEEN 50 AND 100000
             AND mwl BETWEEN CAST(3 AS DOUBLE) AND CAST(10 AS DOUBLE)
             AND swr <= CAST(0.1 AS DOUBLE)
             AND blf <= CAST(0.9 AS DOUBLE)
             AND elf <= CAST(0.3 AS DOUBLE)
             AND awf >= CAST(0.8 AS DOUBLE)
             AND n_req >= 2) AS INT) AS gopher_keep
           FROM r)"""

  /** Deterministic per-host robots.txt fixture shared by
    * `url_robots_filter` and `url_sitemaps`: even hosts carry a
    * graftbot group that shadows a Disallow-everything star group plus
    * one Sitemap line; odd hosts carry a star-only policy and two
    * Sitemap lines (one lowercase+indented, pinning the (?im)
    * line-anchored extraction). */
  private[graft] def robotsFixture(docs: DataFrame): DataFrame = {
    val evenRobots = "# crawl policy\nUser-agent: graftbot\n" +
      "Disallow: /private\nAllow: /private/ok\n\n" +
      "User-agent: *\nDisallow: /\n" +
      "Sitemap: https://cdn.example/sitemap-even.xml\n"
    val oddRobots = "User-agent: *\nDisallow: /tmp\nAllow: /tmp/keep\n" +
      "Sitemap: https://cdn.example/sitemap-odd.xml\n" +
      "  sitemap: https://cdn.example/sitemap-odd-2.xml\n"
    docs.select((col("doc_id") % 5).as("k")).distinct()
      .select(concat(lit("site"), col("k").cast("string"),
          lit(".example")).as("host"),
        when(col("k") % 2 === 0, lit(evenRobots))
          .otherwise(lit(oddRobots)).as("robots_txt"))
  }

  /** Per-language marker phrases for the `langid_nb_eval` fixture —
    * the corpus text is language-independent soup, so the fixture
    * appends genuine orthography keyed by the labeled lang; the
    * oracle's CASE is generated from this SAME map, so fixture and
    * oracle cannot drift. */
  private[graft] val LangPhrases: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog and reads the morning news with great interest",
    "de" -> "der schnelle braune fuchs springt über den faulen hund und liest die morgenzeitung mit großem interesse",
    "fr" -> "le rapide renard brun saute par dessus le chien paresseux et lit le journal du matin avec grand intérêt",
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso y lee las noticias de la mañana con gran interés",
    "zh" -> "敏捷的棕色狐狸跳过懒惰的狗并且饶有兴趣地阅读早晨的新闻报纸")

  private[graft] def langMarkedDocs(docs: DataFrame): DataFrame = {
    val phrase = LangPhrases.foldLeft(lit("")) { case (acc, (l, p)) =>
      when(col("lang") === l, lit(p)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"),
      concat(col("text"), lit(" "), phrase).as("mtext"))
  }

  private def langPhraseSql(langCol: String): String =
    "CASE " + langCol + " " + LangPhrases.map {
      case (l, p) => s"WHEN '$l' THEN '$p'"
    }.mkString(" ") + " ELSE '' END"

  /** Robots policies for the hosts the `url_sitemap_entries` urlset
    * locs live on (w0..w6.example) — `url_frontier_gated` composes
    * them with the parsed frontier. Even hosts: one wildcard deep-page
    * Disallow. Odd hosts: Disallow-everything, a specificity-ranked
    * wildcard re-Allow, and a longer wildcard Disallow out-ranking it
    * — the same verdicts through opposite rule mechanics. */
  private[graft] def frontierRobotsFixture(docs: DataFrame): DataFrame = {
    val even = "User-agent: *\nDisallow: /p/*/sub\n"
    val odd = "User-agent: *\nDisallow: /\nAllow: /p/*$\nDisallow: /p/*/sub*\n"
    docs.select((col("doc_id") % 7).as("k")).distinct()
      .select(concat(lit("w"), col("k").cast("string"),
          lit(".example")).as("host"),
        when(col("k") % 2 === 0, lit(even)).otherwise(lit(odd))
          .as("robots_txt"))
  }

  /** Deterministic crawl-delay robots fixture for `url_crawl_delay` —
    * four policy shapes keyed by host id k (doc_id%4): k=0 a graftbot
    * group whose LAST of two delays wins while a star delay is
    * shadowed; k=1 star-only with an invalid value before the valid
    * one (and a case-variant key); k=2 a graftbot group with rules
    * but NO delay, shadowing a star delay (→ NULL); k=3 no delay
    * anywhere (→ NULL). */
  private[graft] def crawlDelayFixture(docs: DataFrame): DataFrame = {
    val r0 = "User-agent: graftbot\nCrawl-delay: 1.5\nDisallow: /x\n" +
      "Crawl-delay: 2.5\n\nUser-agent: *\nCrawl-delay: 10\n"
    val r1 = "User-agent: *\nCrawl-delay: fast\ncrawl-delay: 0.5\n"
    val r2 = "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 7\n"
    val r3 = "User-agent: *\nDisallow: /tmp\n"
    docs.select((col("doc_id") % 4).as("k")).distinct()
      .select(concat(lit("delay"), col("k").cast("string"),
          lit(".example")).as("host"),
        when(col("k") === 0, lit(r0)).when(col("k") === 1, lit(r1))
          .when(col("k") === 2, lit(r2)).otherwise(lit(r3)).as("robots_txt"))
  }

  /** Deterministic wildcard-rule robots fixture for
    * `url_robots_wildcards`: even hosts carry the RFC 9309 special-
    * character idioms (a query-string Disallow with a mid-rule `*`,
    * a `$`-anchored wildcard Allow overriding a directory Disallow,
    * and a bare `$`-anchored Disallow); odd hosts carry percent-
    * encoded rules (a literal-space rule and a UTF-8-escaped one)
    * that must match raw-space / raw-UTF-8 URL spellings through the
    * canonical percent-encoding. */
  private[graft] def robotsWildcardFixture(docs: DataFrame): DataFrame = {
    val even = "User-agent: *\nDisallow: /*?sid=\nAllow: /p/*.html$\n" +
      "Disallow: /p/\nDisallow: /dl$\n"
    val odd = "User-agent: *\nDisallow: /a b\nDisallow: /caf%c3%a9\n"
    docs.select((col("doc_id") % 2).as("k")).distinct()
      .select(concat(lit("wild"), col("k").cast("string"),
          lit(".example")).as("host"),
        when(col("k") === 0, lit(even)).otherwise(lit(odd)).as("robots_txt"))
  }

  /** Per-host robots policies for `url_frontier_next`, covering every
    * host class the link fixture's outlinks land on: site hosts block
    * /squote and declare a 2s delay, the cdn blocks /lib2/ with a
    * 0.5s delay, ext1 blocks /UP (the uppercase absolute anchor's
    * canonical path), and the other ext hosts allow everything with
    * no delay (→ the scheduler's 1s default). */
  private[graft] def frontierNextRobotsFixture(docs: DataFrame): DataFrame = {
    val sites = docs.select((col("doc_id") % 5).as("k")).distinct()
      .select(concat(lit("site"), col("k").cast("string"),
          lit(".example")).as("host"),
        lit("User-agent: *\nDisallow: /squote\nCrawl-delay: 2\n")
          .as("robots_txt"))
    val exts = docs.select((col("doc_id") % 3).as("k")).distinct()
      .select(concat(lit("ext"), col("k").cast("string"),
          lit(".example")).as("host"),
        when(col("k") === 1, lit("User-agent: *\nDisallow: /UP\n"))
          .otherwise(lit("User-agent: *\nAllow: /\n")).as("robots_txt"))
    val cdn = docs.select(lit("cdn.example").as("host"),
      lit("User-agent: *\nDisallow: /lib2/\nCrawl-delay: 0.5\n")
        .as("robots_txt")).distinct()
    sites.union(exts).union(cdn)
  }

  /** Deterministic sentence-segmentation fixture for
    * `text_sentences`: per doc, a paragraph exercising every split
    * rule — plain declarative/exclamation/question sentences, a
    * protected-abbreviation sentence (Dr., Mr., e.g., p.m., Jan.)
    * with a decimal number, a terminator inside closing quotes (even
    * docs), an ellipsis followed by a CAPITAL (every 3rd doc — must
    * split) and by a lowercase continuation (every 5th — must NOT),
    * and an unterminated tail. The oracle re-mints the page and
    * restates the whole split pipeline in SQL. */
  private[graft] def sentencePageFixture(docs: DataFrame): DataFrame = {
    val w = element_at(split(col("text"), " "), 1)
    val d = col("doc_id")
    docs.select(d.as("doc_id"), concat(
      lit("Intro "), w, lit(" opens. Then two! Three? "),
      lit("Dr. "), w, lit(" met Mr. Jones e.g. at 3.14 p.m. on Jan. 5. "),
      when(d % 2 === 0, lit("Quoted \"End.\" Follows now. "))
        .otherwise(lit("")),
      when(d % 3 === 0, lit("Wait... Then go. ")).otherwise(lit("")),
      when(d % 5 === 0, lit("Ellipsis trails... and continues here. "))
        .otherwise(lit("")),
      lit("Tail without terminator")).as("page"))
  }

  /** Deterministic outlink-page fixture for `url_link_extract` and
    * `url_domain_graph`: per doc, a base URL two directories deep
    * (`https://site<k>.example/a/b/page<p>.html`) and an HTML body
    * carrying one anchor per reference class — absolute, scheme-
    * relative (×2 on even docs, so n_links > n_pages on the cdn
    * edge), root-relative with `&amp;` in the query, `../`, `./`,
    * bare relative, an UPPERCASE absolute (every 9th doc), query-only
    * (even docs), fragment-only (every 3rd), mailto/javascript
    * (dropped; every 6th/7th), an over-popping `../../../` (every
    * 11th), and a single-quoted attribute (every 4th, extracted after
    * the double-quoted ones). The oracle restates every kept
    * (href, resolved) pair closed-form per class. */
  private[graft] def linkPageFixture(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val k = (d % 5).cast("string")
    val p = (d % 25).cast("string")
    val base = concat(lit("https://site"), k, lit(".example/a/b/page"), p,
      lit(".html"))
    val html = concat(
      lit("<html><body><a href=\"https://ext"), (d % 3).cast("string"),
      lit(".example/abs/"), p, lit("\"><b>Bold</b>  anchor</a>"),
      lit("<a href=\"//cdn.example/lib/"), (d % 4).cast("string"),
      lit("\">y</a>"),
      when(d % 2 === 0, concat(lit("<a href=\"//cdn.example/lib2/"), p,
        lit("\">y2</a>"))).otherwise(lit("")),
      lit("<a href=\"/root/item?id="), p,
      lit("&amp;utm_source=feed\">Q&amp;A link</a>"),
      lit("<a href=\"../up/"), (d % 7).cast("string"), lit("\">u</a>"),
      lit("<a href=\"./same/"), (d % 5).cast("string"), lit("\">s</a>"),
      lit("<a href=\"plain/rel"), (d % 3).cast("string"), lit("\">r</a>"),
      when(d % 9 === 0, lit("<a href=\"HTTPS://EXT1.EXAMPLE/UP\">U</a>"))
        .otherwise(lit("")),
      when(d % 2 === 0, concat(lit("<a href=\"?page="), p, lit("\">q</a>")))
        .otherwise(lit("")),
      when(d % 3 === 0, lit("<a href=\"#frag\">f</a>")).otherwise(lit("")),
      when(d % 6 === 0, lit("<a href=\"mailto:team@example.test\">m</a>"))
        .otherwise(lit("")),
      when(d % 7 === 0, lit("<a href=\"javascript:void(0)\">j</a>"))
        .otherwise(lit("")),
      when(d % 11 === 0, concat(lit("<a href=\"../../../deep/"), p,
        lit("\">dd</a>"))).otherwise(lit("")),
      when(d % 4 === 0, concat(lit("<a class='c' href='/squote/"),
        (d % 6).cast("string"), lit("'>sq</a>"))).otherwise(lit("")),
      lit("</body></html>"))
    docs.select(d.as("doc_id"), base.as("base_url"), html.as("html"))
  }

  /** Deterministic exotic-suffix host fixture for `url_exotic_domains`:
    * suffix keyed by doc_id%12 (two-label ccSLDs, bare gTLDs, two
    * THREE-label suffixes, a wildcard ccTLD and a wildcard Japanese
    * city domain, and the exception hosts that override both
    * wildcards), site name by doc_id%7, and a "shop." subdomain on
    * every third doc so deeper hosts occur for every suffix class —
    * including bare-wildcard-suffix hosts that must pass through as
    * themselves. */
  private[graft] def exoticUrlFixture(docs: DataFrame): DataFrame = {
    val suffix = element_at(array(
      lit("com.sg"), lit("co.nz"), lit("com.hk"), lit("k12.ca.us"),
      lit("co.uk"), lit("com"), lit("vic.edu.au"), lit("org"),
      lit("ck"), lit("www.ck"), lit("kawasaki.jp"), lit("city.kawasaki.jp")),
      (col("doc_id") % 12 + 1).cast("int"))
    val host = concat(
      when(col("doc_id") % 3 === 0, lit("shop.")).otherwise(lit("")),
      lit("site"), (col("doc_id") % 7).cast("string"), lit("."), suffix)
    docs.select(col("doc_id"),
      concat(lit("https://"), host, lit("/p/"),
        (col("doc_id") % 11).cast("string")).as("url"))
  }

  private[graft] def snapshotPair(docs: DataFrame): (DataFrame, DataFrame) = {
    val old = docs.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, substring(col("text"), 1, 40))
          .otherwise(col("text")).as("text"))
    val neu = docs.filter(col("doc_id") % 17 =!= 3)
    (old, neu)
  }

  /** Shared snapshot CTEs of the three delta oracles. */
  private val snapshotCte: String =
    """o AS (SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN substr(text, 1, 40) ELSE text END AS text
         FROM documents WHERE doc_id % 13 <> 5),
       nw AS (SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 17 <> 3),
       j AS (SELECT coalesce(o.doc_id, nw.doc_id) AS id,
           md5(o.text) AS old_fp, md5(nw.text) AS new_fp
         FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id),
       cls AS (SELECT id,
           CASE WHEN old_fp IS NULL THEN 'added'
                WHEN new_fp IS NULL THEN 'removed'
                WHEN old_fp <> new_fp THEN 'changed'
                ELSE 'unchanged' END AS status, old_fp, new_fp
         FROM j)"""

  /** The 2^-30 dyadic rank quantizer of the PageRank oracle — the SQL
    * twin of `Graph.quant`. */
  private def prQuant(x: String): String =
    s"floor(($x) * 1073741824.0 + 0.5) / 1073741824.0"

  /** One PageRank update in oracle SQL: base + d·(contrib + dang/N),
    * with the same double literal arithmetic Spark's plan evaluates
    * ((1.0 − 0.85) computed IN double — a DuckDB 0.15 decimal literal
    * is a different double). */
  private def prStep(c: String, d: String): String =
    s"""(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.nd
        + CAST(0.85 AS DOUBLE) * (coalesce($c.c, 0) + $d.dang / nn.nd)"""

  private val linkGraphCte: String = {
    val arms = (1 to 3).map { j =>
      s"""SELECT CAST(doc_id AS BIGINT) AS src,
          ${hexValSql(s"md5(CAST(doc_id AS VARCHAR) || '#l$j')", 8)}
            % (SELECT nb FROM nn) AS dst FROM documents"""
    }.mkString("\n           UNION ALL ")
    s"""nn AS (SELECT count(*) AS nb, CAST(count(*) AS DOUBLE) AS nd
             FROM documents),
         e AS (SELECT DISTINCT src, dst FROM (
           $arms) WHERE src <> dst)"""
  }

  /** Shared CTE chain of the two DSIR oracles: hashed unigram∪bigram
    * bucket counts (4-nibble md5 bucket, B=4096), add-α target/raw
    * log-ratio per document — `w` = (doc_id, n_grams, logw). */
  private val dsirWeightsCte: String =
    s"""toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
           FROM documents),
         uni AS (SELECT doc_id, unnest(t) AS g FROM toks),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS g FROM big0),
         grams AS (SELECT doc_id, g FROM uni
           UNION ALL SELECT doc_id, g FROM big),
         d AS (SELECT doc_id, ${hexValSql("md5(g)", 4)} % 4096 AS b,
             count(*) AS c
           FROM grams GROUP BY 1, 2),
         fl AS (SELECT doc_id, (lang = 'en') AS is_t FROM documents),
         gb AS (SELECT b, sum(c) AS cr,
             sum(CASE WHEN is_t THEN c ELSE 0 END) AS ct
           FROM d JOIN fl USING (doc_id) GROUP BY 1),
         tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM gb),
         w AS (SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_grams,
             round(sum(d.c * (ln((gb.ct + 0.25) / (tot.nt + 0.25 * 4096))
                            - ln((gb.cr + 0.25) / (tot.nr + 0.25 * 4096)))),
               6) AS logw
           FROM d JOIN gb USING (b) CROSS JOIN tot GROUP BY 1)"""

  def oracleSql: Map[String, String] = Map(

    "ts_count_minute" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/60) AS BIGINT)*60 AS i_time,
         round(sum(value), 6) AS value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_count_decimal_hour" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS value_c
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_gauge_hour" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         arg_max(value, CAST(floor(epoch(ts)/60) AS BIGINT)*100000000 + event_id) AS value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_set_card_hour" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         count(DISTINCT value) AS value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_histogram_daily" ->
      """SELECT event_type AS name,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS i_time,
         value AS v, count(*) AS cnt
         FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""",

    "ts_series_transforms_hour" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         round(avg(value), 6) AS t_mean,
         count(*) AS t_count,
         min(value) AS t_min,
         max(value) AS t_max,
         round(sum(value), 6) AS t_sum,
         round(count(*)/3600.0, 6) AS t_rate
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_fine_hour_minute" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         CAST(floor(epoch(ts)/60) AS BIGINT)*60 AS r_time,
         round(sum(value), 6) AS value
         FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""",

    "ts_series_dense_day" ->
      s"""WITH axis AS ($minuteAxisDay),
         d AS (SELECT CAST(floor(epoch(ts)/60) AS BIGINT) AS b, sum(value) AS v
               FROM events WHERE event_type='click' GROUP BY 1)
         SELECT axis.b*60 AS i_time, round(coalesce(d.v, 0.0), 6) AS value
         FROM axis LEFT JOIN d USING(b) ORDER BY 1""",

    // fine+condense output is SPARSE (only extant interval buckets), per
    // sql_backend.py:236-247 + the condense loop over extant keys
    "ts_condense_month" ->
      """SELECT CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         round(sum(value), 6) AS value
         FROM events WHERE event_type='view'
           AND CAST(floor(epoch(ts)/3600) AS BIGINT) BETWEEN 473352 AND 474071
         GROUP BY 1 ORDER BY 1""",

    "ts_collapse_month" ->
      """SELECT 1704067200 AS i_time, round(sum(value), 6) AS value
         FROM events WHERE event_type='purchase'
         AND CAST(floor(epoch(ts)/60) AS BIGINT) BETWEEN 28401120 AND 28444319""",

    "ts_join_day" ->
      s"""WITH axis AS ($minuteAxisDay),
         d AS (SELECT CAST(floor(epoch(ts)/60) AS BIGINT) AS b, sum(value) AS v
               FROM events WHERE event_type IN ('click','view') GROUP BY 1)
         SELECT axis.b*60 AS i_time, round(coalesce(d.v, 0.0), 6) AS value
         FROM axis LEFT JOIN d USING(b) ORDER BY 1""",

    "ts_iterate_minute" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts)/60) AS BIGINT) AS b, value
                    FROM events WHERE event_type='error'),
         bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM e),
         axis AS (SELECT unnest(generate_series((SELECT b0 FROM bounds), (SELECT b1 FROM bounds))) AS b),
         d AS (SELECT b, sum(value) AS v FROM e GROUP BY 1)
         SELECT axis.b*60 AS i_time, round(coalesce(d.v, 0.0), 6) AS value
         FROM axis LEFT JOIN d USING(b) ORDER BY 1""",

    "ts_fetch_hook_minute" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts)/60) AS BIGINT) AS b, value,
                    event_id FROM events WHERE event_type='error'),
         bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM e),
         axis AS (SELECT unnest(generate_series((SELECT b0 FROM bounds), (SELECT b1 FROM bounds))) AS b),
         d AS (SELECT b, sum(value) AS v FROM e WHERE event_id % 2 = 0 GROUP BY 1)
         SELECT axis.b*60 AS i_time, round(coalesce(d.v, 0.0), 6) AS value
         FROM axis LEFT JOIN d USING(b) ORDER BY 1""",

    "ts_fanout_after3" ->
      """SELECT event_type AS name,
         (CAST(floor(epoch(ts)/60) AS BIGINT) + off.o)*60 AS i_time,
         round(sum(value), 6) AS value
         FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS o) off
         GROUP BY 1,2 ORDER BY 1,2""",

    "ts_expire_day" ->
      """WITH mx AS (SELECT CAST(floor(epoch(max(ts))/60) AS BIGINT) AS nb FROM events)
         SELECT event_type AS name,
         CAST(floor(epoch(ts)/60) AS BIGINT)*60 AS i_time,
         round(sum(value), 6) AS value
         FROM events, mx
         WHERE CAST(floor(epoch(ts)/60) AS BIGINT) > mx.nb - 1440
         GROUP BY 1,2 ORDER BY 1,2""",

    "ts_properties_minute" ->
      """SELECT event_type AS name,
         min(CAST(floor(epoch(ts)/60) AS BIGINT))*60 AS first,
         max(CAST(floor(epoch(ts)/60) AS BIGINT))*60 AS last
         FROM events GROUP BY 1 ORDER BY 1""",

    "ts_list" ->
      "SELECT DISTINCT event_type AS name FROM events ORDER BY 1",

    "ts_gregorian_weekly" ->
      """SELECT event_type AS name,
         CAST(strftime(ts, '%Y%U') AS BIGINT) AS bucket,
         round(sum(value), 6) AS value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_gregorian_daily_count" ->
      """SELECT event_type AS name,
         CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS bucket,
         round(CAST(count(*) AS DOUBLE), 6) AS value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_condense_variance" ->
      """SELECT CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         round(var_pop(value), 6) AS value
         FROM events WHERE event_type='click'
           AND CAST(floor(epoch(ts)/3600) AS BIGINT) BETWEEN 473352 AND 474071
         GROUP BY 1 ORDER BY 1""",

    "ts_join_intersect_hour" ->
      """WITH axis AS (SELECT unnest(generate_series(473352, 474071)) AS b),
         c AS (SELECT DISTINCT CAST(floor(epoch(ts)/3600) AS BIGINT) AS b, value
               FROM events WHERE event_type='click'),
         v AS (SELECT DISTINCT CAST(floor(epoch(ts)/3600) AS BIGINT) AS b, value
               FROM events WHERE event_type='view'),
         d AS (SELECT b, count(*) AS n
               FROM (SELECT * FROM c INTERSECT SELECT * FROM v) GROUP BY 1)
         SELECT axis.b*3600 AS i_time, CAST(coalesce(d.n, 0) AS BIGINT) AS n_common
         FROM axis LEFT JOIN d USING(b) ORDER BY 1""",

    "ts_set_string_hour" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         count(DISTINCT 'u' || CAST(user_id AS VARCHAR)) AS n_vals,
         min('u' || CAST(user_id AS VARCHAR)) AS min_v,
         max('u' || CAST(user_id AS VARCHAR)) AS max_v
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_gauge_string_hour" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
         arg_max('u' || CAST(user_id AS VARCHAR), event_id) || '!' AS value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_gregorian_yearly" ->
      """SELECT event_type AS name,
         CAST(strftime(ts, '%Y') AS BIGINT) AS bucket,
         round(sum(value), 6) AS value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "ts_delete_name" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/60) AS BIGINT)*60 AS i_time,
         round(sum(value), 6) AS value
         FROM events WHERE event_type <> 'click'
         GROUP BY 1,2 ORDER BY 1,2""",

    "ts_write_ttl_minute" ->
      """WITH mx AS (SELECT CAST(floor(epoch(max(ts))/60) AS BIGINT) AS nb FROM events)
         SELECT event_type AS name,
         CAST(floor(epoch(ts)/60) AS BIGINT)*60 AS i_time,
         round(sum(value), 6) AS value
         FROM events, mx
         WHERE CAST(floor(epoch(ts)/60) AS BIGINT) >= mx.nb - 1440
         GROUP BY 1,2 ORDER BY 1,2""",

    "dedup_contain_exact_sample" ->
      """WITH g AS (SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(length(t)-7, 1)),
             i -> substring(t, CAST(i AS INT), 8))) AS grams
           FROM (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
                 FROM documents WHERE doc_id < 300))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / least(len(a.grams), len(b.grams)), 6) AS containment
         FROM g a JOIN g b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / least(len(a.grams), len(b.grams)) >= 0.4
         ORDER BY 1, 2""",

    "dedup_ngram_exact_sample" ->
      """WITH g AS (SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(length(t)-2, 1)),
             i -> substring(t, CAST(i AS INT), 3))) AS grams
           FROM (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
                 FROM documents WHERE doc_id < 300))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
         FROM g a JOIN g b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
         ORDER BY 1,2""",

    "text_doc_heuristics" ->
      """WITH b AS (SELECT doc_id,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS ns,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy,
           greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS w,
           len(regexp_extract_all(text, '[{}();=<>\[\]]')) AS sym,
           len(regexp_extract_all(lower(text),
             '\b(?:def|class|return|import|if|else|for|while|var|val|function)\b'))
             AS kw
           FROM documents)
         SELECT doc_id, CAST(ns AS BIGINT) AS n_sent,
           CAST(sy AS BIGINT) AS n_syll,
           floor((CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(ns AS DOUBLE))
               - CAST(84.6 AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)))
             * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(10000 AS DOUBLE) AS flesch,
           CAST(sym AS BIGINT) AS n_sym, CAST(kw AS BIGINT) AS n_kw
         FROM b ORDER BY doc_id""",

    "dedup_rate_by_source" ->
      """WITH r AS (SELECT source, doc_id,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents),
         g AS (SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           FROM r GROUP BY 1)
         SELECT source, n_docs, n_kept,
           floor(CAST(n_docs - n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE)
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS dup_rate
         FROM g ORDER BY source""",

    "corpus_effective_tokens" ->
      """WITH h AS (SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS nt,
           md5(text) AS hh FROM documents),
         r AS (SELECT doc_id, nt,
           row_number() OVER (PARTITION BY hh ORDER BY doc_id) AS rn
           FROM h)
         SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique_docs,
           CAST(sum(nt) AS BIGINT) AS raw_tokens,
           CAST(sum(CASE WHEN rn = 1 THEN nt ELSE 0 END) AS BIGINT)
             AS effective_tokens,
           CAST(sum(nt) - sum(CASE WHEN rn = 1 THEN nt ELSE 0 END) AS BIGINT)
             AS dup_token_mass
         FROM r""",

    "sample_cap_per_source" ->
      """WITH r AS (SELECT source, doc_id,
           row_number() OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR) || '#42'), doc_id)
             AS pick_rank
           FROM documents)
         SELECT source, doc_id, CAST(pick_rank AS BIGINT) AS pick_rank
         FROM r WHERE pick_rank <= 5 ORDER BY source, pick_rank""",

    "corpus_datasheet" ->
      """SELECT count(*) AS n_docs,
         CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS n_tokens,
         CAST(sum(length(text)) AS BIGINT) AS n_chars,
         count(DISTINCT lang) AS n_langs,
         count(DISTINCT source) AS n_sources,
         count(*) - count(DISTINCT md5(text)) AS n_exact_dups,
         CAST(sum(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_short,
         floor(CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE)
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / CAST(1000000 AS DOUBLE) AS mean_tokens
         FROM documents""",

    "ann_mmr_select" -> {
      def cos(a: String, b: String): String =
        s"""(list_sum(list_transform(list_zip($a, $b),
              q -> CAST(q[1] AS DOUBLE) * q[2]))
           / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * x)))
              * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * x)))))"""
      // λ-combination quantized by the luck-free floor, mirroring
      // Similarity.mmrSelect exactly (see its 5th-decimal-half note)
      def stepScore(prev: Seq[Int]): String = {
        val maxSim = prev.map(i =>
          s"round(${cos("sc.embedding", s"w$i.embedding")}, 4)")
          .reduce((a, b) => s"greatest($a, $b)")
        s"""floor((CAST(0.7 AS DOUBLE) * sc.rel
             - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * ($maxSim))
             * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / CAST(10000 AS DOUBLE)"""
      }
      val steps = (2 to 5).map { s =>
        val prev = 1 until s
        val crosses = prev.map(i => s"CROSS JOIN w$i").mkString(" ")
        val notIn = prev.map(i => s"w$i.id").mkString(", ")
        s"""sc$s AS (SELECT sc.id, sc.embedding,
              ${stepScore(prev)} AS score
              FROM sc $crosses WHERE sc.id NOT IN ($notIn)),
           w$s AS (SELECT id, embedding, score FROM sc$s
              ORDER BY score DESC, id LIMIT 1)"""
      }.mkString(",\n         ")
      s"""WITH e AS (SELECT vec_id AS id, embedding FROM embeddings),
         cx AS (SELECT generate_subscripts(embedding, 1) AS p,
                unnest(embedding) AS x FROM e),
         cent AS (SELECT p, round(avg(CAST(x AS DOUBLE)), 6) AS m
                  FROM cx GROUP BY 1),
         cv AS (SELECT list(m ORDER BY p) AS c FROM cent),
         sc AS (SELECT e.id, e.embedding,
                round(${cos("e.embedding", "cv.c")}, 4) AS rel
                FROM e CROSS JOIN cv),
         w1 AS (SELECT id, embedding, rel AS score FROM sc
                ORDER BY rel DESC, id LIMIT 1),
         $steps
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS sel_rank, id, score FROM w1
           UNION ALL SELECT 2, id, score FROM w2
           UNION ALL SELECT 3, id, score FROM w3
           UNION ALL SELECT 4, id, score FROM w4
           UNION ALL SELECT 5, id, score FROM w5)
         ORDER BY sel_rank"""
    },

    "audit_dup_text_embedding" ->
      """WITH s AS (SELECT doc_id,
           CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
                ELSE list_transform(generate_series(0, len(toks)-2),
                  i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]) END AS sh
           FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                 FROM documents WHERE doc_id < 300)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         j AS (SELECT p.id_a, p.id_b, p.jac,
           round(list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
                   q -> CAST(q[1] AS DOUBLE) * q[2]))
             / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * x)))
                * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * x)))),
               4) AS cos
           FROM p JOIN embeddings ea ON ea.vec_id = p.id_a
           JOIN embeddings eb ON eb.vec_id = p.id_b)
         SELECT id_a, id_b, round(jac, 6) AS jaccard, cos,
           cos >= 0.35 AS consistent
         FROM j ORDER BY 1, 2""",

    "dedup_snm_pairs" ->
      """WITH k AS (SELECT doc_id, lower(substr(trim(text), 1, 24)) AS key
           FROM documents),
         r AS (SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS rnk
           FROM k),
         cand AS (SELECT a.doc_id AS da, b.doc_id AS db FROM r a JOIN r b
           ON b.rnk > a.rnk AND b.rnk <= a.rnk + 9),
         s AS (SELECT doc_id,
           CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
                ELSE list_transform(generate_series(0, len(toks)-2),
                  i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]) END AS sh
           FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                 FROM documents)),
         j AS (SELECT least(da, db) AS id_a, greatest(da, db) AS id_b,
           CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
           FROM cand JOIN s a ON a.doc_id = cand.da
           JOIN s b ON b.doc_id = cand.db)
         SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j
         WHERE jac >= 0.3 ORDER BY 1, 2""",

    "dedup_shingle_exact_sample" ->
      """WITH s AS (SELECT doc_id,
           CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
                ELSE list_transform(generate_series(0, len(toks)-2),
                  i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]) END AS sh
           FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                 FROM documents WHERE doc_id < 300))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3
         ORDER BY 1,2""",

    "ts_gregorian_monthly_rate" ->
      """SELECT event_type AS name,
         CAST(strftime(date_trunc('month', ts), '%Y%m') AS BIGINT) AS bucket,
         round(sum(value) / (epoch(date_trunc('month', ts) + INTERVAL 1 MONTH)
           - epoch(date_trunc('month', ts))), 6) AS rate
         FROM events GROUP BY 1, date_trunc('month', ts) ORDER BY 1,2""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_extendedprice), 6) AS avg_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY 1,2 ORDER BY 1,2""",

    "q3_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY 1,2,3
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "events_top_users" ->
      """SELECT user_id, round(sum(value), 6) AS total
         FROM events GROUP BY 1 ORDER BY total DESC, user_id LIMIT 20""",

    "events_asof_attrib" ->
      """WITH p AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
                    FROM events WHERE event_type = 'purchase'),
              v AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                           max(value) AS view_value
                    FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.sec, v.view_value
         FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.sec >= v.sec
         ORDER BY p.event_id""",

    "events_range_correlate" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS x
                    FROM events WHERE event_type = 'click'),
              e AS (SELECT event_id AS error_id, user_id,
                           CAST(floor(epoch(ts)) AS BIGINT) - 7200 AS lo,
                           CAST(floor(epoch(ts)) AS BIGINT) + 7200 AS hi
                    FROM events WHERE event_type = 'error')
         SELECT c.click_id, e.error_id, c.user_id
         FROM c JOIN e ON c.user_id = e.user_id AND c.x BETWEEN e.lo AND e.hi
         ORDER BY 1, 2""",

    "profile_key_skew" ->
      s"""SELECT ${hexValSql("md5(CAST(user_id AS VARCHAR))", 4)} % 32
           AS bucket, count(*) AS n_rows
         FROM events GROUP BY 1 ORDER BY 1""",

    "events_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
         SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, ev.day) AS INT) AS day_offset,
           count(DISTINCT ev.user_id) AS n_users
         FROM ev JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "events_sessionize" ->
      """WITH o AS (SELECT user_id, event_id, value,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
              l AS (SELECT *, lag(sec) OVER
                      (PARTITION BY user_id ORDER BY sec, event_id) AS prev FROM o),
              s AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL OR sec - prev > 1800
                                            THEN 1 ELSE 0 END) OVER
                      (PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS session_idx
                    FROM l)
         SELECT user_id, session_idx, count(*) AS n_events,
                min(sec) AS start_sec, max(sec) AS end_sec,
                round(sum(value), 6) AS total_value
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    "events_funnel" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
              w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN sec END) OVER
                       (PARTITION BY user_id ORDER BY sec, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r0
                     FROM o),
              w2 AS (SELECT *, min(CASE WHEN event_type = 'click'
                                         AND r0 IS NOT NULL AND sec >= r0
                                        THEN sec END) OVER
                       (PARTITION BY user_id ORDER BY sec, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1
                     FROM w1),
              w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                                         AND r1 IS NOT NULL AND sec >= r1
                                        THEN sec END) OVER
                       (PARTITION BY user_id ORDER BY sec, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
                     FROM w2)
         SELECT user_id, min(r0) AS t_view, min(r1) AS t_click,
                min(r2) AS t_purchase,
                (CASE WHEN min(r0) IS NOT NULL THEN 1 ELSE 0 END
                 + CASE WHEN min(r0) IS NOT NULL AND min(r1) IS NOT NULL
                        THEN 1 ELSE 0 END
                 + CASE WHEN min(r0) IS NOT NULL AND min(r1) IS NOT NULL
                         AND min(r2) IS NOT NULL THEN 1 ELSE 0 END) AS depth
         FROM w3 GROUP BY 1 ORDER BY 1""",

    "decontaminate_ngram" ->
      """WITH s AS (SELECT doc_id,
           CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                ELSE list_transform(generate_series(0, len(toks)-3),
                  i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]
                       || ' ' || toks[CAST(i+3 AS INT)]) END AS sh
           FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                 FROM documents)),
         tr AS (SELECT DISTINCT unnest(list_distinct(sh)) AS gram FROM s
                WHERE doc_id % 5 != 0),
         te AS (SELECT doc_id AS test_id, unnest(list_distinct(sh)) AS gram FROM s
                WHERE doc_id % 5 = 0)
         SELECT test_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched,
           round(CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS contamination
         FROM te LEFT JOIN tr ON te.gram = tr.gram
         GROUP BY 1 ORDER BY 1""",

    "decon_suite_ngram" -> deconSuiteSql,

    // identical SQL: the suite bloom gate is a plan optimization with
    // no semantic footprint, the same property decon_bloom_gated pins
    "decon_suite_bloom" -> deconSuiteSql,

    // identical SQL to decontaminate_ngram: the bloom gate is a plan
    // optimization with no semantic footprint (no false negatives +
    // exact verify join), and THAT is the property under test
    "decon_bloom_gated" ->
      """WITH s AS (SELECT doc_id,
           CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                ELSE list_transform(generate_series(0, len(toks)-3),
                  i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]
                       || ' ' || toks[CAST(i+3 AS INT)]) END AS sh
           FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                 FROM documents)),
         tr AS (SELECT DISTINCT unnest(list_distinct(sh)) AS gram FROM s
                WHERE doc_id % 5 != 0),
         te AS (SELECT doc_id AS test_id, unnest(list_distinct(sh)) AS gram FROM s
                WHERE doc_id % 5 = 0)
         SELECT test_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched,
           round(CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS contamination
         FROM te LEFT JOIN tr ON te.gram = tr.gram
         GROUP BY 1 ORDER BY 1""",

    "bloom_words" ->
      """WITH pos AS (SELECT
           (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
              || '#1:' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)) % 4096 AS p
           FROM documents CROSS JOIN (SELECT unnest(range(3)) AS i) u)
         SELECT p // 32 AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
         FROM pos GROUP BY 1 ORDER BY 1""",

    "fuzzy_name_pairs_exact_sample" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer
           WHERE c_custkey < 300)
         SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
         FROM c a JOIN c b ON a.id < b.id
         WHERE levenshtein(a.s, b.s) <= 2
         ORDER BY id_a, id_b""",

    "fuzzy_name_indexed" ->
      """WITH old AS (SELECT c_custkey AS id, c_name AS s FROM customer
           WHERE c_custkey < 300),
         nw AS (SELECT c_custkey AS id, c_name AS s FROM customer
           WHERE c_custkey >= 300 AND c_custkey < 400),
         no_ AS (SELECT least(a.id, b.id) AS id_a,
             greatest(a.id, b.id) AS id_b,
             CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
           FROM nw a JOIN old b ON true
           WHERE levenshtein(a.s, b.s) <= 2),
         nn AS (SELECT a.id AS id_a, b.id AS id_b,
             CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
           FROM nw a JOIN nw b ON a.id < b.id
           WHERE levenshtein(a.s, b.s) <= 2)
         SELECT id_a, id_b, dist FROM no_
         UNION SELECT id_a, id_b, dist FROM nn
         ORDER BY id_a, id_b""",

    "cms_token_freq" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(lower(trim(text)),
             '\s+')) AS token FROM documents),
         rows_ AS (SELECT unnest(range(4)) AS r),
         cells AS (SELECT r,
             (CAST(concat('0x', substr(md5(token || '#2:'
                || CAST(r AS VARCHAR)), 1, 15)) AS BIGINT)) % 2048 AS c,
             count(*) AS n
           FROM tok CROSS JOIN rows_ GROUP BY 1, 2),
         top AS (SELECT token, count(*) AS n_true FROM tok GROUP BY 1
                 ORDER BY n_true DESC, token LIMIT 50)
         SELECT t.token, t.n_true, min(coalesce(cl.n, 0)) AS est
         FROM top t CROSS JOIN rows_ u
         LEFT JOIN cells cl ON cl.r = u.r AND cl.c =
           (CAST(concat('0x', substr(md5(t.token || '#2:'
              || CAST(u.r AS VARCHAR)), 1, 15)) AS BIGINT)) % 2048
         GROUP BY 1, 2 ORDER BY n_true DESC, token""",

    "classify_nb_score" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         tok AS (SELECT doc_id, y, unnest(toks) AS token FROM d),
         trc AS (SELECT token, sum(y) AS c1, sum(1.0 - y) AS c0
                 FROM tok WHERE doc_id % 5 != 0 GROUP BY 1),
         tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0,
                        CAST(count(*) AS DOUBLE) AS v FROM trc),
         pri AS (SELECT sum(y) AS d1, sum(1.0 - y) AS d0 FROM d
                 WHERE doc_id % 5 != 0),
         w AS (SELECT token,
                 ln((c1 + 0.5) / (n1 + 0.5 * v)) -
                 ln((c0 + 0.5) / (n0 + 0.5 * v)) AS w FROM trc, tot),
         meta AS (SELECT ln(d1) - ln(d0) AS intercept,
                    ln(0.5 / (n1 + 0.5 * v)) - ln(0.5 / (n0 + 0.5 * v))
                      AS w_oov FROM tot, pri),
         tc AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS n
                FROM tok WHERE doc_id % 5 = 0 GROUP BY 1, 2),
         sc AS (SELECT tc.doc_id, sum(tc.n) AS nt,
                  max(meta.intercept) +
                    sum(tc.n * coalesce(w.w, meta.w_oov)) AS s
                FROM tc LEFT JOIN w ON tc.token = w.token
                CROSS JOIN meta GROUP BY tc.doc_id)
         SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
           round(s, 6) AS score,
           round(1.0 / (1.0 + exp(-s)), 6) AS prob,
           CAST(CASE WHEN s >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
         FROM sc ORDER BY doc_id""",

    "classify_nb_calibration" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         tok AS (SELECT doc_id, y, unnest(toks) AS token FROM d),
         trc AS (SELECT token, sum(y) AS c1, sum(1.0 - y) AS c0
                 FROM tok WHERE doc_id % 5 != 0 GROUP BY 1),
         tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0,
                        CAST(count(*) AS DOUBLE) AS v FROM trc),
         pri AS (SELECT sum(y) AS d1, sum(1.0 - y) AS d0 FROM d
                 WHERE doc_id % 5 != 0),
         w AS (SELECT token,
                 ln((c1 + 0.5) / (n1 + 0.5 * v)) -
                 ln((c0 + 0.5) / (n0 + 0.5 * v)) AS w FROM trc, tot),
         meta AS (SELECT ln(d1) - ln(d0) AS intercept,
                    ln(0.5 / (n1 + 0.5 * v)) - ln(0.5 / (n0 + 0.5 * v))
                      AS w_oov FROM tot, pri),
         tc AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS n
                FROM tok WHERE doc_id % 5 = 0 GROUP BY 1, 2),
         sc AS (SELECT tc.doc_id,
                  max(meta.intercept) +
                    sum(tc.n * coalesce(w.w, meta.w_oov)) AS s
                FROM tc LEFT JOIN w ON tc.token = w.token
                CROSS JOIN meta GROUP BY tc.doc_id),
         sc2 AS (SELECT doc_id, round(1.0 / (1.0 + exp(-s)), 6) AS prob
                 FROM sc),
         yb AS (SELECT sc2.doc_id, sc2.prob,
                  CASE WHEN d2.lang = 'en' THEN 1 ELSE 0 END AS y
                FROM sc2 JOIN documents d2 USING (doc_id)),
         b AS (SELECT CAST(least(floor(prob * 10), 9) AS BIGINT) AS bucket,
                 count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
               FROM yb GROUP BY 1)
         SELECT bucket, n, pos,
           floor(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS obs_rate,
           (CAST(bucket AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(10 AS DOUBLE) AS mid
         FROM b ORDER BY bucket""",

    "classify_nb_lang_confusion" ->
      """WITH d AS (SELECT doc_id, lang,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         tok AS (SELECT doc_id, lang, unnest(toks) AS token FROM d),
         trc AS (SELECT lang AS cls, token, CAST(count(*) AS DOUBLE) AS ctc
                 FROM tok WHERE doc_id % 5 != 0 GROUP BY 1, 2),
         ct AS (SELECT cls, sum(ctc) AS nc FROM trc GROUP BY 1),
         vocab AS (SELECT DISTINCT token FROM trc),
         vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
         nd AS (SELECT CAST(count(*) AS DOUBLE) AS ndocs FROM d
                WHERE doc_id % 5 != 0),
         meta AS (SELECT lang AS cls,
             ln(CAST(count(*) AS DOUBLE) / (SELECT ndocs FROM nd)) AS prior
           FROM d WHERE doc_id % 5 != 0 GROUP BY 1),
         mo AS (SELECT cls, ln(0.5 / (nc + 0.5 * (SELECT v FROM vv)))
                  AS w_oov FROM ct),
         dense AS (SELECT v2.token, c.cls,
             ln((coalesce(t.ctc, 0) + 0.5) /
                (c.nc + 0.5 * (SELECT v FROM vv))) AS w
           FROM vocab v2 CROSS JOIN ct c
           LEFT JOIN trc t ON t.cls = c.cls AND t.token = v2.token),
         tc AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS n
                FROM tok WHERE doc_id % 5 = 0 GROUP BY 1, 2),
         sc AS (SELECT tc.doc_id, mo.cls,
             sum(tc.n * coalesce(dense.w, mo.w_oov)) AS s
           FROM tc CROSS JOIN mo
           LEFT JOIN dense ON dense.cls = mo.cls AND dense.token = tc.token
           GROUP BY 1, 2),
         fin AS (SELECT sc.doc_id, sc.cls,
             row_number() OVER (PARTITION BY sc.doc_id
               ORDER BY sc.s + meta.prior DESC, sc.cls) AS rk
           FROM sc JOIN meta ON meta.cls = sc.cls),
         pred AS (SELECT doc_id, cls AS pred FROM fin WHERE rk = 1)
         SELECT d.lang, p.pred, count(*) AS n
         FROM pred p JOIN d ON d.doc_id = p.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "langid_nb_eval" ->
      s"""WITH d AS (SELECT doc_id, lang,
             lower(trim(text || ' ' || ${langPhraseSql("lang")})) AS t
           FROM documents),
         gi AS (SELECT doc_id, lang, t,
             unnest(generate_series(1, greatest(length(t) - 2, 1))) AS i
           FROM d),
         tok AS (SELECT doc_id, lang, substr(t, i, 3) AS token FROM gi
                 WHERE length(t) >= 3),
         trc AS (SELECT lang AS cls, token, CAST(count(*) AS DOUBLE) AS ctc
                 FROM tok WHERE doc_id % 5 != 0 GROUP BY 1, 2),
         ct AS (SELECT cls, sum(ctc) AS nc FROM trc GROUP BY 1),
         vocab AS (SELECT DISTINCT token FROM trc),
         vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
         nd AS (SELECT CAST(count(*) AS DOUBLE) AS ndocs FROM d
                WHERE doc_id % 5 != 0),
         meta AS (SELECT lang AS cls,
             ln(CAST(count(*) AS DOUBLE) / (SELECT ndocs FROM nd)) AS prior
           FROM d WHERE doc_id % 5 != 0 GROUP BY 1),
         mo AS (SELECT cls, ln(0.5 / (nc + 0.5 * (SELECT v FROM vv)))
                  AS w_oov FROM ct),
         dense AS (SELECT v2.token, c.cls,
             ln((coalesce(t.ctc, 0) + 0.5) /
                (c.nc + 0.5 * (SELECT v FROM vv))) AS w
           FROM vocab v2 CROSS JOIN ct c
           LEFT JOIN trc t ON t.cls = c.cls AND t.token = v2.token),
         tc AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS n
                FROM tok WHERE doc_id % 5 = 0 GROUP BY 1, 2),
         sc AS (SELECT tc.doc_id, mo.cls,
             sum(tc.n * coalesce(dense.w, mo.w_oov)) AS s
           FROM tc CROSS JOIN mo
           LEFT JOIN dense ON dense.cls = mo.cls AND dense.token = tc.token
           GROUP BY 1, 2),
         fin AS (SELECT sc.doc_id, sc.cls,
             row_number() OVER (PARTITION BY sc.doc_id
               ORDER BY sc.s + meta.prior DESC, sc.cls) AS rk
           FROM sc JOIN meta ON meta.cls = sc.cls),
         pred AS (SELECT doc_id, cls AS pred FROM fin WHERE rk = 1)
         SELECT d.lang, p.pred, count(*) AS n
         FROM pred p JOIN d ON d.doc_id = p.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "classify_nb_eval" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         tok AS (SELECT doc_id, y, unnest(toks) AS token FROM d),
         trc AS (SELECT token, sum(y) AS c1, sum(1.0 - y) AS c0
                 FROM tok WHERE doc_id % 5 != 0 GROUP BY 1),
         tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0,
                        CAST(count(*) AS DOUBLE) AS v FROM trc),
         pri AS (SELECT sum(y) AS d1, sum(1.0 - y) AS d0 FROM d
                 WHERE doc_id % 5 != 0),
         w AS (SELECT token,
                 ln((c1 + 0.5) / (n1 + 0.5 * v)) -
                 ln((c0 + 0.5) / (n0 + 0.5 * v)) AS w FROM trc, tot),
         meta AS (SELECT ln(d1) - ln(d0) AS intercept,
                    ln(0.5 / (n1 + 0.5 * v)) - ln(0.5 / (n0 + 0.5 * v))
                      AS w_oov FROM tot, pri),
         tc AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS n
                FROM tok WHERE doc_id % 5 = 0 GROUP BY 1, 2),
         sc AS (SELECT tc.doc_id, max(meta.intercept) +
                    sum(tc.n * coalesce(w.w, meta.w_oov)) AS s
                FROM tc LEFT JOIN w ON tc.token = w.token
                CROSS JOIN meta GROUP BY tc.doc_id),
         ev AS (SELECT CASE WHEN s >= 0 THEN 1 ELSE 0 END AS p,
                  CAST(d.y AS INT) AS yy
                FROM sc JOIN d ON sc.doc_id = d.doc_id),
         cf AS (SELECT
             CAST(sum(CASE WHEN yy = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN yy = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN yy = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN yy = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
           FROM ev)
         SELECT tp, fp, fn, tn,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy,
           round(CASE WHEN tp + fp = 0 THEN 0.0
                      ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS "precision",
           round(CASE WHEN tp + fn = 0 THEN 0.0
                      ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall,
           round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                      ELSE CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END, 6)
             AS f1
         FROM cf""",

    "events_rolling_features" ->
      """WITH o AS (SELECT user_id, event_id, value,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
         SELECT user_id, event_id,
           round(lag(value) OVER w, 6) AS prev_value,
           round(value - lag(value) OVER w, 6) AS delta,
           round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS roll_mean,
           round(min(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS roll_min,
           round(max(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS roll_max,
           CAST(row_number() OVER w AS BIGINT) AS seq
         FROM o
         WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
         ORDER BY user_id, seq""",

    "ts_anomaly_hour" ->
      """WITH h AS (SELECT event_type AS name,
                    CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
                    sum(value) AS v
             FROM events GROUP BY 1,2)
         SELECT name, i_time, round(v, 6) AS value,
           round(avg(v) OVER f, 6) AS base_mean,
           round(stddev_samp(v) OVER f, 6) AS base_std,
           round(CASE WHEN count(v) OVER f = 24 AND stddev_samp(v) OVER f > 0
                 THEN (v - avg(v) OVER f) / (stddev_samp(v) OVER f) END, 6) AS z,
           CAST(coalesce(
             abs(CASE WHEN count(v) OVER f = 24 AND stddev_samp(v) OVER f > 0
                 THEN (v - avg(v) OVER f) / (stddev_samp(v) OVER f) END) >= 3.0,
             false) AS BIGINT) AS is_anomaly
         FROM h
         WINDOW f AS (PARTITION BY name ORDER BY i_time
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
         ORDER BY 1, 2""",

    "ts_seasonal_anomaly_hour" ->
      """WITH h AS (SELECT event_type AS name,
                    CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS i_time,
                    sum(value) AS v
             FROM events GROUP BY 1,2)
         SELECT name, i_time, i_time % 86400 AS phase,
           round(v, 6) AS value,
           round(avg(v) OVER f, 6) AS base_mean,
           round(stddev_samp(v) OVER f, 6) AS base_std,
           round(CASE WHEN count(v) OVER f = 5 AND stddev_samp(v) OVER f > 0
                 THEN (v - avg(v) OVER f) / (stddev_samp(v) OVER f) END, 6) AS z,
           CAST(coalesce(
             abs(CASE WHEN count(v) OVER f = 5 AND stddev_samp(v) OVER f > 0
                 THEN (v - avg(v) OVER f) / (stddev_samp(v) OVER f) END) >= 2.5,
             false) AS BIGINT) AS is_anomaly
         FROM h
         WINDOW f AS (PARTITION BY name, i_time % 86400 ORDER BY i_time
                      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
         ORDER BY 1, 2""",

    "ts_interpolate_minute" ->
      """WITH axis AS (SELECT unnest(generate_series(28401120, 28402559)) AS b),
         d AS (SELECT CAST(floor(epoch(ts)/60) AS BIGINT) AS b,
                      arg_max(value, event_id) AS v
               FROM events WHERE event_type='error' GROUP BY 1),
         g AS (SELECT axis.b, d.v FROM axis LEFT JOIN d USING(b)),
         w AS (SELECT b, v,
           last_value(v IGNORE NULLS) OVER wb AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
             OVER wb AS pt,
           first_value(v IGNORE NULLS) OVER wf AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
             OVER wf AS nt
           FROM g
           WINDOW wb AS (ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  wf AS (ORDER BY b
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         SELECT 'error' AS name, b*60 AS i_time, round(v, 6) AS value,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                      THEN pv + (nv - pv) * (b - pt) / CAST(nt - pt AS DOUBLE)
                 END, 6) AS filled,
           CAST((v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS BIGINT)
             AS interpolated
         FROM w ORDER BY 2""",

    "embed_label_centroids" ->
      """SELECT label, g.pos AS pos,
           round(avg(CAST(embedding[g.pos] AS DOUBLE)), 6) AS centroid,
           count(*) AS n
         FROM embeddings, generate_series(1, 64) AS g(pos)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // population covariance, uncentered-moment formula to mirror the
    // engine's one-pass aggregate: E[xy] - E[x]E[y] (float products
    // exact in double; the two formulations differ ~1e-15, far below
    // the 1e-6 rounding)
    "embed_covariance_sample" ->
      """WITH v AS (SELECT vec_id, embedding AS e FROM embeddings WHERE vec_id < 300
           AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         idx AS (SELECT unnest(generate_series(1, 64)) AS p),
         xs AS (SELECT vec_id, p, CAST(e[CAST(p AS INT)] AS DOUBLE) AS x FROM v, idx),
         mu AS (SELECT p, sum(x)/count(*) AS m FROM xs GROUP BY 1),
         c AS (SELECT a.p AS i, b.p AS j,
                 sum(a.x * b.x)/count(*) - ma.m * mb.m AS cov
               FROM xs a JOIN xs b USING (vec_id)
               JOIN mu ma ON ma.p = a.p JOIN mu mb ON mb.p = b.p
               WHERE a.p <= b.p
               GROUP BY 1, 2, ma.m, mb.m)
         SELECT CAST(i - 1 AS BIGINT) AS i, CAST(j - 1 AS BIGINT) AS j,
           round(cov, 6) AS cov
         FROM c ORDER BY 1, 2""",

    // trace and Frobenius norm of the population covariance — the
    // spectral invariants Σλ / Σλ², no eigensolver needed SQL-side
    "embed_pca_spectrum" ->
      """WITH idx AS (SELECT unnest(generate_series(1, 64)) AS p),
         xs AS (SELECT vec_id, p, CAST(embedding[CAST(p AS INT)] AS DOUBLE) AS x
                FROM embeddings, idx WHERE len(embedding) = 64
                  AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         mu AS (SELECT p, sum(x)/count(*) AS m FROM xs GROUP BY 1),
         c AS (SELECT a.p AS i, b.p AS j,
                 sum(a.x * b.x)/count(*) - ma.m * mb.m AS cov
               FROM xs a JOIN xs b USING (vec_id)
               JOIN mu ma ON ma.p = a.p JOIN mu mb ON mb.p = b.p
               WHERE a.p <= b.p
               GROUP BY 1, 2, ma.m, mb.m)
         SELECT round(sum(CASE WHEN i = j THEN cov ELSE 0 END), 6) AS trace,
           round(sum(CASE WHEN i = j THEN cov*cov ELSE 2*cov*cov END), 6)
             AS frobenius_sq,
           (SELECT count(*) FROM embeddings WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> x IS NULL)) = 0) AS n
         FROM c""",

    // the whiten invariant is a CLOSED FORM: cov(whitened) = I and
    // mean(whitened) = 0 by construction, independent of the
    // engine-local eigenbasis — the oracle states identity/zero
    // directly and only reads the corpus for n (well-formed rows)
    "embed_pca_whiten" ->
      """WITH d AS (SELECT unnest(generate_series(0, 15)) AS p),
         nn AS (SELECT count(*) AS n FROM embeddings WHERE len(embedding) = 64
           AND len(list_filter(embedding, x -> x IS NULL)) = 0)
         SELECT CAST(a.p AS BIGINT) AS i, CAST(b.p AS BIGINT) AS j,
           CAST(CASE WHEN a.p = b.p THEN 1.0 ELSE 0.0 END AS DOUBLE) AS cov,
           CAST(0.0 AS DOUBLE) AS mu, nn.n AS n
         FROM d a, d b, nn WHERE a.p <= b.p ORDER BY 1, 2""",

    "embed_pca_whiten_indexed" ->
      """WITH d AS (SELECT unnest(generate_series(0, 15)) AS p),
         nn AS (SELECT count(*) AS n FROM embeddings WHERE len(embedding) = 64
           AND len(list_filter(embedding, x -> x IS NULL)) = 0)
         SELECT CAST(a.p AS BIGINT) AS i, CAST(b.p AS BIGINT) AS j,
           CAST(CASE WHEN a.p = b.p THEN 1.0 ELSE 0.0 END AS DOUBLE) AS cov,
           CAST(0.0 AS DOUBLE) AS mu, nn.n AS n
         FROM d a, d b, nn WHERE a.p <= b.p ORDER BY 1, 2""",

    "embed_label_drift" ->
      """WITH c AS (SELECT label, g.pos,
             round(avg(CAST(embedding[g.pos] AS DOUBLE)), 6) AS v,
             count(*) AS n
           FROM embeddings, generate_series(1, 64) AS g(pos) GROUP BY 1, 2),
         lv AS (SELECT label, list(v ORDER BY pos) AS cv,
             CAST(max(n) AS BIGINT) AS n FROM c GROUP BY 1),
         gx AS (SELECT g.pos,
             round(avg(CAST(embedding[g.pos] AS DOUBLE)), 6) AS m
           FROM embeddings, generate_series(1, 64) AS g(pos) GROUP BY 1),
         gv AS (SELECT list(m ORDER BY pos) AS c FROM gx)
         SELECT label, n,
           round(list_sum(list_transform(list_zip(lv.cv, gv.c),
               q -> CAST(q[1] AS DOUBLE) * q[2]))
             / (sqrt(list_sum(list_transform(lv.cv, x -> CAST(x AS DOUBLE) * x)))
                * sqrt(list_sum(list_transform(gv.c, x -> CAST(x AS DOUBLE) * x)))),
             4) AS drift_cos
         FROM lv CROSS JOIN gv ORDER BY label""",

    "embed_centroid_assign" ->
      """WITH c AS (SELECT label, g.pos,
              round(avg(CAST(embedding[g.pos] AS DOUBLE)), 6) AS v
            FROM embeddings, generate_series(1, 64) AS g(pos) GROUP BY 1, 2),
         cv AS (SELECT label AS pred_label, list(v ORDER BY pos) AS cvec
                FROM c GROUP BY 1),
         s AS (SELECT e.vec_id, e.label, cv.pred_label,
                 round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              cv.cvec), 6) AS cos
               FROM embeddings e CROSS JOIN cv),
         r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, pred_label) AS rk FROM s)
         SELECT vec_id, label, pred_label, cos FROM r WHERE rk = 1
         ORDER BY vec_id""",

    "events_value_winsorized" ->
      """WITH c AS (SELECT event_type AS name,
           floor(quantile_cont(value, 0.05) * CAST(1000000 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS lo,
           floor(quantile_cont(value, 0.95) * CAST(1000000 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS hi
           FROM events GROUP BY 1),
         j AS (SELECT e.event_type AS name, e.value, c.lo, c.hi,
           greatest(c.lo, least(c.hi, e.value)) AS w
           FROM events e JOIN c ON e.event_type = c.name)
         SELECT name, round(avg(w), 6) AS wins_mean,
           round(avg(value), 6) AS raw_mean,
           CAST(sum(CASE WHEN value > hi OR value < lo THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clipped,
           count(*) AS n
         FROM j GROUP BY 1 ORDER BY 1""",

    "events_value_quantiles" ->
      """SELECT event_type AS name,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(avg(value), 6) AS mean, count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",

    "search_bm25" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
         dl AS (SELECT doc_id, len(t) AS dl FROM toks),
         stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         tf AS (SELECT term, doc_id, count(*) AS tf FROM
                  (SELECT doc_id, unnest(t) AS term FROM toks)
                WHERE term IN ('customer', 'vector', 'slow') GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         scored AS (SELECT tf.doc_id,
             sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
                 * tf.tf * 2.2
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS s
           FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
           GROUP BY 1)
         SELECT doc_id, round(s, 6) AS score FROM scored
         ORDER BY round(s, 6) DESC, doc_id LIMIT 50""",

    "dedup_paragraph_prune" ->
      """WITH d AS (SELECT doc_id,
           substr(text, 1, 60) || chr(10) || chr(10)
             || 'subscribe to our newsletter today' || chr(10) || chr(10)
             || 'visit doc number ' || CAST(doc_id AS VARCHAR) AS t
           FROM documents),
         pp AS (SELECT doc_id, s['idx'] AS idx, s['para'] AS para FROM
           (SELECT doc_id, unnest(list_transform(generate_series(1, len(arr)),
              i -> {'idx': i, 'para': arr[CAST(i AS INT)]})) AS s
            FROM (SELECT doc_id, regexp_split_to_array(t, '\n\s*\n') AS arr
                  FROM d))),
         b AS (SELECT para FROM (SELECT DISTINCT doc_id, para FROM pp)
               GROUP BY para HAVING count(*) >= 10)
         SELECT pp.doc_id,
           coalesce(string_agg(CASE WHEN b.para IS NULL THEN pp.para END,
             chr(10) || chr(10) ORDER BY pp.idx), '') AS cleaned,
           count(*) AS n_paras,
           CAST(sum(CASE WHEN b.para IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned
         FROM pp LEFT JOIN b ON pp.para = b.para
         GROUP BY 1 ORDER BY 1""",

    "mix_epoch_upsample" ->
      """WITH d AS (SELECT doc_id, source,
           CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                       ELSE 1.25 END AS f,
           md5(CAST(doc_id AS VARCHAR) || '#0') AS h
         FROM documents),
         e AS (SELECT doc_id, source, g.epoch
               FROM d CROSS JOIN generate_series(1, 3) AS g(epoch)
               WHERE g.epoch <= ceil(f)
                 AND (g.epoch <= floor(f)
                  OR h < CASE source
                           WHEN 'src0' THEN '80000000000000000000000000000000'
                           WHEN 'src1' THEN '00000000000000000000000000000000'
                           ELSE '40000000000000000000000000000000' END))
         SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM e
         ORDER BY doc_id, epoch""",

    "sample_bernoulli_portable" ->
      s"""SELECT doc_id FROM documents
         WHERE md5(CAST(doc_id AS VARCHAR) || '#42') <
           '${graft.ops.Mix.hexThreshold(0.25)}'
         ORDER BY doc_id""",

    // the A-Res weighted draw end to end: UNROUNDED quality weight
    // (bit-identical IEEE ops; its rounded form is hash-proven by
    // text_langid_quality), 52-bit md5 uniform, ln-score on a
    // 6-decimal grid with doc_id tiebreak
    "sample_quality_weighted_portable" ->
      s"""WITH t0 AS (SELECT doc_id, text,
           regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
         t AS (SELECT doc_id,
           least(length(text)/500.0, 1.0)*0.25
             + (len(regexp_replace(text, '[^A-Za-z]', '', 'g'))/greatest(length(text), 1))*0.35
             + least((len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'], x)))
                 / greatest(len(toks), 1))*5.0, 1.0)*0.2
             + CASE WHEN (length(regexp_replace(text, '\\s+', '', 'g'))/greatest(len(toks), 1))
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END*0.2 AS q
           FROM t0),
         s AS (SELECT doc_id,
           round(ln((${hexValSql("md5(CAST(doc_id AS VARCHAR) || '#42')", 13)} + 1)
             / 4503599627370496.0) / q, 6) AS score
           FROM t WHERE q > 0)
         SELECT doc_id FROM (SELECT doc_id FROM s ORDER BY score DESC, doc_id LIMIT 200)
         ORDER BY doc_id""",

    "sample_stratified_portable" ->
      s"""SELECT doc_id, source FROM documents
         WHERE md5(CAST(doc_id AS VARCHAR) || '#42') <
           CASE source
             WHEN 'src0' THEN '${graft.ops.Mix.hexThreshold(0.05)}'
             WHEN 'src1' THEN '${graft.ops.Mix.hexThreshold(0.5)}'
             ELSE '${graft.ops.Mix.hexThreshold(0.25)}' END
         ORDER BY doc_id""",

    // the Morton interleave, rebuilt bit by bit: a's bit k lands at
    // position 2k+1, b's at 2k (inputs < 2^31, so bits 0..30 suffice)
    "layout_zorder_keys" ->
      """SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 31), k ->
             (((doc_id >> k) & 1) << (2*k + 1)) +
             (((n_chars >> k) & 1) << (2*k)))) AS BIGINT) AS z
         FROM documents ORDER BY doc_id""",

    // the 3-dim interleave, rebuilt bit by bit: dim d of 3 lands at
    // position 3k + (2-d), 21 bits each (inputs < 2^21)
    "layout_zorder3_keys" ->
      """SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 21), k ->
             (((doc_id >> k) & 1) << (3*k + 2)) +
             (((n_chars >> k) & 1) << (3*k + 1)) +
             (((((doc_id * 31 + 7) % 997) >> k) & 1) << (3*k)))) AS BIGINT)
             AS z
         FROM documents ORDER BY doc_id""",

    "pack_chopped" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR) || '#3') AS h FROM documents),
         s AS (SELECT doc_id, n_tokens, h,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
              strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 16 AS shard
           FROM d WHERE n_tokens > 0),
         c AS (SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
           FROM s)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_first,
           CAST(floor((cum - 1) / 2048.0) AS BIGINT) AS seq_last,
           (cum - n_tokens) % 2048 AS off
         FROM c ORDER BY shard, seq_first, off""",

    "pack_greedy" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, n_tokens, h,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
              strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 16 AS shard
           FROM (SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens,
               md5(CAST(doc_id AS VARCHAR) || '#3') AS h FROM documents)
           WHERE n_tokens > 0),
         r AS (SELECT doc_id, n_tokens, h, shard,
             row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
           FROM d),
         f AS (
           SELECT doc_id, shard, rn, n_tokens,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM r WHERE rn = 1
           UNION ALL
           SELECT r.doc_id, r.shard, r.rn, r.n_tokens,
             CASE WHEN f.fill + r.n_tokens <= 2048
                  THEN f.bin ELSE f.bin + 1 END,
             CASE WHEN f.fill + r.n_tokens <= 2048
                  THEN f.fill + r.n_tokens ELSE r.n_tokens END
           FROM f JOIN r ON r.shard = f.shard AND r.rn = f.rn + 1)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, n_tokens
         FROM f ORDER BY shard, bin, doc_id""",

    "pack_chunks_greedy" ->
      """WITH RECURSIVE t0 AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS tok FROM documents),
         nc AS (SELECT doc_id, tok,
           CASE WHEN len(tok) <= 64 THEN 1
                ELSE 1 + CAST(ceil((len(tok) - 64) / 48.0) AS BIGINT)
           END AS n_chunks FROM t0),
         ch AS (SELECT doc_id, tok, unnest(range(n_chunks)) AS chunk_id
                FROM nc),
         c2 AS (SELECT
             CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR)
               AS cid,
             CAST(len(list_slice(tok, CAST(chunk_id * 48 + 1 AS BIGINT),
               CAST(chunk_id * 48 + 64 AS BIGINT))) AS BIGINT) AS n_tokens
           FROM ch),
         d AS (
           SELECT cid AS doc_id, n_tokens, h,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
              strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 16 AS shard
           FROM (SELECT cid, n_tokens, md5(cid || '#3') AS h FROM c2)
           WHERE n_tokens > 0),
         r AS (SELECT doc_id, n_tokens, h, shard,
             row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
           FROM d),
         f AS (
           SELECT doc_id, shard, rn, n_tokens,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM r WHERE rn = 1
           UNION ALL
           SELECT r.doc_id, r.shard, r.rn, r.n_tokens,
             CASE WHEN f.fill + r.n_tokens <= 256
                  THEN f.bin ELSE f.bin + 1 END,
             CASE WHEN f.fill + r.n_tokens <= 256
                  THEN f.fill + r.n_tokens ELSE r.n_tokens END
           FROM f JOIN r ON r.shard = f.shard AND r.rn = f.rn + 1)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, n_tokens
         FROM f ORDER BY shard, bin, doc_id""",

    "pack_utilization" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, n_tokens, h,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
              strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 16 AS shard
           FROM (SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens,
               md5(CAST(doc_id AS VARCHAR) || '#3') AS h FROM documents)
           WHERE n_tokens > 0),
         r AS (SELECT doc_id, n_tokens, h, shard,
             row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
           FROM d),
         f AS (
           SELECT doc_id, shard, rn, n_tokens,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM r WHERE rn = 1
           UNION ALL
           SELECT r.doc_id, r.shard, r.rn, r.n_tokens,
             CASE WHEN f.fill + r.n_tokens <= 2048
                  THEN f.bin ELSE f.bin + 1 END,
             CASE WHEN f.fill + r.n_tokens <= 2048
                  THEN f.fill + r.n_tokens ELSE r.n_tokens END
           FROM f JOIN r ON r.shard = f.shard AND r.rn = f.rn + 1)
         SELECT CAST(shard AS BIGINT) AS shard, bin,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS fill,
           CASE WHEN sum(n_tokens) < 2048
                THEN 2048 - CAST(sum(n_tokens) AS BIGINT)
                ELSE 0 END AS pad
         FROM f GROUP BY 1, 2 ORDER BY 1, 2""",

    "pack_chopped_indexed" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR) || '#3') AS h FROM documents),
         s AS (SELECT doc_id, n_tokens, h,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
              strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 16 AS shard
           FROM d WHERE n_tokens > 0),
         c AS (SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard
               ORDER BY (doc_id < 50), h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
           FROM s)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_first,
           CAST(floor((cum - 1) / 2048.0) AS BIGINT) AS seq_last,
           (cum - n_tokens) % 2048 AS off
         FROM c WHERE doc_id < 50 ORDER BY shard, seq_first, off""",

    "pack_manifest" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR) || '#3') AS h FROM documents),
         s AS (SELECT doc_id, n_tokens, h,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
              strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 16 AS shard
           FROM d WHERE n_tokens > 0),
         c AS (SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
           FROM s),
         p AS (SELECT doc_id, shard, n_tokens,
             CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_first,
             CAST(floor((cum - 1) / 2048.0) AS BIGINT) AS seq_last,
             (cum - n_tokens) % 2048 AS off
           FROM c),
         m0 AS (SELECT doc_id, shard, n_tokens, off, seq_first,
             unnest(range(seq_first, seq_last + 1)) AS seq FROM p),
         m1 AS (SELECT doc_id, shard, seq, n_tokens,
             CASE WHEN seq = seq_first THEN 0
                  ELSE (seq - seq_first) * 2048 - off END AS tok_start,
             CASE WHEN seq = seq_first THEN off ELSE 0 END AS off_in_seq
           FROM m0)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard, seq, tok_start,
           off_in_seq,
           least(n_tokens - tok_start, 2048 - off_in_seq) AS seg_len
         FROM m1 ORDER BY shard, seq, off_in_seq""",

    "lm_trigram_score" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         flat AS (SELECT unnest(t) AS tok FROM toks),
         tri0 AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
           FROM toks),
         tri AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
           FROM tri0),
         d3 AS (SELECT doc_id, w1, w2, w3, count(*) AS c FROM tri
           GROUP BY 1, 2, 3, 4),
         c123 AS (SELECT w1, w2, w3, CAST(sum(c) AS BIGINT) AS c123
           FROM d3 GROUP BY 1, 2, 3),
         c12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12
           FROM c123 GROUP BY 1, 2),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM big0),
         d2 AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY 1, 2, 3),
         c2 AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c2 FROM d2
           GROUP BY 1, 2),
         c2h AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c2h FROM c2 GROUP BY 1),
         c1 AS (SELECT tok, count(*) AS c1 FROM flat GROUP BY 1),
         nv AS (SELECT count(*) AS n_total, count(DISTINCT tok) AS v FROM flat)
         SELECT d3.doc_id, CAST(sum(d3.c) AS BIGINT) AS n_trigrams,
           round(sum(d3.c * -ln(
             0.6 * (c123.c123 * 1.0 / c12.c12) +
             0.3 * (c2.c2 * 1.0 / c2h.c2h) +
             0.1 * ((c1.c1 + 0.5) / (nv.n_total + 0.5 * nv.v))))
             / sum(d3.c), 6) AS nll
         FROM d3
           JOIN c123 USING (w1, w2, w3)
           JOIN c12 USING (w1, w2)
           JOIN c2 ON c2.w1 = d3.w2 AND c2.w2 = d3.w3
           JOIN c2h ON c2h.w1 = d3.w2
           JOIN c1 ON c1.tok = d3.w3
           CROSS JOIN nv
         GROUP BY 1 ORDER BY 1""",

    "lm_bigram_indexed" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM big0),
         d AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY 1, 2, 3),
         c2 AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c2 FROM d
           WHERE doc_id >= 50 GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         v AS (SELECT count(DISTINCT u.tok) AS v
           FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id >= 50) u)
         SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_bigrams,
           round(sum(d.c * -ln((coalesce(c2.c2, 0) + 0.5) /
                 (coalesce(c1.c1, 0) + 0.5 * v.v))) / sum(d.c), 6) AS nll
         FROM d LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
           CROSS JOIN v
         WHERE d.doc_id < 50 GROUP BY 1 ORDER BY 1""",

    "lm_trigram_indexed" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         flat AS (SELECT unnest(t) AS tok FROM toks WHERE doc_id >= 50),
         tri0 AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
           FROM toks),
         tri AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
           FROM tri0),
         d3 AS (SELECT doc_id, w1, w2, w3, count(*) AS c FROM tri
           GROUP BY 1, 2, 3, 4),
         c123 AS (SELECT w1, w2, w3, CAST(sum(c) AS BIGINT) AS c123
           FROM d3 WHERE doc_id >= 50 GROUP BY 1, 2, 3),
         c12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12
           FROM c123 GROUP BY 1, 2),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM big0),
         d2 AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY 1, 2, 3),
         c2 AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c2 FROM d2
           WHERE doc_id >= 50 GROUP BY 1, 2),
         c2h AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c2h FROM c2 GROUP BY 1),
         c1 AS (SELECT tok, count(*) AS c1 FROM flat GROUP BY 1),
         nv AS (SELECT count(*) AS n_total, count(DISTINCT tok) AS v FROM flat)
         SELECT d3.doc_id, CAST(sum(d3.c) AS BIGINT) AS n_trigrams,
           round(sum(d3.c * -ln(
             0.6 * coalesce(c123.c123 * 1.0 / c12.c12, 0) +
             0.3 * coalesce(c2.c2 * 1.0 / c2h.c2h, 0) +
             0.1 * ((coalesce(c1.c1, 0) + 0.5) / (nv.n_total + 0.5 * nv.v))))
             / sum(d3.c), 6) AS nll
         FROM d3
           LEFT JOIN c123 USING (w1, w2, w3)
           LEFT JOIN c12 USING (w1, w2)
           LEFT JOIN c2 ON c2.w1 = d3.w2 AND c2.w2 = d3.w3
           LEFT JOIN c2h ON c2h.w1 = d3.w2
           LEFT JOIN c1 ON c1.tok = d3.w3
           CROSS JOIN nv
         WHERE d3.doc_id < 50 GROUP BY 1 ORDER BY 1""",

    "pack_greedy_indexed" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, n_tokens, h,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
              strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 16 AS shard
           FROM (SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens,
               md5(CAST(doc_id AS VARCHAR) || '#3') AS h FROM documents)
           WHERE n_tokens > 0),
         r AS (SELECT doc_id, n_tokens, h, shard,
             row_number() OVER (PARTITION BY shard
               ORDER BY (doc_id < 50), h, doc_id) AS rn
           FROM d),
         f AS (
           SELECT doc_id, shard, rn, n_tokens,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM r WHERE rn = 1
           UNION ALL
           SELECT r.doc_id, r.shard, r.rn, r.n_tokens,
             CASE WHEN f.fill + r.n_tokens <= 2048
                  THEN f.bin ELSE f.bin + 1 END,
             CASE WHEN f.fill + r.n_tokens <= 2048
                  THEN f.fill + r.n_tokens ELSE r.n_tokens END
           FROM f JOIN r ON r.shard = f.shard AND r.rn = f.rn + 1)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, n_tokens
         FROM f WHERE doc_id < 50 ORDER BY shard, bin, doc_id""",

    "lm_bigram_score" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM big0),
         d AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY 1, 2, 3),
         c2 AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c2 FROM d GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         v AS (SELECT count(DISTINCT u.tok) AS v
           FROM (SELECT unnest(t) AS tok FROM toks) u)
         SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_bigrams,
           round(sum(d.c * -ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)))
                 / sum(d.c), 6) AS nll
         FROM d JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
         GROUP BY 1 ORDER BY 1""",

    "lm_kn_score" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM big0),
         d AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY 1, 2, 3),
         c2 AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c2 FROM d GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1, count(*) AS n1lead
                FROM c2 GROUP BY 1),
         nc AS (SELECT w2, count(*) AS n1cont FROM c2 GROUP BY 1),
         tv AS (SELECT (SELECT count(*) FROM c2) AS t,
                  (SELECT count(DISTINCT u.tok)
                   FROM (SELECT unnest(t) AS tok FROM toks) u) AS v)
         SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_bigrams,
           round(sum(d.c * -ln(
             greatest(c2.c2 - 0.75, 0) / c1.c1
             + 0.75 * c1.n1lead / c1.c1
               * ((nc.n1cont + 0.5) / (tv.t + 0.5 * tv.v))))
             / sum(d.c), 6) AS nll
         FROM d JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
         JOIN nc USING (w2) CROSS JOIN tv
         GROUP BY 1 ORDER BY 1""",

    // store-miss arithmetic mirrored: unseen bigram keeps only the
    // backoff term, unseen history falls back to the continuation
    // distribution, unseen word hits the add-k floor
    "lm_kn_indexed" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM big0),
         dall AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY 1, 2, 3),
         c2 AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c2 FROM dall
                WHERE doc_id >= 50 GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1, count(*) AS n1lead
                FROM c2 GROUP BY 1),
         nc AS (SELECT w2, count(*) AS n1cont FROM c2 GROUP BY 1),
         tv AS (SELECT (SELECT count(*) FROM c2) AS t,
                  (SELECT count(DISTINCT u.tok)
                   FROM (SELECT unnest(t) AS tok FROM toks
                         WHERE doc_id >= 50) u) AS v),
         q AS (SELECT * FROM dall WHERE doc_id < 50)
         SELECT q.doc_id, CAST(sum(q.c) AS BIGINT) AS n_bigrams,
           round(sum(q.c * -ln(
             CASE WHEN c1.c1 IS NOT NULL THEN
               greatest(coalesce(c2.c2, 0) - 0.75, 0) / c1.c1
               + 0.75 * c1.n1lead / c1.c1
                 * ((coalesce(nc.n1cont, 0) + 0.5) / (tv.t + 0.5 * tv.v))
             ELSE (coalesce(nc.n1cont, 0) + 0.5) / (tv.t + 0.5 * tv.v)
             END))
             / sum(q.c), 6) AS nll
         FROM q LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
         LEFT JOIN nc USING (w2) CROSS JOIN tv
         GROUP BY 1 ORDER BY 1""",

    "lm_kn3_score" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         tri0 AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                  FROM toks),
         tri AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
                 FROM tri0),
         d3 AS (SELECT doc_id, w1, w2, w3, count(*) AS c FROM tri
                GROUP BY 1, 2, 3, 4),
         c123 AS (SELECT w1, w2, w3, CAST(sum(c) AS BIGINT) AS c123
                  FROM d3 GROUP BY 1, 2, 3),
         c12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12,
                   count(*) AS n1lead12 FROM c123 GROUP BY 1, 2),
         nc23 AS (SELECT w2, w3, count(*) AS n1c23 FROM c123 GROUP BY 1, 2),
         mid AS (SELECT w2, CAST(sum(n1c23) AS BIGINT) AS n1mid,
                   count(*) AS n1out FROM nc23 GROUP BY 1),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM big0),
         c2 AS (SELECT w1, w2 FROM big GROUP BY 1, 2),
         nc AS (SELECT w2 AS w3, count(*) AS n1cont FROM c2 GROUP BY 1),
         tv AS (SELECT (SELECT count(*) FROM c2) AS t,
                  (SELECT count(DISTINCT u.tok)
                   FROM (SELECT unnest(t) AS tok FROM toks) u) AS v)
         SELECT d3.doc_id, CAST(sum(d3.c) AS BIGINT) AS n_trigrams,
           round(sum(d3.c * -ln(
             greatest(c123.c123 - 0.75, 0) / c12.c12
             + 0.75 * c12.n1lead12 / c12.c12
               * (greatest(nc23.n1c23 - 0.75, 0) / mid.n1mid
                  + 0.75 * mid.n1out / mid.n1mid
                    * ((nc.n1cont + 0.5) / (tv.t + 0.5 * tv.v)))))
             / sum(d3.c), 6) AS nll
         FROM d3 JOIN c123 USING (w1, w2, w3) JOIN c12 USING (w1, w2)
           JOIN nc23 USING (w2, w3) JOIN mid USING (w2)
           JOIN nc ON nc.w3 = d3.w3 CROSS JOIN tv
         GROUP BY 1 ORDER BY 1""",

    // level-by-level store-miss arithmetic mirrored: unseen trigram
    // keeps only the history backoff, unseen history falls to the
    // middle (continuation-count) distribution, an unseen middle to
    // the floor distribution, an unseen word to the add-k floor
    "lm_kn3_indexed" ->
      """WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents),
         tri0 AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                  FROM toks),
         tri AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
                 FROM tri0),
         dall AS (SELECT doc_id, w1, w2, w3, count(*) AS c FROM tri
                  GROUP BY 1, 2, 3, 4),
         c123 AS (SELECT w1, w2, w3, CAST(sum(c) AS BIGINT) AS c123
                  FROM dall WHERE doc_id >= 50 GROUP BY 1, 2, 3),
         c12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12,
                   count(*) AS n1lead12 FROM c123 GROUP BY 1, 2),
         nc23 AS (SELECT w2, w3, count(*) AS n1c23 FROM c123 GROUP BY 1, 2),
         mid AS (SELECT w2, CAST(sum(n1c23) AS BIGINT) AS n1mid,
                   count(*) AS n1out FROM nc23 GROUP BY 1),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM big0),
         c2 AS (SELECT w1, w2 FROM big WHERE doc_id >= 50 GROUP BY 1, 2),
         nc AS (SELECT w2 AS w3, count(*) AS n1cont FROM c2 GROUP BY 1),
         tv AS (SELECT (SELECT count(*) FROM c2) AS t,
                  (SELECT count(DISTINCT u.tok)
                   FROM (SELECT unnest(t) AS tok FROM toks
                         WHERE doc_id >= 50) u) AS v),
         q AS (SELECT * FROM dall WHERE doc_id < 50)
         SELECT q.doc_id, CAST(sum(q.c) AS BIGINT) AS n_trigrams,
           round(sum(q.c * -ln(
             CASE WHEN c12.c12 IS NOT NULL THEN
               greatest(coalesce(c123.c123, 0) - 0.75, 0) / c12.c12
               + 0.75 * c12.n1lead12 / c12.c12
                 * (CASE WHEN mid.n1mid IS NOT NULL THEN
                      greatest(coalesce(nc23.n1c23, 0) - 0.75, 0) / mid.n1mid
                      + 0.75 * mid.n1out / mid.n1mid
                        * ((coalesce(nc.n1cont, 0) + 0.5)
                           / (tv.t + 0.5 * tv.v))
                    ELSE (coalesce(nc.n1cont, 0) + 0.5)
                         / (tv.t + 0.5 * tv.v) END)
             ELSE CASE WHEN mid.n1mid IS NOT NULL THEN
                    greatest(coalesce(nc23.n1c23, 0) - 0.75, 0) / mid.n1mid
                    + 0.75 * mid.n1out / mid.n1mid
                      * ((coalesce(nc.n1cont, 0) + 0.5)
                         / (tv.t + 0.5 * tv.v))
                  ELSE (coalesce(nc.n1cont, 0) + 0.5)
                       / (tv.t + 0.5 * tv.v) END
             END))
             / sum(q.c), 6) AS nll
         FROM q LEFT JOIN c123 USING (w1, w2, w3)
           LEFT JOIN c12 USING (w1, w2)
           LEFT JOIN nc23 USING (w2, w3) LEFT JOIN mid USING (w2)
           LEFT JOIN nc ON nc.w3 = q.w3 CROSS JOIN tv
         GROUP BY 1 ORDER BY 1""",

    "vocab_top200" ->
      """WITH toks AS (SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         t AS (SELECT token, doc_id, count(*) AS n FROM toks
               WHERE token <> '' GROUP BY 1, 2),
         v AS (SELECT token, count(*) AS df, CAST(sum(n) AS BIGINT) AS tf
               FROM t GROUP BY 1)
         SELECT token, df, tf FROM v
         ORDER BY df DESC, tf DESC, token LIMIT 200""",

    "vocab_oov_by_source" ->
      """WITH toks AS (SELECT doc_id, source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         t AS (SELECT token, doc_id, source, count(*) AS n FROM toks
               WHERE token <> '' GROUP BY 1, 2, 3),
         v AS (SELECT token, count(*) AS df, CAST(sum(n) AS BIGINT) AS tf
               FROM t GROUP BY 1),
         top AS (SELECT token FROM v
                 ORDER BY df DESC, tf DESC, token LIMIT 20),
         occ AS (SELECT source, t2.token FROM
                   (SELECT source,
                      unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                        AS token
                    FROM documents) t2
                 WHERE t2.token <> '')
         SELECT occ.source, count(*) AS n_tokens,
           CAST(sum(CASE WHEN top.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(sum(CASE WHEN top.token IS NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS oov_rate
         FROM occ LEFT JOIN top ON occ.token = top.token
         GROUP BY 1 ORDER BY 1""",

    "text_langid_confusion" ->
      """WITH t AS (SELECT doc_id, lang,
           regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, lang,
           len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','with'], x))) AS s_en,
           len(list_filter(toks, x -> list_contains(['der','und','die','das','ist','mit','von'], x))) AS s_de,
           len(list_filter(toks, x -> list_contains(['le','la','et','les','des','est','avec'], x))) AS s_fr,
           len(list_filter(toks, x -> list_contains(['el','los','las','es','con','por','una'], x))) AS s_es,
           len(list_filter(toks, x -> list_contains(['的','是','在','了','和'], x))) AS s_zh
           FROM t),
         p AS (SELECT lang,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
                WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
                WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
                WHEN s_es >= s_zh THEN 'es'
                ELSE 'zh' END AS pred_lang
           FROM s)
         SELECT lang, pred_lang, count(*) AS n FROM p
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "vocab_kl_by_source" ->
      """WITH toks AS (SELECT doc_id, source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents),
         t AS (SELECT token, doc_id, source, count(*) AS n FROM toks
               WHERE token <> '' GROUP BY 1, 2, 3),
         v AS (SELECT token, count(*) AS df, CAST(sum(n) AS BIGINT) AS tf
               FROM t GROUP BY 1),
         top AS (SELECT token FROM v
                 ORDER BY df DESC, tf DESC, token LIMIT 20),
         occ AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
                 FROM toks WHERE token <> ''
                   AND token IN (SELECT token FROM top)
                 GROUP BY 1, 2),
         ng AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_g FROM occ
                GROUP BY 1),
         ct AS (SELECT top.token, CAST(coalesce(sum(occ.c), 0) AS BIGINT)
                  AS c_t
                FROM top LEFT JOIN occ ON top.token = occ.token GROUP BY 1),
         na AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_all FROM ct),
         grid AS (SELECT ng.source, ng.n_g, top.token FROM ng CROSS JOIN top),
         g2 AS (SELECT grid.source, grid.n_g, grid.token,
                  CAST(coalesce(occ.c, 0) AS BIGINT) AS c, ct.c_t, na.n_all
                FROM grid
                LEFT JOIN occ ON grid.source = occ.source
                             AND grid.token = occ.token
                JOIN ct ON grid.token = ct.token
                CROSS JOIN na)
         SELECT source, max(n_g) AS n_tokens,
           round(sum(((c + 0.5) / (n_g + 0.5 * 20))
             * ln(((c + 0.5) / (n_g + 0.5 * 20))
                / ((c_t + 0.5) / (n_all + 0.5 * 20)))), 6) AS kl
         FROM g2 GROUP BY 1 ORDER BY 1""",

    "mix_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR) || '#7') AS ord FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
           FROM d)
         SELECT doc_id, source, n_tokens, cum_tokens FROM c
         WHERE cum_tokens <= CASE source WHEN 'src0' THEN 200
                                         WHEN 'src1' THEN 1200
                                         ELSE 700 END
         ORDER BY source, cum_tokens, doc_id""",

    "mix_temperature_weights" ->
      """WITH tok AS (SELECT source,
           CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n
           FROM documents WHERE text IS NOT NULL),
         s AS (SELECT source, CAST(sum(n) AS BIGINT) AS src_tokens
               FROM tok GROUP BY 1),
         p AS (SELECT source, src_tokens,
               power(CAST(src_tokens AS DOUBLE), 0.5) AS pp FROM s)
         SELECT source, src_tokens,
           round(pp / sum(pp) OVER (), 6) AS weight,
           CAST(floor(12000 * round(pp / sum(pp) OVER (), 6)) AS BIGINT) AS budget
         FROM p ORDER BY source""",

    "mix_temperature_build" ->
      """WITH d AS (SELECT doc_id, source,
           CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
             AS n_tokens,
           md5(CAST(doc_id AS VARCHAR) || '#7') AS ord
           FROM documents WHERE text IS NOT NULL),
         s AS (SELECT source, power(CAST(sum(n_tokens) AS DOUBLE), 0.5) AS pp
               FROM d GROUP BY 1),
         b AS (SELECT source,
               CAST(floor(12000 * round(pp / sum(pp) OVER (), 6)) AS BIGINT)
                 AS budget FROM s),
         c AS (SELECT doc_id, source, n_tokens,
           CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens FROM d)
         SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens
         FROM c JOIN b USING (source) WHERE c.cum_tokens <= b.budget
         ORDER BY c.source, c.cum_tokens, c.doc_id""",

    "profile_orders" ->
      """WITH t AS (SELECT * FROM orders)
         SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           round(CAST(min(o_orderkey) AS DOUBLE), 6) AS min_num,
           round(CAST(max(o_orderkey) AS DOUBLE), 6) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         FROM t
         UNION ALL
         SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           round(CAST(min(o_custkey) AS DOUBLE), 6),
           round(CAST(max(o_custkey) AS DOUBLE), 6), NULL, NULL FROM t
         UNION ALL
         SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), NULL, NULL,
           min(o_orderstatus), max(o_orderstatus) FROM t
         UNION ALL
         SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(CAST(min(o_totalprice) AS DOUBLE), 6),
           round(CAST(max(o_totalprice) AS DOUBLE), 6), NULL, NULL FROM t
         UNION ALL
         SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           round(CAST(floor(epoch(min(o_orderdate))) AS DOUBLE), 6),
           round(CAST(floor(epoch(max(o_orderdate))) AS DOUBLE), 6),
           NULL, NULL FROM t
         UNION ALL
         SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), NULL, NULL,
           min(o_orderpriority), max(o_orderpriority) FROM t
         ORDER BY col_name""",

    "profile_hist_totalprice" ->
      """WITH r AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
           CAST(ntile(8) OVER (ORDER BY CAST(o_totalprice AS DOUBLE),
             o_orderkey) AS BIGINT) AS bucket
           FROM orders WHERE o_totalprice IS NOT NULL)
         SELECT bucket, count(*) AS n, count(DISTINCT v) AS nd,
           round(min(v), 6) AS lo, round(max(v), 6) AS hi
         FROM r GROUP BY bucket ORDER BY bucket""",

    "profile_heavy_hitters" ->
      """WITH p AS (
           SELECT 'source' AS col_name, source AS v FROM documents
             WHERE source IS NOT NULL
           UNION ALL SELECT 'lang', lang FROM documents
             WHERE lang IS NOT NULL
           UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
             FROM documents WHERE n_chars IS NOT NULL),
         c AS (SELECT col_name, v, count(*) AS n FROM p GROUP BY 1, 2),
         r AS (SELECT col_name, v, n,
           CAST(row_number() OVER (PARTITION BY col_name
             ORDER BY n DESC, v) AS BIGINT) AS "rank" FROM c)
         SELECT col_name, v, n, "rank" FROM r WHERE "rank" <= 5
         ORDER BY col_name, "rank"""",

    "text_pii_by_source" ->
      """WITH a AS (SELECT source,
           substr(text, 1, 40)
           || CASE WHEN doc_id % 3 > 0
                   THEN ' u' || CAST(doc_id AS VARCHAR) || '@ex.org'
                   ELSE '' END
           || CASE WHEN doc_id % 4 > 0
                   THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.9'
                   ELSE '' END
           || ' ref 123-45-6789' AS aug FROM documents),
         c AS (SELECT source,
           len(regexp_extract_all(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
           len(regexp_extract_all(aug,
             '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS ni,
           len(regexp_extract_all(aug,
             '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS ns
           FROM a),
         g AS (SELECT source, count(*) AS n_docs,
           CAST(sum(ne) AS BIGINT) AS email_hits,
           CAST(sum(ni) AS BIGINT) AS ipv4_hits,
           CAST(sum(ns) AS BIGINT) AS ssn_hits,
           CAST(sum(CASE WHEN ne + ni + ns > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_affected
           FROM c GROUP BY 1)
         SELECT source, n_docs, email_hits, ipv4_hits, ssn_hits, n_affected,
           floor(CAST(n_affected AS DOUBLE) / CAST(n_docs AS DOUBLE)
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS affected_rate
         FROM g ORDER BY source""",

    "text_pii_redact" ->
      """WITH a AS (SELECT doc_id,
           substr(text, 1, 40)
           || CASE WHEN doc_id % 3 > 0
                   THEN ' u' || CAST(doc_id AS VARCHAR) || '@ex.org'
                   ELSE '' END
           || CASE WHEN doc_id % 4 > 0
                   THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.9'
                   ELSE '' END
           || ' ref 123-45-6789' AS aug FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(aug,
             '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(aug,
             '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
           regexp_replace(regexp_replace(regexp_replace(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
             '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS redacted
         FROM a ORDER BY doc_id""",

    "curate_ledger" ->
      """WITH t AS (SELECT doc_id, text,
           regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, text, toks,
           len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','with'], x))) AS s_en,
           len(list_filter(toks, x -> list_contains(['der','und','die','das','ist','mit','von'], x))) AS s_de,
           len(list_filter(toks, x -> list_contains(['le','la','et','les','des','est','avec'], x))) AS s_fr,
           len(list_filter(toks, x -> list_contains(['el','los','las','es','con','por','una'], x))) AS s_es,
           len(list_filter(toks, x -> list_contains(['的','是','在','了','和'], x))) AS s_zh
           FROM t),
         f AS (SELECT doc_id, text,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
                WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
                WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
                WHEN s_es >= s_zh THEN 'es'
                ELSE 'zh' END AS pred_lang,
           round(least(length(text)/500.0, 1.0)*0.25
             + (len(regexp_replace(text, '[^A-Za-z]', '', 'g'))/greatest(length(text), 1))*0.35
             + least((len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'], x)))
                 / greatest(len(toks), 1))*5.0, 1.0)*0.2
             + CASE WHEN (length(regexp_replace(text, '\s+', '', 'g'))/greatest(len(toks), 1))
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END*0.2, 6) AS quality
           FROM s),
         g2 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
                  list_transform(generate_series(0, len(toks)-2),
                    i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)])
                  ELSE [] END) AS g FROM t),
         a2 AS (SELECT doc_id, max(cnt * len(g)) AS m FROM
                  (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2)
                GROUP BY 1),
         nl AS (SELECT doc_id, len(array_to_string(toks, ' ')) AS norm_len FROM t),
         top2t AS (SELECT nl.doc_id,
             round(least(CAST(1.0 AS DOUBLE), CASE WHEN nl.norm_len = 0 THEN 0
               ELSE CAST(coalesce(a2.m, 0) AS DOUBLE) / nl.norm_len END), 6) AS top2
           FROM nl LEFT JOIN a2 USING (doc_id)),
         pre AS (SELECT f.doc_id, f.text, f.quality, f.pred_lang, top2t.top2,
             CASE WHEN f.text IS NULL THEN 'invalid'
                  WHEN f.quality < 0.62 THEN 'quality'
                  WHEN top2t.top2 > 0.14 THEN 'repetition'
                  WHEN f.pred_lang NOT IN ('en') THEN 'lang' END AS pre_stage
           FROM f JOIN top2t USING (doc_id)),
         surv AS (SELECT doc_id,
             CASE WHEN row_number() OVER (PARTITION BY text ORDER BY doc_id) > 1
                  THEN 'exact_dup' END AS dd
           FROM pre WHERE pre_stage IS NULL)
         SELECT p.doc_id, p.quality, p.pred_lang, p.top2,
           coalesce(p.pre_stage, surv.dd, 'kept') AS stage,
           (coalesce(p.pre_stage, surv.dd) IS NULL) AS keep
         FROM pre p LEFT JOIN surv USING (doc_id) ORDER BY 1""",

    "curate_ledger_lm" ->
      """WITH t AS (SELECT doc_id, text,
           regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, text, toks,
           len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','with'], x))) AS s_en,
           len(list_filter(toks, x -> list_contains(['der','und','die','das','ist','mit','von'], x))) AS s_de,
           len(list_filter(toks, x -> list_contains(['le','la','et','les','des','est','avec'], x))) AS s_fr,
           len(list_filter(toks, x -> list_contains(['el','los','las','es','con','por','una'], x))) AS s_es,
           len(list_filter(toks, x -> list_contains(['的','是','在','了','和'], x))) AS s_zh
           FROM t),
         f AS (SELECT doc_id, text,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
                WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
                WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
                WHEN s_es >= s_zh THEN 'es'
                ELSE 'zh' END AS pred_lang,
           round(least(length(text)/500.0, 1.0)*0.25
             + (len(regexp_replace(text, '[^A-Za-z]', '', 'g'))/greatest(length(text), 1))*0.35
             + least((len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'], x)))
                 / greatest(len(toks), 1))*5.0, 1.0)*0.2
             + CASE WHEN (length(regexp_replace(text, '\s+', '', 'g'))/greatest(len(toks), 1))
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END*0.2, 6) AS quality
           FROM s),
         g2 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
                  list_transform(generate_series(0, len(toks)-2),
                    i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)])
                  ELSE [] END) AS g FROM t),
         a2 AS (SELECT doc_id, max(cnt * len(g)) AS m FROM
                  (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2)
                GROUP BY 1),
         nl AS (SELECT doc_id, len(array_to_string(toks, ' ')) AS norm_len FROM t),
         top2t AS (SELECT nl.doc_id,
             round(least(CAST(1.0 AS DOUBLE), CASE WHEN nl.norm_len = 0 THEN 0
               ELSE CAST(coalesce(a2.m, 0) AS DOUBLE) / nl.norm_len END), 6) AS top2
           FROM nl LEFT JOIN a2 USING (doc_id)),
         pre AS (SELECT f.doc_id, f.text, f.quality, f.pred_lang, top2t.top2,
             CASE WHEN f.text IS NULL THEN 'invalid'
                  WHEN f.quality < 0.62 THEN 'quality'
                  WHEN top2t.top2 > 0.14 THEN 'repetition'
                  WHEN f.pred_lang NOT IN ('en') THEN 'lang' END AS pre_stage
           FROM f JOIN top2t USING (doc_id)),
         surv AS (SELECT doc_id,
             CASE WHEN row_number() OVER (PARTITION BY text ORDER BY doc_id) > 1
                  THEN 'exact_dup' END AS dd
           FROM pre WHERE pre_stage IS NULL),
         lmpool AS (SELECT p.doc_id, p.text FROM pre p
             LEFT JOIN surv USING (doc_id)
             WHERE coalesce(p.pre_stage, surv.dd) IS NULL),
         ltoks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS lt
           FROM lmpool),
         lbig0 AS (SELECT doc_id, lt, unnest(range(1, len(lt))) AS i FROM ltoks),
         lbig AS (SELECT doc_id, lt[i] AS w1, lt[i + 1] AS w2 FROM lbig0),
         ld AS (SELECT doc_id, w1, w2, count(*) AS c FROM lbig GROUP BY 1, 2, 3),
         lc2 AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c2 FROM ld GROUP BY 1, 2),
         lc1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM lc2 GROUP BY 1),
         lv AS (SELECT count(DISTINCT u.tok) AS v
           FROM (SELECT unnest(lt) AS tok FROM ltoks) u),
         lnll AS (SELECT ld.doc_id,
             round(sum(ld.c * -ln((lc2.c2 + 0.5) / (lc1.c1 + 0.5 * lv.v)))
               / sum(ld.c), 6) AS nll
           FROM ld JOIN lc2 USING (w1, w2) JOIN lc1 USING (w1) CROSS JOIN lv
           GROUP BY 1)
         SELECT p.doc_id, p.quality, p.pred_lang, p.top2,
           coalesce(p.pre_stage, surv.dd,
             CASE WHEN lnll.nll > 3.45 THEN 'perplexity' END, 'kept') AS stage,
           (coalesce(p.pre_stage, surv.dd,
             CASE WHEN lnll.nll > 3.45 THEN 'perplexity' END) IS NULL) AS keep
         FROM pre p LEFT JOIN surv USING (doc_id)
           LEFT JOIN lnll USING (doc_id) ORDER BY 1""",

    "search_tfidf_keywords" ->
      """WITH post AS (SELECT term, doc_id, count(*) AS tf FROM
                (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)),
                   '\s+')) AS term FROM documents) GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (SELECT post.doc_id, post.term,
             post.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
           FROM post JOIN df USING (term) CROSS JOIN n),
         ranked AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rk FROM scored)
         SELECT doc_id, term, round(score, 6) AS score, CAST(rk AS BIGINT) AS rk
         FROM ranked WHERE rk <= 5 ORDER BY doc_id, rk""",

    "quality_repetition" ->
      """WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
                    FROM documents),
         lc AS (SELECT doc_id, line, count(*) AS cnt, len(line) AS chars
                FROM l GROUP BY 1, 2),
         lagg AS (SELECT doc_id, sum(cnt) AS n_lines, sum(cnt - 1) AS dup_el,
                         sum(cnt * chars) AS tot_lc,
                         sum((cnt - 1) * chars) AS dup_lc
                  FROM lc GROUP BY 1),
         tl AS (SELECT doc_id, t, len(array_to_string(t, ' ')) AS norm_len
                FROM (SELECT doc_id,
                        regexp_split_to_array(lower(trim(text)), '\s+') AS t
                      FROM documents)),
         g2 AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN
                  list_transform(generate_series(0, len(t)-2),
                    i -> t[CAST(i+1 AS INT)] || ' ' || t[CAST(i+2 AS INT)])
                  ELSE [] END) AS g FROM tl),
         a2 AS (SELECT doc_id, max(cnt * len(g)) AS top2 FROM
                  (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2)
                GROUP BY 1),
         g5 AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 5 THEN
                  list_transform(generate_series(0, len(t)-5),
                    i -> t[CAST(i+1 AS INT)] || ' ' || t[CAST(i+2 AS INT)]
                         || ' ' || t[CAST(i+3 AS INT)] || ' ' || t[CAST(i+4 AS INT)]
                         || ' ' || t[CAST(i+5 AS INT)]) ELSE [] END) AS g FROM tl),
         a5 AS (SELECT doc_id, sum((cnt - 1) * len(g)) AS dup5 FROM
                  (SELECT doc_id, g, count(*) AS cnt FROM g5 GROUP BY 1, 2)
                WHERE cnt > 1 GROUP BY 1)
         SELECT tl.doc_id,
           round(CASE WHEN lagg.n_lines = 0 THEN 0
                 ELSE CAST(lagg.dup_el AS DOUBLE) / lagg.n_lines END, 6)
             AS dup_line_frac,
           round(CASE WHEN lagg.tot_lc = 0 THEN 0
                 ELSE CAST(lagg.dup_lc AS DOUBLE) / lagg.tot_lc END, 6)
             AS dup_line_char_frac,
           round(least(CAST(1.0 AS DOUBLE), CASE WHEN tl.norm_len = 0 THEN 0
                 ELSE CAST(coalesce(a2.top2, 0) AS DOUBLE) / tl.norm_len END), 6)
             AS top2_char_frac,
           round(least(CAST(1.0 AS DOUBLE), CASE WHEN tl.norm_len = 0 THEN 0
                 ELSE CAST(coalesce(a5.dup5, 0) AS DOUBLE) / tl.norm_len END), 6)
             AS dup5_char_frac
         FROM tl JOIN lagg USING (doc_id)
           LEFT JOIN a2 USING (doc_id) LEFT JOIN a5 USING (doc_id)
         ORDER BY 1""",

    "events_props_json" ->
      """SELECT event_type AS name, count(*) AS n,
         round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
         min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
         max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY 1 ORDER BY 1""",

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
         count(*) AS cluster_size
         FROM documents GROUP BY 1 ORDER BY 1""",

    "dedup_cluster_exact_sample" ->
      """WITH RECURSIVE g AS (SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(length(t)-2, 1)),
             i -> substring(t, CAST(i AS INT), 3))) AS grams
           FROM (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
                 FROM documents WHERE doc_id < 300)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM g a JOIN g b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         m AS (SELECT src AS id, min(dst) AS mn FROM reach GROUP BY 1)
         SELECT id, least(id, mn) AS cluster FROM m ORDER BY id""",

    "dedup_cluster_census" ->
      """WITH RECURSIVE g AS (SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(length(t)-2, 1)),
             i -> substring(t, CAST(i AS INT), 3))) AS grams
           FROM (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
                 FROM documents WHERE doc_id < 300)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM g a JOIN g b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         m AS (SELECT src AS id, min(dst) AS mn FROM reach GROUP BY 1),
         lbl AS (SELECT d.doc_id AS id,
             coalesce(least(m.id, m.mn), d.doc_id) AS cluster
           FROM documents d LEFT JOIN m ON d.doc_id = m.id
           WHERE d.doc_id < 300),
         cs AS (SELECT cluster, count(*) AS sz FROM lbl GROUP BY 1)
         SELECT sz, count(*) AS n_clusters FROM cs GROUP BY 1 ORDER BY sz""",

    "split_leakfree_exact_sample" ->
      s"""WITH RECURSIVE g AS (SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(length(t)-2, 1)),
             i -> substring(t, CAST(i AS INT), 3))) AS grams
           FROM (SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t
                 FROM documents WHERE doc_id < 300)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM g a JOIN g b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         m AS (SELECT src AS id, min(dst) AS mn FROM reach GROUP BY 1),
         lab AS (SELECT id, least(id, mn) AS cluster FROM m),
         j AS (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
               FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
               LEFT JOIN lab l ON d.doc_id = l.id)
         SELECT doc_id, cluster,
           CASE WHEN md5(CAST(cluster AS VARCHAR) || '#7') <
             '${graft.ops.Mix.hexThreshold(0.2)}'
           THEN 'eval' ELSE 'train' END AS split
         FROM j ORDER BY doc_id""",

    "split_balanced_exact_sample" ->
      """WITH RECURSIVE g AS (SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(length(t)-2, 1)),
             i -> substring(t, CAST(i AS INT), 3))) AS grams
           FROM (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
                 FROM documents WHERE doc_id < 300)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM g a JOIN g b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         m AS (SELECT src AS id, min(dst) AS mn FROM reach GROUP BY 1),
         lab AS (SELECT id, least(id, mn) AS cluster FROM m),
         j AS (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
               FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
               LEFT JOIN lab l ON d.doc_id = l.id),
         mass AS (SELECT cluster, count(*) AS m,
                  md5(CAST(cluster AS VARCHAR) || '#7') AS hh
                  FROM j GROUP BY 1),
         c AS (SELECT cluster,
                 coalesce(sum(m) OVER (ORDER BY hh
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev,
                 sum(m) OVER () AS tot FROM mass),
         sel AS (SELECT cluster,
                 CASE WHEN CAST(prev AS DOUBLE) < 0.2 * CAST(tot AS DOUBLE)
                 THEN 'eval' ELSE 'train' END AS split FROM c)
         SELECT j.doc_id, j.cluster, sel.split
         FROM j JOIN sel USING (cluster) ORDER BY doc_id""",

    "dedup_embed_exact_sample" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   q -> CAST(q[1] AS DOUBLE) * q[2]))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
                * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x)))), 4) AS cos
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, cos FROM p WHERE cos >= 0.4 ORDER BY 1, 2""",

    "ann_brute_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
         pairs AS (SELECT q.query_id, e.vec_id,
           round(list_sum(list_transform(list_zip(q.embedding, e.embedding),
                   p -> CAST(p[1] AS DOUBLE) * p[2]))
             / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * x)))
                * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))), 4) AS score
           FROM q CROSS JOIN embeddings e),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
                    FROM pairs)
         SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
         ORDER BY query_id, score DESC, vec_id""",

    "text_stats" ->
      """SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish,
         round(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) / greatest(length(text), 1), 6) AS alpha_ratio,
         round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'], t)))
           / greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1), 6) AS stop_ratio,
         round(length(regexp_replace(text, '\s+', '', 'g'))
           / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 6) AS mean_word_len,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",

    "text_chunk_tokens" ->
      """WITH d AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS tok FROM documents),
         n AS (SELECT doc_id, tok,
           CASE WHEN len(tok) <= 64 THEN 1
                ELSE 1 + CAST(ceil((len(tok) - 64) / 48.0) AS BIGINT)
           END AS n_chunks FROM d),
         c AS (SELECT doc_id, tok, unnest(range(n_chunks)) AS chunk_id FROM n)
         SELECT doc_id, chunk_id, chunk_id * 48 + 1 AS token_start,
           len(list_slice(tok, CAST(chunk_id * 48 + 1 AS BIGINT),
             CAST(chunk_id * 48 + 64 AS BIGINT))) AS n_tokens,
           md5(array_to_string(list_slice(tok, CAST(chunk_id * 48 + 1 AS BIGINT),
             CAST(chunk_id * 48 + 64 AS BIGINT)), ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_id""",

    "text_rolling_fp" ->
      """WITH n AS (SELECT doc_id,
           lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t FROM documents)
         SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(t)),
                 i -> CAST(unicode(substring(t, CAST(i AS INT), 1)) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) AS fp
         FROM n ORDER BY doc_id""",

    "text_langid_quality" ->
      """WITH t AS (SELECT doc_id, text,
           regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, text, toks,
           len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','with'], x))) AS s_en,
           len(list_filter(toks, x -> list_contains(['der','und','die','das','ist','mit','von'], x))) AS s_de,
           len(list_filter(toks, x -> list_contains(['le','la','et','les','des','est','avec'], x))) AS s_fr,
           len(list_filter(toks, x -> list_contains(['el','los','las','es','con','por','una'], x))) AS s_es,
           len(list_filter(toks, x -> list_contains(['的','是','在','了','和'], x))) AS s_zh
           FROM t)
         SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
                WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
                WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
                WHEN s_es >= s_zh THEN 'es'
                ELSE 'zh' END AS pred_lang,
           round(least(length(text)/500.0, 1.0)*0.25
             + (len(regexp_replace(text, '[^A-Za-z]', '', 'g'))/greatest(length(text), 1))*0.35
             + least((len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'], x)))
                 / greatest(len(toks), 1))*5.0, 1.0)*0.2
             + CASE WHEN (length(regexp_replace(text, '\s+', '', 'g'))/greatest(len(toks), 1))
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END*0.2, 6) AS quality
         FROM s ORDER BY doc_id""",

    "quality_adaptive_by_source" ->
      """WITH t0 AS (SELECT doc_id, source, text,
           regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
         t AS (SELECT doc_id, source,
           round(least(length(text)/500.0, 1.0)*0.25
             + (len(regexp_replace(text, '[^A-Za-z]', '', 'g'))/greatest(length(text), 1))*0.35
             + least((len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'], x)))
                 / greatest(len(toks), 1))*5.0, 1.0)*0.2
             + CASE WHEN (length(regexp_replace(text, '\s+', '', 'g'))/greatest(len(toks), 1))
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END*0.2, 6) AS quality
           FROM t0),
         c AS (SELECT source, round(quantile_cont(quality, 0.1), 6) AS cutoff
               FROM t GROUP BY 1)
         SELECT t.source, c.cutoff,
           CAST(sum(CASE WHEN t.quality >= c.cutoff THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           count(*) AS total
         FROM t JOIN c USING (source) GROUP BY 1, 2 ORDER BY 1""",

    "quality_adaptive_kept" ->
      """WITH t0 AS (SELECT doc_id, source, text,
           regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
         t AS (SELECT doc_id, source,
           round(least(length(text)/500.0, 1.0)*0.25
             + (len(regexp_replace(text, '[^A-Za-z]', '', 'g'))/greatest(length(text), 1))*0.35
             + least((len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'], x)))
                 / greatest(len(toks), 1))*5.0, 1.0)*0.2
             + CASE WHEN (length(regexp_replace(text, '\s+', '', 'g'))/greatest(len(toks), 1))
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END*0.2, 6) AS quality
           FROM t0),
         c AS (SELECT source, round(quantile_cont(quality, 0.1), 6) AS cutoff
               FROM t GROUP BY 1)
         SELECT t.doc_id, t.source, t.quality, c.cutoff
         FROM t JOIN c USING (source)
         WHERE t.quality >= c.cutoff ORDER BY t.doc_id""",

    "span_dup_spans" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
         g0 AS (SELECT doc_id, t,
           CASE WHEN len(t) >= 10 THEN generate_series(1, len(t)-9) ELSE [] END AS idxs FROM d),
         g AS (SELECT doc_id, CAST(unnest(idxs) AS BIGINT) AS pos, t FROM g0),
         g2 AS (SELECT doc_id, pos, lower(array_to_string(t[pos:pos+9], ' ')) AS gram FROM g),
         s AS (SELECT gram, count(DISTINCT doc_id) AS nd, min(doc_id) AS owner
               FROM g2 GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
         cov0 AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN s USING (gram)
                  WHERE g2.doc_id <> s.owner),
         cov AS (SELECT DISTINCT doc_id, p FROM
                 (SELECT doc_id, unnest(generate_series(pos, pos+9)) AS p FROM cov0)),
         isl AS (SELECT doc_id, p,
                 p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp FROM cov)
         SELECT doc_id, min(p) AS span_start, count(*) AS span_len
         FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""",

    "span_scrub_clean" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
         g0 AS (SELECT doc_id, t,
           CASE WHEN len(t) >= 10 THEN generate_series(1, len(t)-9) ELSE [] END AS idxs FROM d),
         g AS (SELECT doc_id, CAST(unnest(idxs) AS BIGINT) AS pos, t FROM g0),
         g2 AS (SELECT doc_id, pos, lower(array_to_string(t[pos:pos+9], ' ')) AS gram FROM g),
         s AS (SELECT gram, count(DISTINCT doc_id) AS nd, min(doc_id) AS owner
               FROM g2 GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
         cov0 AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN s USING (gram)
                  WHERE g2.doc_id <> s.owner),
         cov AS (SELECT DISTINCT doc_id, p FROM
                 (SELECT doc_id, unnest(generate_series(pos, pos+9)) AS p FROM cov0)),
         tok AS (SELECT doc_id, unnest(t) AS tok,
                 CAST(unnest(generate_series(1, len(t))) AS BIGINT) AS p FROM d),
         keptt AS (SELECT tok.doc_id, tok.p, tok.tok FROM tok
                   LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
                   WHERE cov.p IS NULL),
         agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
                 count(*) AS n_kept FROM keptt GROUP BY 1)
         SELECT d.doc_id, coalesce(agg.clean_text, '') AS clean_text,
           CAST(len(d.t) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
         FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""",

    // quantization contract mirrors Graph.quant: floor(x·2^30 + ½)/2^30
    // on every stored rank and every per-edge term — grid sums are
    // exact doubles, so the two engines agree BIT-exactly and the
    // 6-digit presentation floor is luck-free
    "graph_pagerank" ->
      s"""WITH $linkGraphCte,
         deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY 1),
         r0 AS (SELECT CAST(doc_id AS BIGINT) AS node,
             ${prQuant("CAST(1.0 AS DOUBLE) / nn.nd")} AS r
             FROM documents CROSS JOIN nn),
         d1 AS (SELECT coalesce(sum(r), 0) AS dang FROM r0
                LEFT JOIN deg ON r0.node = deg.src WHERE deg.d IS NULL),
         c1 AS (SELECT e.dst AS node, sum(${prQuant("r0.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
         r1 AS (SELECT r0.node, ${prQuant(prStep("c1", "d1"))} AS r
             FROM r0 LEFT JOIN c1 USING (node) CROSS JOIN d1 CROSS JOIN nn),
         d2 AS (SELECT coalesce(sum(r), 0) AS dang FROM r1
                LEFT JOIN deg ON r1.node = deg.src WHERE deg.d IS NULL),
         c2 AS (SELECT e.dst AS node, sum(${prQuant("r1.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
         r2 AS (SELECT r1.node, ${prQuant(prStep("c2", "d2"))} AS r
             FROM r1 LEFT JOIN c2 USING (node) CROSS JOIN d2 CROSS JOIN nn),
         d3 AS (SELECT coalesce(sum(r), 0) AS dang FROM r2
                LEFT JOIN deg ON r2.node = deg.src WHERE deg.d IS NULL),
         c3 AS (SELECT e.dst AS node, sum(${prQuant("r2.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
         r3 AS (SELECT r2.node, ${prQuant(prStep("c3", "d3"))} AS r
             FROM r2 LEFT JOIN c3 USING (node) CROSS JOIN d3 CROSS JOIN nn)
         SELECT r3.node,
           floor(r3.r * nn.nd * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS rank_norm
         FROM r3 CROSS JOIN nn ORDER BY node""",

    "graph_degrees" ->
      s"""WITH $linkGraphCte,
         od AS (SELECT src, count(*) AS c FROM e GROUP BY 1),
         ind AS (SELECT dst, count(*) AS c FROM e GROUP BY 1)
         SELECT CAST(doc_id AS BIGINT) AS node,
           coalesce(od.c, 0) AS out_deg, coalesce(ind.c, 0) AS in_deg
         FROM documents LEFT JOIN od ON doc_id = od.src
         LEFT JOIN ind ON doc_id = ind.dst
         ORDER BY node""",

    "graph_reciprocity" ->
      s"""WITH $linkGraphCte,
         r AS (SELECT count(*) AS n_reciprocal FROM e
               WHERE EXISTS (SELECT 1 FROM e e2
                 WHERE e2.src = e.dst AND e2.dst = e.src)),
         t AS (SELECT count(*) AS n_edges FROM e)
         SELECT t.n_edges, r.n_reciprocal,
           floor(CAST(r.n_reciprocal AS DOUBLE) / CAST(t.n_edges AS DOUBLE)
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS reciprocity
         FROM t CROSS JOIN r""",

    "graph_degree_hist" ->
      s"""WITH $linkGraphCte,
         ind AS (SELECT dst, count(*) AS c FROM e GROUP BY 1),
         dg AS (SELECT CAST(doc_id AS BIGINT) AS node,
             coalesce(ind.c, 0) AS in_deg
           FROM documents LEFT JOIN ind ON doc_id = ind.dst)
         SELECT in_deg, count(*) AS n_nodes FROM dg
         GROUP BY 1 ORDER BY in_deg""",

    "graph_kcore_exact_sample" -> {
      // independent re-derivation: rebuild the md5 power-law sample
      // graph, then peel each k = 1..5 to its fixpoint with an
      // UNROLLED round chain (depth past the measured fixpoint —
      // extra rounds are idempotent on a converged edge set), and
      // recover core(v) as the count of k-cores containing v (cores
      // are nested, so membership-count == max-k == coreness; max
      // coreness of this graph is 5)
      val arms = (1 to 6).map { j =>
        s"""SELECT i AS src,
            ${hexValSql(s"md5(CAST(i AS VARCHAR) || '#l$j')", 8)}
              % greatest(i, 1) AS dst FROM fan WHERE f >= $j"""
      }.mkString("\n           UNION ALL ")
      // AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs,
      // and each round references its predecessor 3× — inlined, the
      // chain re-derives the base graph exponentially many times
      // (observed: fd exhaustion before producing a row)
      def peel(k: Int, depth: Int): String = {
        val rounds = (1 to depth).map { t =>
          s"""n${k}_$t AS MATERIALIZED (SELECT node FROM
                (SELECT a AS node FROM e${k}_${t - 1} UNION ALL
                 SELECT b FROM e${k}_${t - 1})
                GROUP BY 1 HAVING count(*) >= $k),
             e${k}_$t AS MATERIALIZED (SELECT e.a, e.b FROM e${k}_${t - 1} e
                JOIN n${k}_$t x ON e.a = x.node
                JOIN n${k}_$t y ON e.b = y.node)"""
        }.mkString(",\n         ")
        s"""e${k}_0 AS MATERIALIZED (SELECT a, b FROM und),
           $rounds,
           m$k AS (SELECT DISTINCT node FROM
             (SELECT a AS node FROM e${k}_$depth UNION ALL
              SELECT b FROM e${k}_$depth))"""
      }
      // measured rounds-to-fixpoint per k: 1,3,3,4,6 — unroll one past
      val depths = Map(1 -> 2, 2 -> 4, 3 -> 4, 4 -> 5, 5 -> 7)
      val memb = (1 to 5)
        .map(k => s"(CASE WHEN m$k.node IS NOT NULL THEN 1 ELSE 0 END)")
        .mkString("\n           + ")
      val joins = (1 to 5)
        .map(k => s"LEFT JOIN m$k ON d.i = m$k.node")
        .mkString("\n                ")
      s"""WITH d AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS i
             FROM documents WHERE doc_id < 200),
         fan AS MATERIALIZED (SELECT i,
            ${hexValSql("md5(CAST(i AS VARCHAR) || '#f')", 8)} % 6 + 1 AS f
            FROM d),
         e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ($arms)
             WHERE src <> dst),
         und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                 greatest(src, dst) AS b FROM e),
         ${(1 to 5).map(k => peel(k, depths(k))).mkString(",\n         ")}
         SELECT d.i AS node, CAST($memb AS BIGINT) AS core
         FROM d $joins
         ORDER BY node"""
    },

    "events_hourly_profile" ->
      """SELECT event_type AS name,
           CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day,
           count(*) AS n, round(avg(value), 6) AS mean_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "graph_top_ranked_by_source" -> {
      // the full PageRank CTE chain, then a per-source window cut on
      // the floor-presented rank (bit-exact, so the cut can't flip)
      val prCte = s"""WITH $linkGraphCte,
         deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY 1),
         r0 AS (SELECT CAST(doc_id AS BIGINT) AS node,
             ${prQuant("CAST(1.0 AS DOUBLE) / nn.nd")} AS r
             FROM documents CROSS JOIN nn),
         d1 AS (SELECT coalesce(sum(r), 0) AS dang FROM r0
                LEFT JOIN deg ON r0.node = deg.src WHERE deg.d IS NULL),
         c1 AS (SELECT e.dst AS node, sum(${prQuant("r0.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
         r1 AS (SELECT r0.node, ${prQuant(prStep("c1", "d1"))} AS r
             FROM r0 LEFT JOIN c1 USING (node) CROSS JOIN d1 CROSS JOIN nn),
         d2 AS (SELECT coalesce(sum(r), 0) AS dang FROM r1
                LEFT JOIN deg ON r1.node = deg.src WHERE deg.d IS NULL),
         c2 AS (SELECT e.dst AS node, sum(${prQuant("r1.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
         r2 AS (SELECT r1.node, ${prQuant(prStep("c2", "d2"))} AS r
             FROM r1 LEFT JOIN c2 USING (node) CROSS JOIN d2 CROSS JOIN nn),
         d3 AS (SELECT coalesce(sum(r), 0) AS dang FROM r2
                LEFT JOIN deg ON r2.node = deg.src WHERE deg.d IS NULL),
         c3 AS (SELECT e.dst AS node, sum(${prQuant("r2.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
         r3 AS (SELECT r2.node, ${prQuant(prStep("c3", "d3"))} AS r
             FROM r2 LEFT JOIN c3 USING (node) CROSS JOIN d3 CROSS JOIN nn),
         rn AS (SELECT r3.node,
             floor(r3.r * nn.nd * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / CAST(1000000 AS DOUBLE) AS rank_norm
             FROM r3 CROSS JOIN nn)"""
      s"""$prCte,
         t AS (SELECT d.source, rn.node, rn.rank_norm,
             row_number() OVER (PARTITION BY d.source
               ORDER BY rn.rank_norm DESC, rn.node) AS rk
           FROM rn JOIN documents d ON d.doc_id = rn.node)
         SELECT source, CAST(rk AS BIGINT) AS rk, node, rank_norm
         FROM t WHERE rk <= 3 ORDER BY source, rk"""
    },

    "graph_components" ->
      s"""WITH RECURSIVE $linkGraphCte,
         ef AS (SELECT src, dst FROM e WHERE src < 100 AND dst < 100),
         und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                 FROM ef),
         ed AS (SELECT a AS src, b AS dst FROM und
                UNION SELECT b, a FROM und),
         reach(src, dst) AS (
           SELECT src, dst FROM ed
           UNION
           SELECT r.src, ed.dst FROM reach r JOIN ed ON r.dst = ed.src),
         mm AS (SELECT src AS id, min(dst) AS mn FROM reach GROUP BY 1)
         SELECT CAST(doc_id AS BIGINT) AS node,
           coalesce(least(mm.id, mm.mn), CAST(doc_id AS BIGINT)) AS component
         FROM documents LEFT JOIN mm ON doc_id = mm.id
         WHERE doc_id < 100 ORDER BY node""",

    "graph_ppr" -> {
      // one PPR update: r' = quant(CASE seed: ((1−d) + d·dang)/|S|
      // ELSE 0 END + d·coalesce(c, 0)) — literal arithmetic pinned to
      // Spark's (1.0 − 0.85)-in-double, like the global oracle
      def step(prev: String, c: String, d: String): String =
        prQuant(s"""CASE WHEN $prev.isseed
             THEN ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
               + CAST(0.85 AS DOUBLE) * $d.dang) / sc.s
             ELSE 0.0 END
           + CAST(0.85 AS DOUBLE) * coalesce($c.c, 0)""")
      def iter(prev: String, k: Int): String =
        s"""d$k AS (SELECT coalesce(sum(r), 0) AS dang FROM $prev
              LEFT JOIN deg ON $prev.node = deg.src WHERE deg.d IS NULL),
           c$k AS (SELECT e.dst AS node, sum(${prQuant(s"$prev.r / deg.d")}) AS c
              FROM e JOIN deg USING (src) JOIN $prev ON $prev.node = e.src
              GROUP BY 1),
           r$k AS (SELECT $prev.node, $prev.isseed,
              ${step(prev, s"c$k", s"d$k")} AS r
              FROM $prev LEFT JOIN c$k USING (node)
              CROSS JOIN d$k CROSS JOIN sc)"""
      s"""WITH $linkGraphCte,
         sc AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM documents
                WHERE doc_id % 50 = 0),
         deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY 1),
         r0 AS (SELECT CAST(doc_id AS BIGINT) AS node,
             (doc_id % 50 = 0) AS isseed,
             CASE WHEN doc_id % 50 = 0
               THEN ${prQuant("CAST(1.0 AS DOUBLE) / sc.s")} ELSE 0.0 END AS r
             FROM documents CROSS JOIN sc),
         ${iter("r0", 1)},
         ${iter("r1", 2)},
         ${iter("r2", 3)}
         SELECT r3.node,
           floor(r3.r * nn.nd * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS rank_norm
         FROM r3 CROSS JOIN nn ORDER BY node"""
    },

    "graph_triangles" ->
      s"""WITH $linkGraphCte,
         und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                 FROM e),
         t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1
               JOIN und e2 ON e2.a = e1.b
               JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
         corners AS (SELECT x AS node FROM t UNION ALL
                     SELECT y FROM t UNION ALL SELECT z FROM t),
         tc AS (SELECT node, count(*) AS tri FROM corners GROUP BY 1),
         dg AS (SELECT node, count(*) AS deg FROM
                (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
                GROUP BY 1)
         SELECT d.node, coalesce(dg.deg, 0) AS deg, coalesce(tc.tri, 0) AS tri,
           floor(CASE WHEN coalesce(dg.deg, 0) >= 2
             THEN (CAST(2.0 AS DOUBLE) * CAST(coalesce(tc.tri, 0) AS DOUBLE))
               / (CAST(dg.deg AS DOUBLE) * (CAST(dg.deg AS DOUBLE) - CAST(1.0 AS DOUBLE)))
             ELSE 0.0 END * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS clust
         FROM (SELECT CAST(doc_id AS BIGINT) AS node FROM documents) d
         LEFT JOIN dg USING (node) LEFT JOIN tc USING (node)
         ORDER BY node""",

    "graph_hits" -> {
      def half(src: String, inCol: String, outCol: String, from: String,
          to: String): String =
        s"""${outCol}r AS (SELECT e.$to AS node, sum($src.v) AS s
              FROM e JOIN $src ON $src.node = e.$from GROUP BY 1),
           ${outCol}t AS (SELECT coalesce(sum(s), 0.0) AS t FROM ${outCol}r),
           $outCol AS (SELECT h0.node,
              CASE WHEN ${outCol}t.t > 0
                THEN ${prQuant(s"coalesce(${outCol}r.s, 0) / ${outCol}t.t")}
                ELSE 0.0 END AS v
              FROM h0 LEFT JOIN ${outCol}r USING (node) CROSS JOIN ${outCol}t)"""
      s"""WITH $linkGraphCte,
         h0 AS (SELECT CAST(doc_id AS BIGINT) AS node,
             CAST(1.0 AS DOUBLE) AS v FROM documents),
         ${half("h0", "h0", "a1", "src", "dst")},
         ${half("a1", "a1", "h1", "dst", "src")},
         ${half("h1", "h1", "a2", "src", "dst")},
         ${half("a2", "a2", "h2", "dst", "src")}
         SELECT h2.node,
           floor(h2.v * nn.nd * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS hub_norm,
           floor(a2.v * nn.nd * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS auth_norm
         FROM h2 JOIN a2 USING (node) CROSS JOIN nn ORDER BY node"""
    },

    "snapshot_delta" ->
      s"""WITH $snapshotCte
         SELECT id, status, old_fp, new_fp FROM cls ORDER BY id""",

    "snapshot_delta_indexed" ->
      s"""WITH $snapshotCte
         SELECT id, status, old_fp, new_fp FROM cls ORDER BY id""",

    "snapshot_delta_counts" ->
      s"""WITH $snapshotCte
         SELECT status, count(*) AS n FROM cls GROUP BY 1 ORDER BY status""",

    "snapshot_reprocess_feed" ->
      s"""WITH $snapshotCte
         SELECT nw.doc_id, cls.status, nw.n_chars
         FROM nw JOIN cls ON nw.doc_id = cls.id
         WHERE cls.status IN ('added', 'changed')
         ORDER BY nw.doc_id""",

    // per-pattern non-overlapping regex counts equal AC's all-end-
    // positions totals because none of the four patterns self-overlap
    // and the corpus is space-tokenized (no periodic runs)
    "text_blocklist_screen" -> {
      val pats = Seq("slow", "hash", "the part", "query")
      val cnt = pats.map(p =>
        s"len(regexp_extract_all(lower(text), '$p'))")
      val hits = cnt.mkString(" + ")
      val matched = cnt.map(c => s"CASE WHEN $c > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""SELECT doc_id, CAST($hits AS BIGINT) AS block_hits,
         CAST($matched AS BIGINT) AS block_patterns,
         ($hits) > 0 AS blocked
         FROM documents ORDER BY doc_id"""
    },

    "colloc_counts_indexed" ->
      """WITH t0 AS (SELECT list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> length(x) > 0) AS t FROM documents),
         p0 AS (SELECT t, unnest(generate_series(1, len(t)-1)) AS i
                FROM t0 WHERE len(t) >= 2),
         p1 AS (SELECT t, i,
                unnest(generate_series(i+1, least(i+3, len(t)))) AS j FROM p0),
         pc AS (SELECT least(t[i], t[j]) AS tok_a,
                greatest(t[i], t[j]) AS tok_b, count(*) AS pair_n
                FROM p1 GROUP BY 1, 2)
         SELECT tok_a, tok_b, pair_n FROM pc
         ORDER BY pair_n DESC, tok_a, tok_b LIMIT 50""",

    // lift association tree mirrors Colloc.topCollocations exactly:
    // ((c_ab/c_a) * (ntok/c_b)) * (ntok/npairs), left-assoc doubles
    // over exact integer counts — identical bits, luck-free floor
    "colloc_top_lift" ->
      """WITH t0 AS (SELECT list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> length(x) > 0) AS t FROM documents),
         p0 AS (SELECT t, unnest(generate_series(1, len(t)-1)) AS i
                FROM t0 WHERE len(t) >= 2),
         p1 AS (SELECT t, i,
                unnest(generate_series(i+1, least(i+3, len(t)))) AS j FROM p0),
         pc AS (SELECT least(t[i], t[j]) AS tok_a,
                greatest(t[i], t[j]) AS tok_b, count(*) AS pair_n
                FROM p1 GROUP BY 1, 2),
         uc AS (SELECT tok, count(*) AS tok_n FROM
                (SELECT unnest(t) AS tok FROM t0) GROUP BY 1),
         tot AS (SELECT CAST(sum(tok_n) AS DOUBLE) AS ntok FROM uc),
         totp AS (SELECT CAST(sum(pair_n) AS DOUBLE) AS npair FROM pc),
         l AS (SELECT pc.tok_a, pc.tok_b, pc.pair_n,
               CAST(pc.pair_n AS DOUBLE) / CAST(ca.tok_n AS DOUBLE)
                 * (tot.ntok / CAST(cb.tok_n AS DOUBLE))
                 * (tot.ntok / totp.npair) AS lift
               FROM pc JOIN uc ca ON pc.tok_a = ca.tok
               JOIN uc cb ON pc.tok_b = cb.tok
               CROSS JOIN tot CROSS JOIN totp
               WHERE pc.pair_n >= 5)
         SELECT tok_a, tok_b, pair_n,
           floor(lift * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS lift
         FROM l ORDER BY l.lift DESC, tok_a, tok_b LIMIT 100""",

    "bpe_pair_counts" ->
      """WITH w AS (SELECT word, count(*) AS wcount FROM
           (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
            FROM documents) t
           WHERE length(word) > 0 GROUP BY 1),
         c AS (SELECT wcount, regexp_split_to_array(word, '') AS ch FROM w),
         p0 AS (SELECT wcount, ch, unnest(generate_series(1, len(ch)-1)) AS i
                FROM c WHERE len(ch) >= 2),
         p AS (SELECT ch[i] AS a, ch[i+1] AS b, wcount FROM p0)
         SELECT a, b, CAST(sum(wcount) AS BIGINT) AS freq FROM p GROUP BY 1, 2
         ORDER BY freq DESC, a, b LIMIT 50""",

    "bpe_merges_exact_sample" -> {
      val finalSel = (1 to 5)
        .map(t => s"SELECT CAST($t AS BIGINT) AS rank, a, b, freq FROM m$t")
        .mkString("\n           UNION ALL ")
      s"""WITH ${bpeTrainSql(5)}
         SELECT * FROM ($finalSel) ORDER BY rank"""
    },

    // the tokenizer those merges induce, on the doc_id<300 sample:
    // strict training application IS rank-order tokenization for the
    // same merge table, so a word's token count after 5 rounds is its
    // sl5 row count — summed over each sampled doc's words (LEFT
    // JOINs keep zero-word docs at n_bpe=0, matching the kernel)
    "bpe_token_count_exact_sample" ->
      s"""WITH ${bpeTrainSql(5)},
         wt AS MATERIALIZED (SELECT wi.word, cnt.ntok FROM wi JOIN
             (SELECT wid, count(*) AS ntok FROM sl5 GROUP BY 1) cnt
             USING (wid)),
         dw AS (SELECT doc_id, word FROM
             (SELECT doc_id,
                unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
              FROM documents WHERE doc_id < 300)
           WHERE length(word) > 0)
         SELECT d.doc_id, CAST(coalesce(sum(wt.ntok), 0) AS BIGINT) AS n_bpe
         FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
         LEFT JOIN dw ON d.doc_id = dw.doc_id
         LEFT JOIN wt ON dw.word = wt.word
         GROUP BY 1 ORDER BY 1""",

    // store-read path, same truth: store-fit == inline-fit is also
    // BpeSpec-pinned, so one oracle serves both
    "bpe_token_count_indexed" ->
      s"""WITH ${bpeTrainSql(5)},
         wt AS MATERIALIZED (SELECT wi.word, cnt.ntok FROM wi JOIN
             (SELECT wid, count(*) AS ntok FROM sl5 GROUP BY 1) cnt
             USING (wid)),
         dw AS (SELECT doc_id, word FROM
             (SELECT doc_id,
                unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
              FROM documents WHERE doc_id < 300)
           WHERE length(word) > 0)
         SELECT d.doc_id, CAST(coalesce(sum(wt.ntok), 0) AS BIGINT) AS n_bpe
         FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
         LEFT JOIN dw ON d.doc_id = dw.doc_id
         LEFT JOIN wt ON dw.word = wt.word
         GROUP BY 1 ORDER BY 1""",

    "mm_decode_meta" ->
      """WITH m AS (SELECT doc_id,
           ['image','video','audio'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           octet_length(CAST(text AS BLOB)) AS n FROM documents)
         SELECT doc_id, media_type, CAST(n AS BIGINT) AS byte_len,
           CAST(CASE media_type WHEN 'image' THEN 256 + n % 256 WHEN 'video' THEN 640 ELSE 0 END AS INT) AS width,
           CAST(CASE media_type WHEN 'image' THEN 256 + (n * 31) % 256 WHEN 'video' THEN 360 ELSE 0 END AS INT) AS height,
           CAST(CASE media_type WHEN 'audio' THEN 1 + n % 2 ELSE 3 END AS INT) AS channels,
           CAST(CASE media_type WHEN 'image' THEN 1 WHEN 'video' THEN 1 + n % 300 ELSE 1 + n // 64 END AS INT) AS n_frames
         FROM m ORDER BY doc_id""",

    "mm_media_features" ->
      """WITH m AS (SELECT doc_id,
           ['image','video','audio'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           octet_length(CAST(text AS BLOB)) AS n FROM documents),
         d AS (SELECT doc_id, media_type,
           CASE media_type WHEN 'image' THEN 256 + n % 256 WHEN 'video' THEN 640 ELSE 0 END AS w,
           CASE media_type WHEN 'image' THEN 256 + (n * 31) % 256 WHEN 'video' THEN 360 ELSE 0 END AS h,
           CASE media_type WHEN 'image' THEN 1 WHEN 'video' THEN 1 + n % 300 ELSE 1 + n // 64 END AS f
           FROM m)
         SELECT doc_id, media_type,
           round(CASE WHEN h > 0 THEN CAST(w AS DOUBLE) / h ELSE 0.0 END, 6) AS aspect,
           CAST(w AS BIGINT) * h * f AS total_pixels
         FROM d ORDER BY doc_id""",

    "mm_resize_plan" ->
      """WITH m AS (SELECT doc_id,
           ['image','video','audio'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           octet_length(CAST(text AS BLOB)) AS n FROM documents),
         d AS (SELECT doc_id, media_type,
           CASE media_type WHEN 'image' THEN 256 + n % 256 WHEN 'video' THEN 640 ELSE 0 END AS w,
           CASE media_type WHEN 'image' THEN 256 + (n * 31) % 256 WHEN 'video' THEN 360 ELSE 0 END AS h
           FROM m WHERE media_type IN ('image','video')),
         s AS (SELECT *, least(224.0 / w, 224.0 / h, 1.0) AS sc FROM d WHERE w > 0 AND h > 0)
         SELECT doc_id, media_type, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(floor(w * sc) AS INT) AS out_w, CAST(floor(h * sc) AS INT) AS out_h
         FROM s ORDER BY doc_id""",

    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n
           FROM documents WHERE doc_id % 3 = 1)
         SELECT doc_id, CAST(1 + n % 300 AS INT) AS n_frames,
           unnest(generate_series(0, n % 300, 10)) AS frame_idx
         FROM m ORDER BY 1, 3""",

    "text_nfc_normalize" ->
      """WITH f AS (SELECT doc_id, text || ' cafe' || chr(769)
             || ' bla' || chr(778) || 'ba' || chr(776) || 'r' AS x
           FROM documents),
         n AS (SELECT doc_id, nfc_normalize(x) AS nx FROM f)
         SELECT doc_id, CAST(length(nx) AS BIGINT) AS n_chars_norm,
           md5(nx) AS norm_md5
         FROM n ORDER BY doc_id""",

    "text_html_extract" ->
      """WITH h AS (SELECT doc_id,
           '<html><head><script>var x = 1 < 2;</script>'
           || '<style>p { color: red }</style></head><body><h1>Doc '
           || doc_id || '</h1>' || chr(10) || '<p>' || text
           || ' &amp; more &lt;tags&gt;</p><!-- crawler note -->'
           || '</body></html>' AS html FROM documents),
         s1 AS (SELECT doc_id, regexp_replace(html,
             '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
         s2 AS (SELECT doc_id, regexp_replace(t,
             '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
         s3 AS (SELECT doc_id, regexp_replace(t,
             '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
         s4 AS (SELECT doc_id, regexp_replace(t,
             '<[^>]*>', ' ', 'g') AS t FROM s3),
         s5 AS (SELECT doc_id,
             replace(replace(replace(replace(replace(replace(t,
               '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
           FROM s4),
         s6 AS (SELECT doc_id,
             trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted
           FROM s5)
         SELECT doc_id, extracted,
           CAST(length(extracted) AS BIGINT) AS n_chars_out
         FROM s6 ORDER BY doc_id""",

    "text_main_content" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         parts AS (SELECT doc_id,
           array_to_string(list_slice(ws, 1, greatest(len(ws)//2, 1)), ' ') AS p1,
           array_to_string(list_slice(ws, greatest(len(ws)//2, 1) + 1, len(ws)), ' ') AS p2
           FROM w),
         fix AS (SELECT doc_id,
           '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
           '</title><style>body{margin:0}</style><script>var x=1;</script></head><body>' ||
           '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>' ||
           '<header><h1>Site ' || CAST(doc_id % 7 AS VARCHAR) || '</h1></header><main><p>' || p1 ||
           '</p><p>' || p2 || ' See also <a href="/ref">the source</a>.</p>' ||
           (CASE WHEN doc_id % 4 = 0 THEN '<ul><li><a href="/r1">Related one: how the spark shuffle works in practice</a></li><li><a href="/r2">Related two</a></li></ul>' ELSE '' END) ||
           '</main><aside><a href="/ad">Sponsored links</a></aside><footer>&copy; 2026 Site <a href="/terms">Terms</a></footer></body></html>' AS html
           FROM parts),
         cleaned AS (SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
             '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
             '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
             '(?is)<nav\b[^>]*>.*?</nav>', ' ', 'g'),
             '(?is)<header\b[^>]*>.*?</header>', ' ', 'g'),
             '(?is)<footer\b[^>]*>.*?</footer>', ' ', 'g'),
             '(?is)<aside\b[^>]*>.*?</aside>', ' ', 'g'),
             '(?s)<!--.*?-->', ' ', 'g') AS c
           FROM fix),
         blocks AS (SELECT doc_id,
           list_filter(list_transform(
             string_split_regex(c, '(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|section|article|main|blockquote|pre|figure|figcaption|form|fieldset|br|hr)\b[^>]*>'),
             b -> {'t': trim(regexp_replace(
                 replace(replace(replace(replace(replace(replace(
                   regexp_replace(b, '<[^>]*>', ' ', 'g'),
                   '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                 '\s+', ' ', 'g')),
               'll': coalesce(list_aggregate(list_transform(
                 regexp_extract_all(b, '(?is)<a\b[^>]*>(.*?)</a>', 1),
                 a -> length(trim(regexp_replace(
                   replace(replace(replace(replace(replace(replace(
                     regexp_replace(a, '<[^>]*>', ' ', 'g'),
                     '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                   '\s+', ' ', 'g')))), 'sum'), 0)}),
             s -> s.t <> '') AS bl
           FROM cleaned),
         cls AS (SELECT doc_id, bl,
           list_filter(bl, s -> length(s.t) >= 25 AND CAST(s.ll AS DOUBLE) <= 0.33 * length(s.t)) AS ct
           FROM blocks)
         SELECT doc_id,
           coalesce(array_to_string(list_transform(ct, s -> s.t), chr(10)), '') AS main_text,
           CAST(len(bl) AS BIGINT) AS n_blocks,
           CAST(len(ct) AS BIGINT) AS n_content_blocks,
           CAST(coalesce(list_aggregate(list_transform(ct, s -> length(s.t)), 'sum'), 0) AS BIGINT) AS content_chars,
           CAST(coalesce(list_aggregate(list_transform(bl, s -> length(s.t)), 'sum'), 0) - coalesce(list_aggregate(list_transform(ct, s -> length(s.t)), 'sum'), 0) AS BIGINT) AS boiler_chars
         FROM cls ORDER BY doc_id""",

    "text_gopher_rules" ->
      (s"""WITH $linePageFixtureSql,
         $gopherRulesCteSql
         SELECT doc_id, n_words, mwl AS mean_word_len,
           swr AS sym_word_ratio, blf AS bullet_line_frac,
           elf AS ellipsis_line_frac, awf AS alpha_word_frac,
           n_req AS n_req_stopwords, gopher_keep
         FROM gr ORDER BY doc_id"""),

    "url_domain_quality" ->
      (s"""WITH $linePageFixtureSql,
         $gopherRulesCteSql,
         raw AS (
           SELECT doc_id,
             (CASE WHEN doc_id % 25 < 5 THEN 'www.' ELSE '' END)
               || 'site' || CAST(doc_id % 5 AS VARCHAR)
               || (CASE WHEN (doc_id % 5) % 2 = 0 THEN '.co.uk' ELSE '.com' END) AS host,
             CAST(doc_id % 25 AS VARCHAR) AS p
           FROM documents),
         minted AS (
           SELECT doc_id, CASE doc_id % 4
             WHEN 0 THEN 'http://' || upper(host) || '/page/' || p || '/'
             WHEN 1 THEN 'HTTP://' || host || ':80/page/' || p || '?utm_source=feed'
             WHEN 2 THEN 'http://user@' || host || '/page/' || p || '#section'
             ELSE host || '/page/' || p END AS url
           FROM raw),
         ${urlCanonCteSql("minted")},
         dom AS (SELECT doc_id, ${registeredDomainSql("chost")} AS domain
           FROM canon),
         j AS (SELECT dom.domain, gr.gopher_keep AS k
           FROM dom JOIN gr USING (doc_id)),
         a AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(k) AS BIGINT) AS n_pass FROM j GROUP BY domain)
         SELECT domain, n_docs, n_pass,
           floor(CAST(n_pass AS DOUBLE) / n_docs * CAST(1000000 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS pass_rate,
           CAST((floor(CAST(n_pass AS DOUBLE) / n_docs
               * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) >= CAST(0.25 AS DOUBLE)) AS INT)
             AS domain_keep
         FROM a ORDER BY domain"""),

    "text_c4_clean" ->
      (s"""WITH $linePageFixtureSql,
         k AS (SELECT doc_id, page,
           string_split(page, chr(10)) AS lines FROM fix),
         f AS (SELECT doc_id, page, lines,
           list_filter(lines, l -> regexp_matches(rtrim(l), '[.!?"]$$')
             AND len(regexp_split_to_array(trim(l), '\\s+')) >= 3
             AND NOT contains(lower(l), 'javascript')) AS kept
           FROM k),
         c AS (SELECT doc_id, page, lines, kept,
           array_to_string(kept, chr(10)) AS text_clean FROM f)
         SELECT doc_id, text_clean,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(len(regexp_extract_all(text_clean, '[.!?]+')) AS BIGINT)
             AS n_sent_clean,
           CAST((NOT contains(lower(page), 'lorem ipsum')
             AND NOT contains(page, '{')
             AND len(regexp_extract_all(text_clean, '[.!?]+')) >= 5
             AND len(kept) >= 1) AS INT) AS c4_keep
         FROM c ORDER BY doc_id"""),

    "mm_palette_real" ->
      """WITH px AS (SELECT doc_id, gx.x, gy.y FROM documents,
           generate_series(0, 7) AS gx(x), generate_series(0, 5) AS gy(y)),
         l AS (SELECT doc_id, 16 * ((doc_id + x + y) % 16) AS v FROM px)
         SELECT doc_id, 8 AS width, 6 AS height,
           CAST(sum(v) AS BIGINT) AS sum_luma
         FROM l GROUP BY 1 ORDER BY doc_id""",

    "url_robots_filter" ->
      """SELECT doc_id,
           'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
           CASE doc_id % 4
             WHEN 0 THEN '/page/' || CAST(doc_id % 7 AS VARCHAR)
             WHEN 1 THEN '/private/doc' || CAST(doc_id % 7 AS VARCHAR)
             WHEN 2 THEN '/private/ok/doc' || CAST(doc_id % 7 AS VARCHAR)
             ELSE '/tmp/x' || CAST(doc_id % 7 AS VARCHAR) END AS path,
           CAST(CASE WHEN (doc_id % 5) % 2 = 0
             THEN CASE WHEN doc_id % 4 = 1 THEN 0 ELSE 1 END
             ELSE CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END
           END AS INTEGER) AS allowed
         FROM documents ORDER BY doc_id""",

    "url_sitemaps" ->
      """WITH hosts AS (SELECT DISTINCT doc_id % 5 AS k FROM documents),
         sm AS (SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS host,
           CASE WHEN k % 2 = 0
             THEN ['https://cdn.example/sitemap-even.xml']
             ELSE ['https://cdn.example/sitemap-odd.xml',
                   'https://cdn.example/sitemap-odd-2.xml'] END AS urls
           FROM hosts)
         SELECT host, u.sitemap_url
         FROM sm, unnest(sm.urls) AS u(sitemap_url)
         ORDER BY host, sitemap_url""",

    "url_sitemap_entries" ->
      """WITH idx AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
         u AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0),
         e AS (
           SELECT doc_id, 'sitemap' AS kind,
             'https://s' || CAST(doc_id % 7 AS VARCHAR) ||
               '.example/sitemap-a.xml.gz' AS loc,
             '2026-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || '-15' AS lastmod
           FROM idx
           UNION ALL
           SELECT doc_id, 'sitemap',
             'https://s' || CAST(doc_id % 7 AS VARCHAR) ||
               '.example/sitemap-b.xml.gz', NULL
           FROM idx
           UNION ALL
           SELECT doc_id, 'url',
             'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/' ||
               CAST(doc_id % 11 AS VARCHAR),
             '2026-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || '-15'
           FROM u
           UNION ALL
           SELECT doc_id, 'url',
             'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/' ||
               CAST(doc_id % 11 AS VARCHAR) || '/sub?a=1&b=2', NULL
           FROM u)
         SELECT doc_id, kind, loc, lastmod FROM e ORDER BY doc_id, loc""",

    "url_frontier_gated" ->
      """WITH u AS (SELECT doc_id, doc_id % 7 AS k, doc_id % 11 AS m
           FROM documents WHERE doc_id % 5 <> 0),
         e AS (
           SELECT 2 * doc_id AS row_id,
             'w' || CAST(k AS VARCHAR) || '.example' AS host,
             '/p/' || CAST(m AS VARCHAR) AS path, 1 AS allowed
           FROM u
           UNION ALL
           SELECT 2 * doc_id + 1,
             'w' || CAST(k AS VARCHAR) || '.example',
             '/p/' || CAST(m AS VARCHAR) || '/sub?a=1&b=2', 0
           FROM u)
         SELECT row_id, host, path, CAST(allowed AS INTEGER) AS allowed
         FROM e ORDER BY row_id""",

    "url_crawl_delay" ->
      """WITH hosts AS (SELECT DISTINCT doc_id % 4 AS k FROM documents)
         SELECT 'delay' || CAST(k AS VARCHAR) || '.example' AS host,
           CAST(CASE k WHEN 0 THEN 2.5 WHEN 1 THEN 0.5 ELSE NULL END
             AS DOUBLE) AS crawl_delay
         FROM hosts ORDER BY host""",

    "url_robots_wildcards" ->
      """SELECT doc_id,
           'wild' || CAST(doc_id % 2 AS VARCHAR) || '.example' AS host,
           CASE doc_id % 7
             WHEN 0 THEN '/p/x.html' WHEN 1 THEN '/p/x.htmlz'
             WHEN 2 THEN '/q?sid=5' WHEN 3 THEN '/dl'
             WHEN 4 THEN '/dl/x' WHEN 5 THEN '/a%20b'
             ELSE '/caf%C3%A9' END AS path,
           CAST(CASE WHEN doc_id % 2 = 0
             THEN CASE WHEN doc_id % 7 IN (1, 2, 3) THEN 0 ELSE 1 END
             ELSE CASE WHEN doc_id % 7 IN (5, 6) THEN 0 ELSE 1 END
           END AS INTEGER) AS allowed
         FROM documents ORDER BY doc_id""",

    "url_robots_mapside" ->
      """SELECT doc_id,
           'wild' || CAST(doc_id % 2 AS VARCHAR) || '.example' AS host,
           CASE doc_id % 7
             WHEN 0 THEN '/p/x.html' WHEN 1 THEN '/p/x.htmlz'
             WHEN 2 THEN '/q?sid=5' WHEN 3 THEN '/dl'
             WHEN 4 THEN '/dl/x' WHEN 5 THEN '/a%20b'
             ELSE '/caf%C3%A9' END AS path,
           CAST(CASE WHEN doc_id % 2 = 0
             THEN CASE WHEN doc_id % 7 IN (1, 2, 3) THEN 0 ELSE 1 END
             ELSE CASE WHEN doc_id % 7 IN (5, 6) THEN 0 ELSE 1 END
           END AS INTEGER) AS allowed
         FROM documents ORDER BY doc_id""",

    "url_link_extract" ->
      """WITH m AS (SELECT doc_id,
           CAST(doc_id % 5 AS VARCHAR) AS k, CAST(doc_id % 25 AS VARCHAR) AS p,
           CAST(doc_id % 3 AS VARCHAR) AS m3, CAST(doc_id % 4 AS VARCHAR) AS m4,
           CAST(doc_id % 5 AS VARCHAR) AS m5, CAST(doc_id % 6 AS VARCHAR) AS m6,
           CAST(doc_id % 7 AS VARCHAR) AS m7
         FROM documents),
         b AS (SELECT *, 'https://site' || k || '.example' AS origin,
           'https://site' || k || '.example/a/b/page' || p || '.html' AS base
         FROM m),
         le AS (SELECT doc_id, list_filter([
           {'c': true, 'h': 'https://ext' || m3 || '.example/abs/' || p,
              'r': 'https://ext' || m3 || '.example/abs/' || p},
           {'c': true, 'h': '//cdn.example/lib/' || m4,
              'r': 'https://cdn.example/lib/' || m4},
           {'c': doc_id % 2 = 0, 'h': '//cdn.example/lib2/' || p,
              'r': 'https://cdn.example/lib2/' || p},
           {'c': true, 'h': '/root/item?id=' || p || '&utm_source=feed',
              'r': origin || '/root/item?id=' || p || '&utm_source=feed'},
           {'c': true, 'h': '../up/' || m7, 'r': origin || '/a/up/' || m7},
           {'c': true, 'h': './same/' || m5,
              'r': origin || '/a/b/same/' || m5},
           {'c': true, 'h': 'plain/rel' || m3,
              'r': origin || '/a/b/plain/rel' || m3},
           {'c': doc_id % 9 = 0, 'h': 'HTTPS://EXT1.EXAMPLE/UP',
              'r': 'HTTPS://EXT1.EXAMPLE/UP'},
           {'c': doc_id % 2 = 0, 'h': '?page=' || p,
              'r': base || '?page=' || p},
           {'c': doc_id % 3 = 0, 'h': '#frag', 'r': base},
           {'c': doc_id % 11 = 0, 'h': '../../../deep/' || p,
              'r': origin || '/deep/' || p},
           {'c': doc_id % 4 = 0, 'h': '/squote/' || m6,
              'r': origin || '/squote/' || m6}
           ], e -> e.c) AS es FROM b),
         x AS (SELECT doc_id, es,
           unnest(generate_series(1, len(es))) AS i FROM le)
         SELECT doc_id, CAST(i - 1 AS INT) AS ord,
           es[i].h AS href, es[i].r AS resolved
         FROM x ORDER BY doc_id, ord""",

    "url_domain_graph" ->
      """WITH m AS (SELECT doc_id,
           'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS src,
           CAST(doc_id % 3 AS VARCHAR) AS m3 FROM documents),
         d AS (SELECT doc_id, src,
           unnest(list_transform(list_filter([
             {'c': true, 'd': 'ext' || m3 || '.example'},
             {'c': true, 'd': 'cdn.example'},
             {'c': doc_id % 2 = 0, 'd': 'cdn.example'},
             {'c': doc_id % 9 = 0, 'd': 'ext1.example'}
           ], e -> e.c), e -> e.d)) AS dst FROM m)
         SELECT src AS src_domain, dst AS dst_domain,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
         FROM d GROUP BY 1, 2 ORDER BY 1, 2""",

    "url_crawl_schedule" ->
      """WITH u AS (SELECT
           'delay' || CAST(doc_id % 4 AS VARCHAR) || '.example' AS host,
           'https://delay' || CAST(doc_id % 4 AS VARCHAR) || '.example/p/'
             || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
           doc_id % 4 AS k
         FROM documents),
         s AS (SELECT host, url,
           CAST(CASE k WHEN 0 THEN 2.5 WHEN 1 THEN 0.5 ELSE NULL END
             AS DOUBLE) AS crawl_delay,
           CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
             AS INT) AS slot
         FROM u)
         SELECT host, url, crawl_delay, slot,
           CAST(slot AS DOUBLE) * coalesce(crawl_delay, CAST(1.0 AS DOUBLE))
             AS fetch_at_s
         FROM s ORDER BY host, url""",

    "ingest_charset_decode" ->
      """WITH v AS (SELECT doc_id, doc_id % 5 AS k, text,
           text || ' café Ωμέγα' AS wide,
           text || ' café' AS acc
         FROM documents)
       SELECT doc_id,
         CASE k WHEN 0 THEN 'ascii' WHEN 1 THEN 'utf-8'
           WHEN 2 THEN 'utf-8-bom' WHEN 3 THEN 'utf-16le'
           ELSE 'windows-1252' END AS charset,
         CASE k WHEN 0 THEN text WHEN 4 THEN acc ELSE wide END AS text_decoded,
         CAST(CASE k WHEN 0 THEN length(text)
           WHEN 1 THEN octet_length(encode(wide))
           WHEN 2 THEN 3 + octet_length(encode(wide))
           WHEN 3 THEN 2 + 2 * length(wide)
           ELSE length(acc) END AS BIGINT) AS n_bytes
       FROM v ORDER BY doc_id""",

    "ingest_charset_cjk" ->
      """WITH v AS (SELECT doc_id, doc_id % 9 AS k, text FROM documents)
       SELECT doc_id,
         CASE k WHEN 0 THEN 'utf-8' WHEN 1 THEN 'shift_jis'
           WHEN 2 THEN 'euc-jp' WHEN 3 THEN 'euc-kr' WHEN 4 THEN 'gbk'
           WHEN 5 THEN 'big5' WHEN 8 THEN 'iso-2022-jp'
           ELSE 'windows-1252' END AS charset,
         text || CASE k WHEN 1 THEN ' 日本語テキスト'
           WHEN 2 THEN ' 日本語テキスト' WHEN 8 THEN ' 日本語テキスト'
           WHEN 3 THEN ' 한국어 텍스트'
           WHEN 4 THEN ' 中文文本' WHEN 5 THEN ' 中文測試'
           ELSE ' café' END AS text_decoded,
         CAST(length(text) + CASE k WHEN 0 THEN 6 WHEN 1 THEN 15
           WHEN 2 THEN 15 WHEN 3 THEN 14 WHEN 4 THEN 9 WHEN 5 THEN 9
           WHEN 8 THEN 21 ELSE 5 END AS BIGINT) AS n_bytes
       FROM v ORDER BY doc_id""",

    "url_anchor_text" ->
      """WITH m AS (SELECT doc_id,
           CAST(doc_id % 25 AS VARCHAR) AS p,
           CAST(doc_id % 3 AS VARCHAR) AS m3, CAST(doc_id % 4 AS VARCHAR) AS m4,
           CAST(doc_id % 5 AS VARCHAR) AS m5, CAST(doc_id % 6 AS VARCHAR) AS m6,
           CAST(doc_id % 7 AS VARCHAR) AS m7
         FROM documents),
         le AS (SELECT doc_id, list_filter([
           {'c': true, 'h': 'https://ext' || m3 || '.example/abs/' || p,
              't': 'Bold anchor'},
           {'c': true, 'h': '//cdn.example/lib/' || m4, 't': 'y'},
           {'c': doc_id % 2 = 0, 'h': '//cdn.example/lib2/' || p, 't': 'y2'},
           {'c': true, 'h': '/root/item?id=' || p || '&utm_source=feed',
              't': 'Q&A link'},
           {'c': true, 'h': '../up/' || m7, 't': 'u'},
           {'c': true, 'h': './same/' || m5, 't': 's'},
           {'c': true, 'h': 'plain/rel' || m3, 't': 'r'},
           {'c': doc_id % 9 = 0, 'h': 'HTTPS://EXT1.EXAMPLE/UP', 't': 'U'},
           {'c': doc_id % 2 = 0, 'h': '?page=' || p, 't': 'q'},
           {'c': doc_id % 3 = 0, 'h': '#frag', 't': 'f'},
           {'c': doc_id % 11 = 0, 'h': '../../../deep/' || p, 't': 'dd'},
           {'c': doc_id % 4 = 0, 'h': '/squote/' || m6, 't': 'sq'}
           ], e -> e.c) AS es FROM m),
         x AS (SELECT doc_id, es,
           unnest(generate_series(1, len(es))) AS i FROM le)
         SELECT doc_id, CAST(i - 1 AS INT) AS ord,
           es[i].h AS href, es[i].t AS anchor_text
         FROM x ORDER BY doc_id, ord""",

    "url_domain_pagerank" ->
      s"""WITH m AS (SELECT doc_id,
           'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS src,
           CAST(doc_id % 3 AS VARCHAR) AS m3 FROM documents),
         dd AS (SELECT doc_id, src,
           unnest(list_transform(list_filter([
             {'c': true, 'd': 'ext' || m3 || '.example'},
             {'c': true, 'd': 'cdn.example'},
             {'c': doc_id % 2 = 0, 'd': 'cdn.example'},
             {'c': doc_id % 9 = 0, 'd': 'ext1.example'}
           ], x -> x.c), x -> x.d)) AS dst FROM m),
         eg AS (SELECT DISTINCT src AS sd, dst AS dmn FROM dd),
         nd0 AS (SELECT sd AS domain FROM eg UNION SELECT dmn FROM eg),
         nodes AS (SELECT domain,
           ${hexValSql("md5(domain)", 8)} AS node FROM nd0),
         nn AS (SELECT count(*) AS nb, CAST(count(*) AS DOUBLE) AS nd
           FROM nodes),
         e AS (SELECT ns.node AS src, nt.node AS dst FROM eg
           JOIN nodes ns ON eg.sd = ns.domain
           JOIN nodes nt ON eg.dmn = nt.domain),
         deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY 1),
         r0 AS (SELECT node, ${prQuant("CAST(1.0 AS DOUBLE) / nn.nd")} AS r
             FROM nodes CROSS JOIN nn),
         d1 AS (SELECT coalesce(sum(r), 0) AS dang FROM r0
                LEFT JOIN deg ON r0.node = deg.src WHERE deg.d IS NULL),
         c1 AS (SELECT e.dst AS node, sum(${prQuant("r0.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
         r1 AS (SELECT r0.node, ${prQuant(prStep("c1", "d1"))} AS r
             FROM r0 LEFT JOIN c1 USING (node) CROSS JOIN d1 CROSS JOIN nn),
         d2 AS (SELECT coalesce(sum(r), 0) AS dang FROM r1
                LEFT JOIN deg ON r1.node = deg.src WHERE deg.d IS NULL),
         c2 AS (SELECT e.dst AS node, sum(${prQuant("r1.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
         r2 AS (SELECT r1.node, ${prQuant(prStep("c2", "d2"))} AS r
             FROM r1 LEFT JOIN c2 USING (node) CROSS JOIN d2 CROSS JOIN nn),
         d3 AS (SELECT coalesce(sum(r), 0) AS dang FROM r2
                LEFT JOIN deg ON r2.node = deg.src WHERE deg.d IS NULL),
         c3 AS (SELECT e.dst AS node, sum(${prQuant("r2.r / deg.d")}) AS c
                FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
         r3 AS (SELECT r2.node, ${prQuant(prStep("c3", "d3"))} AS r
             FROM r2 LEFT JOIN c3 USING (node) CROSS JOIN d3 CROSS JOIN nn)
         SELECT nodes.domain,
           floor(r3.r * nn.nd * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS rank_norm
         FROM r3 JOIN nodes USING (node) CROSS JOIN nn ORDER BY domain""",

    "url_frontier_next" ->
      """WITH m AS (SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS k,
           CAST(doc_id % 25 AS VARCHAR) AS p, CAST(doc_id % 3 AS VARCHAR) AS m3,
           CAST(doc_id % 4 AS VARCHAR) AS m4, CAST(doc_id % 5 AS VARCHAR) AS m5,
           CAST(doc_id % 7 AS VARCHAR) AS m7 FROM documents),
         b AS (SELECT *, 'https://site' || k || '.example' AS origin FROM m),
         c0 AS (SELECT unnest(list_transform(list_filter([
           {'c': true, 'u': 'https://ext' || m3 || '.example/abs/' || p},
           {'c': true, 'u': 'https://cdn.example/lib/' || m4},
           {'c': true, 'u': origin || '/root/item?id=' || p},
           {'c': true, 'u': origin || '/a/up/' || m7},
           {'c': true, 'u': origin || '/a/b/same/' || m5},
           {'c': true, 'u': origin || '/a/b/plain/rel' || m3},
           {'c': doc_id % 2 = 0,
              'u': origin || '/a/b/page' || p || '.html?page=' || p},
           {'c': doc_id % 11 = 0, 'u': origin || '/deep/' || p}
           ], e -> e.c), e -> e.u)) AS url FROM b),
         c AS (SELECT DISTINCT url FROM c0),
         h AS (SELECT url,
           regexp_extract(url, '^https://([^/]+)', 1) AS host FROM c),
         s AS (SELECT host, url,
           CAST(CASE WHEN host = 'cdn.example' THEN 0.5
             WHEN starts_with(host, 'site') THEN 2.0
             ELSE NULL END AS DOUBLE) AS crawl_delay,
           CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
             AS INT) AS slot
           FROM h)
         SELECT host, url, crawl_delay, slot,
           CAST(slot AS DOUBLE) * coalesce(crawl_delay, CAST(1.0 AS DOUBLE))
             AS fetch_at_s
         FROM s ORDER BY host, url""",

    "text_sentences" ->
      s"""WITH f AS (SELECT doc_id,
           'Intro ' || string_split(text, ' ')[1] || ' opens. Then two! Three? '
           || 'Dr. ' || string_split(text, ' ')[1]
           || ' met Mr. Jones e.g. at 3.14 p.m. on Jan. 5. '
           || CASE WHEN doc_id % 2 = 0
                THEN 'Quoted "End." Follows now. ' ELSE '' END
           || CASE WHEN doc_id % 3 = 0
                THEN 'Wait... Then go. ' ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                THEN 'Ellipsis trails... and continues here. ' ELSE '' END
           || 'Tail without terminator' AS page FROM documents),
         p0 AS (SELECT doc_id,
           replace(replace(page, chr(1), ''), chr(2), '') AS s FROM f),
         p1 AS (SELECT doc_id, $sentMultiFoldSql AS s FROM p0),
         p2 AS (SELECT doc_id, $sentAbbrevFoldSql AS s FROM p1),
         p3 AS (SELECT doc_id, regexp_replace(s,
           '([.!?]+["'')\\]]*)[ \\t\\n\\r\\f]+([A-Z0-9"''(\\[])',
           '\\1' || chr(2) || '\\2', 'g') AS s FROM p2),
         sp AS (SELECT doc_id,
           list_filter(list_transform(string_split(s, chr(2)),
             x -> trim(replace(x, chr(1), '.'))), x -> x <> '') AS ss
           FROM p3),
         e AS (SELECT doc_id, ss,
           unnest(generate_series(1, len(ss))) AS i FROM sp)
         SELECT doc_id, CAST(i - 1 AS INT) AS sent_no, ss[i] AS sentence
         FROM e ORDER BY doc_id, sent_no""",

    "text_html_meta" ->
      """SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) || ' & more' AS title,
           CASE WHEN doc_id % 3 = 0
             THEN 'Desc "' || CAST(doc_id % 25 AS VARCHAR) || '" here'
             ELSE '' END AS description,
           CASE WHEN doc_id % 2 = 0
             THEN 'OG ' || CAST(doc_id % 25 AS VARCHAR)
             ELSE '' END AS og_title,
           CASE WHEN doc_id % 5 = 0
             THEN 'https://site' || CAST(doc_id % 5 AS VARCHAR)
               || '.example/canon/' || CAST(doc_id % 25 AS VARCHAR)
             ELSE '' END AS canonical
         FROM documents ORDER BY doc_id""",

    "ingest_http_responses" ->
      """WITH v AS (SELECT doc_id, doc_id % 6 AS k, text FROM documents),
         d AS (SELECT doc_id, k,
           CASE k
             WHEN 0 THEN '<html><body>' || text || ' café Ωμέγα</body></html>'
             WHEN 1 THEN '<html><head><meta charset="shift_jis"></head><body>'
               || text || ' 日本語テキスト</body></html>'
             WHEN 2 THEN 'not found ' || text
             WHEN 3 THEN '<html><body>' || text || ' gzipped café</body></html>'
             WHEN 4 THEN '<html><body>' || text || ' café</body></html>'
             ELSE '' END AS td
           FROM v)
         SELECT doc_id,
           CAST(CASE k WHEN 2 THEN 404 WHEN 5 THEN 301 ELSE 200 END
             AS INT) AS status,
           CASE k WHEN 2 THEN 'text/plain' ELSE 'text/html' END
             AS content_type,
           CASE k WHEN 0 THEN 'utf-8' WHEN 1 THEN 'shift_jis'
             WHEN 3 THEN 'utf-8' WHEN 4 THEN 'windows-1252'
             ELSE '' END AS charset_hint,
           CASE k WHEN 3 THEN 'gzip' ELSE '' END AS content_encoding,
           CAST(CASE k WHEN 0 THEN 2 WHEN 3 THEN 2 WHEN 5 THEN 2
             ELSE 1 END AS INT) AS n_headers,
           CASE k WHEN 0 THEN 'utf-8' WHEN 1 THEN 'shift_jis'
             WHEN 3 THEN 'utf-8' WHEN 4 THEN 'windows-1252'
             ELSE 'ascii' END AS charset,
           td AS text_decoded,
           CAST(CASE k WHEN 0 THEN octet_length(encode(td))
             WHEN 1 THEN length(td) + 7
             WHEN 3 THEN octet_length(encode(td))
             ELSE length(td) END AS BIGINT) AS n_bytes
         FROM d ORDER BY doc_id""",

    // both directions through translate() from the shared table: the
    // oracle garbles with the same confuse map and folds with the
    // FULL fold map the kernel uses
    "text_confusable_fold" ->
      s"""SELECT doc_id,
           translate(translate(text, '${sqlLit(confuseFrom)}', '${sqlLit(confuseTo)}'),
             '${sqlLit(foldFrom)}', '${sqlLit(foldTo)}') AS folded
         FROM documents WHERE doc_id < 300 ORDER BY doc_id""",

    "dedup_confusable_pairs" ->
      s"""WITH planted AS (SELECT doc_id + 3000000 AS doc_id,
             translate(text, '${sqlLit(confuseFrom)}', '${sqlLit(confuseTo)}') AS text
           FROM documents WHERE doc_id % 20 = 0),
         ad AS (SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id, text FROM planted),
         g AS (SELECT md5(lower(translate(text, '${sqlLit(foldFrom)}', '${sqlLit(foldTo)}'))) AS k,
                 doc_id FROM ad),
         gg AS (SELECT k, list_sort(list(doc_id)) AS ids FROM g GROUP BY 1)
         SELECT ids[1] AS id_a, unnest(ids[2:]) AS id_b
         FROM gg WHERE len(ids) >= 2 ORDER BY 1, 2""",

    "text_mojibake_fix" ->
      """SELECT doc_id,
           text || CASE doc_id % 5 WHEN 0 THEN ''
             WHEN 1 THEN ' café — naïve ’quote’'
             WHEN 2 THEN ' café résumé'
             WHEN 3 THEN ' déjà vu'
             ELSE ' l’élan — 20€' END AS text_fixed,
           CAST(CASE doc_id % 5 WHEN 0 THEN 0 WHEN 1 THEN 0
             WHEN 2 THEN 1 WHEN 3 THEN 2 ELSE 1 END AS INT) AS n_rounds
         FROM documents ORDER BY doc_id""",

    "ingest_warc_records" ->
      """WITH info AS (SELECT 'software: graft-crawler/1.0'
             || chr(13) || chr(10) AS ip)
         SELECT doc_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
           CAST(NULL AS VARCHAR) AS target_uri,
           CAST(strlen(ip) AS BIGINT) AS content_length,
           md5(ip) AS payload_md5
         FROM documents CROSS JOIN info
         UNION ALL
         SELECT doc_id, 1, 'response',
           'http://example.com/doc/' || doc_id,
           CAST(strlen(text) AS BIGINT), md5(text)
         FROM documents
         ORDER BY doc_id, rec_idx""",

    // decompressed .warc.gz content is byte-identical to the plain
    // container, so the oracle is the same record restatement
    "ingest_warc_gz_records" ->
      """WITH info AS (SELECT 'software: graft-crawler/1.0'
             || chr(13) || chr(10) AS ip)
         SELECT doc_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
           CAST(NULL AS VARCHAR) AS target_uri,
           CAST(strlen(ip) AS BIGINT) AS content_length,
           md5(ip) AS payload_md5
         FROM documents CROSS JOIN info
         UNION ALL
         SELECT doc_id, 1, 'response',
           'http://example.com/doc/' || doc_id,
           CAST(strlen(text) AS BIGINT), md5(text)
         FROM documents
         ORDER BY doc_id, rec_idx""",

    // full independent restatement of the URL mint AND the
    // canonicalization chain (fragment/userinfo strip, scheme+host
    // lowercase, default-port drop, trailing-slash norm, tracking-param
    // filter + sort) — step CTEs mirror the Column pipeline 1:1
    "url_canonical_dedup" ->
      s"""WITH raw AS (
           SELECT doc_id,
             (CASE WHEN doc_id % 25 < 5 THEN 'www.' ELSE '' END)
               || 'site' || CAST(doc_id % 5 AS VARCHAR)
               || (CASE WHEN (doc_id % 5) % 2 = 0 THEN '.co.uk' ELSE '.com' END) AS host,
             CAST(doc_id % 25 AS VARCHAR) AS p
           FROM documents),
         minted AS (
           SELECT doc_id, CASE doc_id % 4
             WHEN 0 THEN 'http://' || upper(host) || '/page/' || p || '/'
             WHEN 1 THEN 'HTTP://' || host || ':80/page/' || p || '?utm_source=feed'
             WHEN 2 THEN 'http://user@' || host || '/page/' || p || '#section'
             ELSE host || '/page/' || p END AS url
           FROM raw),
         ${urlCanonCteSql("minted")}
         SELECT url_canonical, min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(DISTINCT url) AS BIGINT) AS n_spellings
         FROM canon GROUP BY url_canonical ORDER BY url_canonical""",

    "url_host_stats" ->
      s"""WITH raw AS (
           SELECT doc_id,
             (CASE WHEN doc_id % 25 < 5 THEN 'www.' ELSE '' END)
               || 'site' || CAST(doc_id % 5 AS VARCHAR)
               || (CASE WHEN (doc_id % 5) % 2 = 0 THEN '.co.uk' ELSE '.com' END) AS host,
             CAST(doc_id % 25 AS VARCHAR) AS p
           FROM documents),
         minted AS (
           SELECT doc_id, CASE doc_id % 4
             WHEN 0 THEN 'http://' || upper(host) || '/page/' || p || '/'
             WHEN 1 THEN 'HTTP://' || host || ':80/page/' || p || '?utm_source=feed'
             WHEN 2 THEN 'http://user@' || host || '/page/' || p || '#section'
             ELSE host || '/page/' || p END AS url
           FROM raw),
         ${urlCanonCteSql("minted")},
         dom AS (SELECT doc_id, url_canonical,
           ${registeredDomainSql("chost")} AS domain
           FROM canon)
         SELECT domain, CAST(count(DISTINCT url_canonical) AS BIGINT) AS n_urls,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM dom GROUP BY domain ORDER BY domain""",

    "url_exotic_domains" ->
      s"""WITH raw AS (SELECT doc_id,
           (CASE WHEN doc_id % 3 = 0 THEN 'shop.' ELSE '' END)
             || 'site' || CAST(doc_id % 7 AS VARCHAR) || '.'
             || (CASE doc_id % 12 WHEN 0 THEN 'com.sg' WHEN 1 THEN 'co.nz'
                 WHEN 2 THEN 'com.hk' WHEN 3 THEN 'k12.ca.us'
                 WHEN 4 THEN 'co.uk' WHEN 5 THEN 'com'
                 WHEN 6 THEN 'vic.edu.au' WHEN 7 THEN 'org'
                 WHEN 8 THEN 'ck' WHEN 9 THEN 'www.ck'
                 WHEN 10 THEN 'kawasaki.jp'
                 ELSE 'city.kawasaki.jp' END) AS host
           FROM documents),
         d AS (SELECT host, ${registeredDomainSql("host")} AS domain FROM raw)
         SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
         FROM d GROUP BY domain ORDER BY domain""",

    "mm_decode_real" ->
      """WITH m AS (SELECT doc_id, doc_id % 8 AS k,
           1 + doc_id % 37 AS w, 1 + doc_id % 23 AS h,
           octet_length(CAST(text AS BLOB)) AS n FROM documents)
         SELECT doc_id,
           CASE WHEN k = 0 THEN 'unknown' WHEN k <= 2 THEN 'bmp'
                WHEN k = 3 THEN 'ppm' WHEN k = 4 THEN 'pgm'
                WHEN k = 5 THEN 'webp' WHEN k = 6 THEN 'webp-l'
                ELSE 'webp-anim' END AS format,
           CAST(CASE WHEN k = 0 THEN n
                WHEN k <= 2 THEN 54 + h * ((3 * w + 3) // 4 * 4)
                WHEN k = 3 THEN octet_length(CAST('P6' || chr(10)
                  || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)
                  || chr(10) || '255' || chr(10) AS BLOB)) + 3 * w * h
                WHEN k = 4 THEN octet_length(CAST('P5' || chr(10)
                  || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)
                  || chr(10) || '255' || chr(10) AS BLOB)) + w * h
                WHEN k = 5 THEN 2048 + 128 * (doc_id % 3)
                WHEN k = 6 THEN 1024 + 64 * (doc_id % 5)
                ELSE 4096 + 128 * (doc_id % 3) END AS BIGINT) AS byte_len,
           CAST(CASE WHEN k = 0 THEN 256 + n % 256
                WHEN k = 5 THEN 16 * (1 + doc_id % 3) + 5
                WHEN k = 6 THEN 4 + doc_id % 9
                WHEN k = 7 THEN 40 ELSE w END AS INT) AS width,
           CAST(CASE WHEN k = 0 THEN 256 + (n * 31) % 256
                WHEN k = 5 THEN 16 * (1 + (doc_id // 8) % 2) + 3
                WHEN k = 6 THEN 3 + doc_id % 7
                WHEN k = 7 THEN 40 ELSE h END AS INT) AS height,
           CAST(CASE WHEN k = 4 THEN 1 WHEN k = 6 THEN 4
                ELSE 3 END AS INT) AS channels,
           CAST(CASE WHEN k = 7 THEN 2 + doc_id % 3
                ELSE 1 END AS INT) AS n_frames,
           CAST(CASE WHEN k = 0 THEN 0 ELSE 1 END AS INT) AS decoded
         FROM m ORDER BY doc_id""",

    "mm_bmp_variants" ->
      """WITH m AS (SELECT doc_id, doc_id % 4 AS k,
           3 + doc_id % 14 AS w, 2 + doc_id % 11 AS h
           FROM documents WHERE doc_id % 4 <> 0),
         gx AS (SELECT doc_id, k, w, h,
           unnest(generate_series(0, w - 1)) AS x FROM m),
         gxy AS (SELECT doc_id, k, w, h, x,
           unnest(generate_series(0, h - 1)) AS y FROM gx),
         lum AS (SELECT doc_id, w, h,
           CASE WHEN k = 1 THEN (doc_id + 5 * x + 9 * y) % 256
                WHEN k = 2 THEN
                  (299 * ((doc_id + 7 * x + 3 * y) % 256)
                 + 587 * (((doc_id + 7 * x + 3 * y) % 256 + 51) % 256)
                 + 114 * (((doc_id + 7 * x + 3 * y) % 256 + 102) % 256)) // 1000
                ELSE
                  (299 * ((doc_id * 3 + 2 * x + 11 * y) % 256)
                 + 587 * (((doc_id * 3 + 2 * x + 11 * y) % 256 + 33) % 256)
                 + 114 * (((doc_id * 3 + 2 * x + 11 * y) % 256 + 77) % 256)) // 1000
           END AS l FROM gxy)
         SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(l) AS BIGINT) AS sum_luma
         FROM lum GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_gray_stats" ->
      """WITH m AS (SELECT doc_id, doc_id % 8 AS k,
           CASE WHEN doc_id % 8 = 5 THEN 16 * (1 + doc_id % 3) + 5
                WHEN doc_id % 8 = 6 THEN 4 + doc_id % 9
                WHEN doc_id % 8 = 7 THEN 40
                ELSE 1 + doc_id % 37 END AS w,
           CASE WHEN doc_id % 8 = 5 THEN 16 * (1 + (doc_id // 8) % 2) + 3
                WHEN doc_id % 8 = 6 THEN 3 + doc_id % 7
                WHEN doc_id % 8 = 7 THEN 40
                ELSE 1 + doc_id % 23 END AS h
           FROM documents WHERE doc_id % 8 <> 0),
         gx AS (SELECT doc_id, k, w, h,
           unnest(generate_series(0, w - 1)) AS x FROM m),
         gxy AS (SELECT doc_id, k, w, h, x,
           unnest(generate_series(0, h - 1)) AS y FROM gx),
         lum AS (SELECT doc_id, w, h,
           CASE WHEN k = 4 THEN (x * 31 + y * 17 + doc_id) % 256
                WHEN k = 5 THEN
                  (doc_id * 7 + 11 * (x // 16) + 17 * (y // 16)) % 256
                WHEN k = 6 THEN (299 * ((doc_id + 3 * x + 7 * y) % 256)
                    + 587 * ((2 * doc_id + 5 * x + y) % 256)
                    + 114 * ((3 * doc_id + x + 11 * y) % 256)) // 1000
                WHEN k = 7 THEN CASE WHEN x < 16 AND y < 16
                    THEN (doc_id * 3) % 256 ELSE 0 END
                ELSE (299 * ((x * 31 + y * 17 + doc_id) % 256)
                    + 587 * (((x * 31 + y * 17 + doc_id) % 256 + 85) % 256)
                    + 114 * (((x * 31 + y * 17 + doc_id) % 256 + 170) % 256))
                    // 1000
           END AS l FROM gxy)
         SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(l) AS BIGINT) AS sum_luma
         FROM lum GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_gif_real" ->
      """WITH m AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
           FROM documents WHERE doc_id % 5 <> 0),
         gx AS (SELECT doc_id, w, h,
           unnest(generate_series(0, w - 1)) AS x FROM m),
         gxy AS (SELECT doc_id, w, h, x,
           unnest(generate_series(0, h - 1)) AS y FROM gx)
         SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum((doc_id + 3 * x + 5 * y) % 256) AS BIGINT) AS sum_luma
         FROM gxy GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_jpeg_real" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh
           FROM documents WHERE doc_id % 5 <> 0),
         gx AS (SELECT doc_id, bw, bh,
           unnest(generate_series(0, bw - 1)) AS bx FROM m),
         gxy AS (SELECT doc_id, bw, bh, bx,
           unnest(generate_series(0, bh - 1)) AS byy FROM gx)
         SELECT doc_id, CAST(8 * bw AS INT) AS width,
           CAST(8 * bh AS INT) AS height,
           CAST(sum(64 * ((doc_id + 7 * bx + 13 * byy) % 256)) AS BIGINT)
             AS sum_luma
         FROM gxy GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_png_variants" ->
      """WITH d AS (SELECT doc_id, 5 + doc_id % 8 AS w, 4 + doc_id % 5 AS h,
           doc_id % 6 AS k FROM documents WHERE doc_id % 6 <> 0),
         px AS (SELECT doc_id, w, h,
           CASE WHEN k = 1 THEN (doc_id + 3 * x + 5 * y) % 256
                WHEN k = 2 THEN ((doc_id * 257 + 4099 * x + 131 * y) % 65536) // 256
                WHEN k = 3 THEN 17 * ((doc_id + 3 * x + 5 * y) % 16)
                WHEN k = 4 THEN 255 * ((doc_id + x + y) % 2)
                ELSE 85 * ((doc_id + x + 2 * y) % 4)
           END AS v
           FROM d, unnest(generate_series(0, d.w - 1)) AS tx(x),
                unnest(generate_series(0, d.h - 1)) AS ty(y))
         SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS sum_luma
         FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_webp_real" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 9 AS w, 3 + doc_id % 7 AS h
           FROM documents WHERE doc_id % 7 <> 0),
         px AS (SELECT doc_id, w, h,
           (299 * ((doc_id + 3 * x + 7 * y) % 256)
            + 587 * ((2 * doc_id + 5 * x + y) % 256)
            + 114 * ((3 * doc_id + x + 11 * y) % 256)) // 1000 AS v
           FROM d, unnest(generate_series(0, d.w - 1)) AS tx(x),
                unnest(generate_series(0, d.h - 1)) AS ty(y))
         SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS sum_luma
         FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_webp_lossy_real" ->
      """WITH d AS (SELECT doc_id,
           16 * (1 + doc_id % 3) + CASE WHEN doc_id % 5 = 1 THEN 7 ELSE 0 END AS w,
           16 * (1 + doc_id % 2) + CASE WHEN doc_id % 5 = 3 THEN 5 ELSE 0 END AS h
           FROM documents WHERE doc_id % 7 <> 0),
         px AS (SELECT doc_id, w, h,
           (doc_id * 5 + 11 * (x // 16) + 17 * (y // 16)) % 256 AS v
           FROM d, unnest(generate_series(0, d.w - 1)) AS tx(x),
                unnest(generate_series(0, d.h - 1)) AS ty(y))
         SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS sum_luma
         FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_webp_anim_real" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS n
           FROM documents WHERE doc_id % 7 <> 0),
         fr AS (SELECT doc_id, unnest(generate_series(0, n - 1)) AS f FROM d),
         dims AS (SELECT doc_id, f,
           CASE WHEN f % 2 = 0 THEN 16 * (1 + (doc_id + f) % 2)
                ELSE 4 + (doc_id + f) % 9 END AS w,
           CASE WHEN f % 2 = 0 THEN 16 * (1 + (doc_id + f) % 2)
                ELSE 3 + (doc_id + f) % 7 END AS h
           FROM fr),
         px AS (SELECT doc_id, f, w, h,
           CASE WHEN f % 2 = 0
             THEN (doc_id * 3 + 7 * f + 11 * (x // 16) + 13 * (y // 16)) % 256
             ELSE (299 * ((doc_id + 3 * x + 7 * y + f) % 256)
                 + 587 * ((2 * doc_id + 5 * x + y + 3 * f) % 256)
                 + 114 * ((3 * doc_id + x + 11 * y + 5 * f) % 256)) // 1000
           END AS v
           FROM dims, unnest(generate_series(0, dims.w - 1)) AS tx(x),
                unnest(generate_series(0, dims.h - 1)) AS ty(y))
         SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(2 * (f % 3) AS INT) AS frame_x,
           CAST(2 * (f % 2) AS INT) AS frame_y,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS sum_luma
         FROM px GROUP BY doc_id, f, w, h
         ORDER BY doc_id, frame_idx""",

    "mm_webp_anim_composited" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS n
           FROM documents WHERE doc_id % 7 <> 0),
         f AS (SELECT doc_id, unnest(generate_series(0, n - 1)) AS fi FROM d),
         v AS (SELECT doc_id, fi,
           256 * ((doc_id * 3 + 7 * fi) % 256) AS s,
           (doc_id + fi) % 2 AS disp FROM f)
         SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           CAST(40 AS INT) AS width, CAST(40 AS INT) AS height,
           CAST(s + COALESCE(SUM(CASE WHEN disp = 0 THEN s END) OVER
             (PARTITION BY doc_id ORDER BY fi
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS sum_luma
         FROM v ORDER BY doc_id, frame_idx""",

    "mm_gif_anim_composited" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS n
           FROM documents WHERE doc_id % 5 <> 0),
         f AS (SELECT doc_id, unnest(generate_series(0, n - 1)) AS fi FROM d),
         v AS (SELECT doc_id, fi,
           256 * ((doc_id * 5 + 11 * fi) % 256) AS s,
           1 + (doc_id + fi) % 3 AS disp FROM f)
         SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           CAST(40 AS INT) AS width, CAST(40 AS INT) AS height,
           CAST(s + COALESCE(SUM(CASE WHEN disp = 1 THEN s END) OVER
             (PARTITION BY doc_id ORDER BY fi
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS sum_luma
         FROM v ORDER BY doc_id, frame_idx""",

    "mm_jpeg_progressive" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh
           FROM documents WHERE doc_id % 5 <> 0),
         gx AS (SELECT doc_id, bw, bh,
           unnest(generate_series(0, bw - 1)) AS bx FROM m),
         gxy AS (SELECT doc_id, bw, bh, bx,
           unnest(generate_series(0, bh - 1)) AS byy FROM gx)
         SELECT doc_id, CAST(8 * bw AS INT) AS width,
           CAST(8 * bh AS INT) AS height,
           CAST(sum(64 * ((doc_id + 11 * bx + 17 * byy) % 256)) AS BIGINT)
             AS sum_luma
         FROM gxy GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_jpeg_color" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
           FROM documents WHERE doc_id % 5 <> 0),
         gx AS (SELECT doc_id, bw, bh,
           unnest(generate_series(0, bw - 1)) AS bx FROM m),
         gxy AS (SELECT doc_id, bw, bh, bx,
           unnest(generate_series(0, bh - 1)) AS byy FROM gx),
         blk AS (SELECT doc_id, bw, bh,
           (doc_id + 7 * bx + 13 * byy) % 256 AS r,
           (3 * doc_id + 11 * bx + 5 * byy) % 256 AS g,
           (5 * doc_id + 3 * bx + 17 * byy) % 256 AS b
           FROM gxy),
         ycc AS (SELECT doc_id, bw, bh,
           (299 * r + 587 * g + 114 * b + 500) // 1000 AS yv,
           (-168736 * r - 331264 * g + 500000 * b + 128500000) // 1000000 AS cb,
           (500000 * r - 418688 * g - 81312 * b + 128500000) // 1000000 AS cr
           FROM blk),
         pix AS (SELECT doc_id, bw, bh,
           least(greatest((1000 * yv + 1402 * (cr - 128) + 256500) // 1000 - 256, 0), 255) AS rp,
           least(greatest((1000000 * yv - 344136 * (cb - 128) - 714136 * (cr - 128) + 256500000) // 1000000 - 256, 0), 255) AS gp,
           least(greatest((1000 * yv + 1772 * (cb - 128) + 256500) // 1000 - 256, 0), 255) AS bp
           FROM ycc)
         SELECT doc_id, CAST(16 * bw AS INT) AS width,
           CAST(16 * bh AS INT) AS height,
           CAST(sum(256 * rp) AS BIGINT) AS sum_r,
           CAST(sum(256 * gp) AS BIGINT) AS sum_g,
           CAST(sum(256 * bp) AS BIGINT) AS sum_b
         FROM pix GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_jpeg_cmyk" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh,
           doc_id % 2 AS t FROM documents WHERE doc_id % 5 <> 0),
         gx AS (SELECT doc_id, t, bw, bh,
           unnest(generate_series(0, bw - 1)) AS bx FROM m),
         gxy AS (SELECT doc_id, t, bw, bh, bx,
           unnest(generate_series(0, bh - 1)) AS byy FROM gx),
         blk AS (SELECT doc_id, t, bw, bh,
           (doc_id * 3 + 7 * bx + 13 * byy) % 256 AS s0,
           (doc_id * 5 + 7 * bx + 13 * byy + 29) % 256 AS s1,
           (doc_id * 7 + 7 * bx + 13 * byy + 58) % 256 AS s2,
           (doc_id * 9 + 7 * bx + 13 * byy + 87) % 256 AS s3
           FROM gxy),
         ink AS (SELECT doc_id, bw, bh, s3,
           CASE WHEN t = 0 THEN s0 ELSE least(greatest(
             (1000 * s0 + 1402 * (s2 - 128) + 256500) // 1000 - 256,
             0), 255) END AS c,
           CASE WHEN t = 0 THEN s1 ELSE least(greatest(
             (1000000 * s0 - 344136 * (s1 - 128) - 714136 * (s2 - 128)
              + 256500000) // 1000000 - 256, 0), 255) END AS mk,
           CASE WHEN t = 0 THEN s2 ELSE least(greatest(
             (1000 * s0 + 1772 * (s1 - 128) + 256500) // 1000 - 256,
             0), 255) END AS yv
           FROM blk),
         pix AS (SELECT doc_id, bw, bh,
           (299 * ((c * s3) // 255) + 587 * ((mk * s3) // 255)
            + 114 * ((yv * s3) // 255)) // 1000 AS l
           FROM ink)
         SELECT doc_id, CAST(8 * bw AS INT) AS width,
           CAST(8 * bh AS INT) AS height,
           CAST(sum(64 * l) AS BIGINT) AS sum_luma
         FROM pix GROUP BY 1, 2, 3 ORDER BY doc_id""",

    "mm_resize_real" ->
      """WITH m AS (SELECT doc_id, doc_id % 8 AS k,
           CASE WHEN doc_id % 8 = 5 THEN 16 * (1 + doc_id % 3) + 5
                WHEN doc_id % 8 = 6 THEN 4 + doc_id % 9
                WHEN doc_id % 8 = 7 THEN 40
                ELSE 1 + doc_id % 37 END AS w,
           CASE WHEN doc_id % 8 = 5 THEN 16 * (1 + (doc_id // 8) % 2) + 3
                WHEN doc_id % 8 = 6 THEN 3 + doc_id % 7
                WHEN doc_id % 8 = 7 THEN 40
                ELSE 1 + doc_id % 23 END AS h
           FROM documents WHERE doc_id % 8 <> 0),
         gx AS (SELECT doc_id, k, w, h,
           unnest(generate_series(0, 7)) AS x FROM m),
         gxy AS (SELECT doc_id, k, w, h, x,
           unnest(generate_series(0, 7)) AS y FROM gx),
         src AS (SELECT doc_id, k,
           (x * w) // 8 AS sx, (y * h) // 8 AS sy FROM gxy),
         lum AS (SELECT doc_id,
           CASE WHEN k = 4 THEN (sx * 31 + sy * 17 + doc_id) % 256
                WHEN k = 5 THEN
                  (doc_id * 7 + 11 * (sx // 16) + 17 * (sy // 16)) % 256
                WHEN k = 6 THEN (299 * ((doc_id + 3 * sx + 7 * sy) % 256)
                    + 587 * ((2 * doc_id + 5 * sx + sy) % 256)
                    + 114 * ((3 * doc_id + sx + 11 * sy) % 256)) // 1000
                WHEN k = 7 THEN CASE WHEN sx < 16 AND sy < 16
                    THEN (doc_id * 3) % 256 ELSE 0 END
                ELSE (299 * ((sx * 31 + sy * 17 + doc_id) % 256)
                    + 587 * (((sx * 31 + sy * 17 + doc_id) % 256 + 85) % 256)
                    + 114 * (((sx * 31 + sy * 17 + doc_id) % 256 + 170) % 256))
                    // 1000
           END AS l FROM src)
         SELECT doc_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
           CAST(sum(l) AS BIGINT) AS sum_gray
         FROM lum GROUP BY 1 ORDER BY doc_id""",

    "audio_decode_real" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS ch,
           8000 * (1 + doc_id % 3) AS sr, 512 + (doc_id % 4) * 256 AS n
           FROM documents WHERE doc_id % 7 <> 0)
         SELECT doc_id, 'wav' AS format, CAST(sr AS INT) AS sample_rate,
           CAST(ch AS INT) AS channels, CAST(16 AS INT) AS bits,
           CAST(n AS INT) AS n_samples,
           CAST(44 + 2 * ch * n AS BIGINT) AS byte_len
         FROM d ORDER BY doc_id""",

    "audio_features_real" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS ch,
           512 + (doc_id % 4) * 256 AS n
           FROM documents WHERE doc_id % 7 <> 0),
         s AS (SELECT d.doc_id, i,
             ((d.doc_id * 131 + i * 71) % 65536) - 32768
             + CASE WHEN d.ch = 2
                 THEN ((d.doc_id * 131 + i * 71 + 53) % 65536) - 32768
                 ELSE 0 END AS v
           FROM d, unnest(generate_series(0, d.n - 1)) AS t(i)),
         w AS (SELECT doc_id, i, i // 256 AS win, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
           FROM s)
         SELECT doc_id, CAST(win AS BIGINT) AS win,
           CAST(sum(v * v) AS BIGINT) AS sum_sq,
           CAST(max(abs(v)) AS BIGINT) AS peak,
           CAST(sum(CASE WHEN i % 256 <> 0 AND ((pv < 0) <> (v < 0))
             THEN 1 ELSE 0 END) AS BIGINT) AS zc
         FROM w GROUP BY doc_id, win ORDER BY doc_id, win""",

    "audio_dedup_pairs" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS ch,
           512 + (doc_id % 4) * 256 AS n
           FROM documents WHERE doc_id % 7 <> 0),
         dd AS (SELECT doc_id, doc_id AS base, ch, n FROM d
                UNION ALL
                SELECT doc_id + 1000000, doc_id, ch, n FROM d
                WHERE doc_id % 10 = 1),
         s AS (SELECT dd.doc_id, (i * 64) // dd.n AS win,
             CAST(((dd.base * 131 + i * 71) % 65536) - 32768 AS BIGINT)
             + CASE WHEN dd.ch = 2
                 THEN ((dd.base * 131 + i * 71 + 53) % 65536) - 32768
                 ELSE 0 END AS v
           FROM dd, unnest(generate_series(0, dd.n - 1)) AS t(i)),
         e AS (SELECT doc_id, win, sum(v * v) AS e
           FROM s GROUP BY 1, 2),
         bt AS (SELECT doc_id, win,
             CASE WHEN e >= lag(e) OVER (PARTITION BY doc_id ORDER BY win)
               THEN 1 ELSE 0 END AS bit
           FROM e),
         fp AS (SELECT doc_id,
             CAST(sum(CASE WHEN win >= 1 AND bit = 1
               THEN (1::BIGINT << (win - 1)) ELSE 0 END) AS BIGINT) AS fp
           FROM bt GROUP BY 1)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
         FROM fp a, fp b
         WHERE a.doc_id < b.doc_id AND bit_count(xor(a.fp, b.fp)) <= 3
         ORDER BY 1, 2""",

    "audio_dedup_indexed" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS ch,
           512 + (doc_id % 4) * 256 AS n
           FROM documents WHERE doc_id % 7 <> 0),
         dd AS (SELECT doc_id, doc_id AS base, ch, n FROM d
                UNION ALL
                SELECT doc_id + 1000000, doc_id, ch, n FROM d
                WHERE doc_id % 10 = 1),
         s AS (SELECT dd.doc_id, (i * 64) // dd.n AS win,
             CAST(((dd.base * 131 + i * 71) % 65536) - 32768 AS BIGINT)
             + CASE WHEN dd.ch = 2
                 THEN ((dd.base * 131 + i * 71 + 53) % 65536) - 32768
                 ELSE 0 END AS v
           FROM dd, unnest(generate_series(0, dd.n - 1)) AS t(i)),
         e AS (SELECT doc_id, win, sum(v * v) AS e
           FROM s GROUP BY 1, 2),
         bt AS (SELECT doc_id, win,
             CASE WHEN e >= lag(e) OVER (PARTITION BY doc_id ORDER BY win)
               THEN 1 ELSE 0 END AS bit
           FROM e),
         fp AS (SELECT doc_id,
             CAST(sum(CASE WHEN win >= 1 AND bit = 1
               THEN (1::BIGINT << (win - 1)) ELSE 0 END) AS BIGINT) AS fp
           FROM bt GROUP BY 1)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
         FROM fp a, fp b
         WHERE a.doc_id < b.doc_id AND bit_count(xor(a.fp, b.fp)) <= 3
           AND b.doc_id >= 1000000
         ORDER BY 1, 2""",

    // G.711: restate the closed-form code stream, then the CCITT
    // expand — µ-law: u = 255-code, t = ((u%16)*8+132) << ((u//16)%8),
    // sign off bit 7; A-law: a = code XOR 0x55, segment 0 linear else
    // ((a%16)*16+264) << (seg-1) — and re-aggregate the channel-sum
    // mixdown. Any sign/segment/bias slip shifts every aggregate.
    "audio_g711_real" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS ch,
           256 + (doc_id % 4) * 128 AS n,
           ((doc_id // 2) % 2 = 0) AS alaw
           FROM documents WHERE doc_id % 7 <> 0),
         cf AS (SELECT d.doc_id, d.alaw, d.n, i, c,
           (d.doc_id * 37 + i * 11 + c * 5) % 256 AS code
           FROM d, unnest(generate_series(0, d.n - 1)) AS ti(i),
                unnest(generate_series(0, d.ch - 1)) AS tc(c)),
         dec AS (SELECT doc_id, n, i,
           CASE WHEN alaw THEN
             (CASE WHEN xor(code, 85) >= 128 THEN 1 ELSE -1 END) *
             (CASE WHEN ((xor(code, 85) // 16) % 8) = 0
               THEN (xor(code, 85) % 16) * 16 + 8
               ELSE ((xor(code, 85) % 16) * 16 + 264)
                    * (1 << (((xor(code, 85) // 16) % 8) - 1)) END)
           ELSE
             CASE WHEN (255 - code) >= 128
               THEN 132 - ((((255 - code) % 16) * 8 + 132)
                           * (1 << (((255 - code) // 16) % 8)))
               ELSE ((((255 - code) % 16) * 8 + 132)
                     * (1 << (((255 - code) // 16) % 8))) - 132
             END
           END AS v
           FROM cf),
         mix AS (SELECT doc_id, n, i, sum(v) AS m FROM dec GROUP BY 1, 2, 3)
         SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(n AS INT) AS n_samples,
           CAST(sum(m) AS BIGINT) AS mix_sum,
           CAST(min(m) AS INT) AS mix_min,
           CAST(max(m) AS INT) AS mix_max
         FROM mix GROUP BY 1, 2, 3, 4 ORDER BY doc_id""",

    // IMA ADPCM: replay the bit-exact predictor recurrence as a
    // recursive CTE over (doc, block, nibble) — state j=-1 is the
    // block-header predictor (sample 0), each step consumes nibble
    // j+1 via diff = step//8 + nib2*step + nib1*step//2 + nib0*step//4,
    // ± by bit 3, clamp to int16, index-advance clamp to [0,88].
    "audio_adpcm_real" ->
      ("""WITH RECURSIVE d AS (SELECT doc_id, 1 + doc_id % 2 AS blocks
           FROM documents WHERE doc_id % 7 <> 0),
         blk AS (SELECT doc_id, blocks, b
           FROM d, unnest(generate_series(0, d.blocks - 1)) AS t(b)),
         steps AS (SELECT unnest(generate_series(0, 88)) AS i,
           unnest([""" + graft.ops.Codecs.imaStepTable.mkString(",") +
        """]) AS s),
         nb AS (SELECT blk.doc_id, blk.b, j,
             (blk.doc_id * 13 + blk.b * 29 + j * 7) % 16 AS nib
           FROM blk, unnest(generate_series(0, 63)) AS t(j)),
         st AS (
           SELECT doc_id, blocks, b, -1 AS j,
             CAST((doc_id * 97 + b * 41) % 4096 - 2048 AS BIGINT) AS pred,
             CAST((doc_id * 31 + b * 17) % 89 AS BIGINT) AS idx
           FROM blk
           UNION ALL
           SELECT s.doc_id, s.blocks, s.b, s.j + 1,
             least(greatest(s.pred
               + (CASE WHEN nb.nib >= 8 THEN -1 ELSE 1 END)
                 * (t.s // 8
                    + CASE WHEN (nb.nib % 8) >= 4 THEN t.s ELSE 0 END
                    + CASE WHEN (nb.nib % 4) >= 2 THEN t.s // 2 ELSE 0 END
                    + CASE WHEN (nb.nib % 2) = 1 THEN t.s // 4 ELSE 0 END),
               -32768), 32767),
             least(greatest(s.idx
               + CASE WHEN (nb.nib % 8) < 4 THEN -1
                      ELSE 2 * ((nb.nib % 8) - 3) END, 0), 88)
           FROM st s
           JOIN steps t ON t.i = s.idx
           JOIN nb ON nb.doc_id = s.doc_id AND nb.b = s.b AND nb.j = s.j + 1
           WHERE s.j < 63
         )
         SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS channels,
           CAST(blocks * 65 AS INT) AS n_samples,
           CAST(sum(pred) AS BIGINT) AS mix_sum,
           CAST(min(pred) AS INT) AS mix_min,
           CAST(max(pred) AS INT) AS mix_max,
           CAST(max(CASE WHEN b = blocks - 1 AND j = 63 THEN pred END)
             AS INT) AS mix_last
         FROM st GROUP BY 1, 2, 3, 4 ORDER BY doc_id"""),

    "video_decode_real" ->
      """WITH d AS (SELECT doc_id, 8 + 2 * (doc_id % 5) AS w,
           6 + 2 * (doc_id % 3) AS h, 2 + doc_id % 4 AS fr
           FROM documents WHERE doc_id % 7 <> 0)
         SELECT doc_id, 'y4m' AS format, CAST(w AS INT) AS width,
           CAST(h AS INT) AS height, CAST(25 AS INT) AS fps_num,
           CAST(1 AS INT) AS fps_den, CAST(fr AS INT) AS n_frames,
           CAST(length('YUV4MPEG2 W' || w || ' H' || h
             || ' F25:1 Ip A1:1 C420jpeg') + 1
             + fr * (6 + w * h + 2 * ((w // 2) * (h // 2))) AS BIGINT)
             AS byte_len
         FROM d ORDER BY doc_id""",

    "video_frame_luma" ->
      """WITH d AS (SELECT doc_id, 8 + 2 * (doc_id % 5) AS w,
           6 + 2 * (doc_id % 3) AS h, 2 + doc_id % 4 AS fr
           FROM documents WHERE doc_id % 7 <> 0),
         f AS (SELECT d.doc_id, d.w, d.h, fi
           FROM d, unnest(generate_series(0, d.fr - 1, 2)) AS t(fi)),
         p AS (SELECT f.doc_id, f.fi,
             (f.doc_id + 11 * f.fi + 3 * x + 5 * y) % 256 AS yv
           FROM f, unnest(generate_series(0, f.w - 1)) AS tx(x),
             unnest(generate_series(0, f.h - 1)) AS ty(y))
         SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           CAST(sum(yv) AS BIGINT) AS sum_y
         FROM p GROUP BY 1, 2 ORDER BY 1, 2""",

    "dsir_logweights" ->
      s"""WITH $dsirWeightsCte
         SELECT doc_id, n_grams, logw FROM w ORDER BY doc_id""",

    "dsir_resample" ->
      s"""WITH $dsirWeightsCte,
         k AS (SELECT doc_id, logw,
             round(logw / 2.0 - ln(-ln(
               (${hexValSql("md5(CAST(doc_id AS VARCHAR) || '#7')", 6)} + 0.5)
                 / 16777216.0)), 6) AS skey
           FROM w)
         SELECT doc_id, logw, skey FROM k
         ORDER BY skey DESC, doc_id LIMIT 150""",

    "dsir_logweights_indexed" ->
      s"""WITH toks AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
           FROM documents),
         uni AS (SELECT doc_id, unnest(t) AS g FROM toks),
         big0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         big AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS g FROM big0),
         grams AS (SELECT doc_id, g FROM uni
           UNION ALL SELECT doc_id, g FROM big),
         d AS (SELECT doc_id, ${hexValSql("md5(g)", 4)} % 4096 AS b,
             count(*) AS c
           FROM grams GROUP BY 1, 2),
         fl AS (SELECT doc_id, (lang = 'en') AS is_t FROM documents),
         gb AS (SELECT b, sum(c) AS cr,
             sum(CASE WHEN is_t THEN c ELSE 0 END) AS ct
           FROM d JOIN fl USING (doc_id)
           WHERE d.doc_id >= 50 GROUP BY 1),
         tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM gb)
         SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_grams,
           round(sum(d.c *
             (ln((coalesce(gb.ct, 0) + 0.25) / (tot.nt + 0.25 * 4096))
            - ln((coalesce(gb.cr, 0) + 0.25) / (tot.nr + 0.25 * 4096)))),
             6) AS logw
         FROM d LEFT JOIN gb USING (b) CROSS JOIN tot
         WHERE d.doc_id < 50 GROUP BY 1 ORDER BY 1""",

    "semdedup_label_exact" ->
      """WITH RECURSIVE e AS (SELECT vec_id, label, embedding
           FROM embeddings WHERE vec_id < 300),
         cent AS (SELECT label, pos, round(avg(CAST(v AS DOUBLE)), 6) AS m
           FROM (SELECT label, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS pos FROM e)
           GROUP BY 1, 2),
         cl AS (SELECT label, list(m ORDER BY pos) AS cvec
           FROM cent GROUP BY 1),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
           WHERE round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   q -> CAST(q[1] AS DOUBLE) * q[2]))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
                * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x)))),
               4) >= 0.35),
         ed AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM ed
           UNION
           SELECT r.src, ed.dst FROM reach r JOIN ed ON r.dst = ed.src),
         mm AS (SELECT src AS id, min(dst) AS mn FROM reach GROUP BY 1),
         comp AS (SELECT e.vec_id, e.label, e.embedding,
             coalesce(least(mm.id, mm.mn), e.vec_id) AS component
           FROM e LEFT JOIN mm ON e.vec_id = mm.id),
         cs AS (SELECT c.vec_id, c.label, c.component,
             round(list_sum(list_transform(list_zip(c.embedding, cl.cvec),
                     q -> CAST(q[1] AS DOUBLE) * q[2]))
               / (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(cl.cvec, x -> x * x)))),
                 4) AS ccos
           FROM comp c JOIN cl ON c.label = cl.label)
         SELECT vec_id, CAST(label AS BIGINT) AS cluster, component, ccos,
           CAST(row_number() OVER (PARTITION BY component
               ORDER BY ccos ASC, vec_id ASC) = 1 AS BIGINT) AS keep
         FROM cs ORDER BY vec_id""",

    "text_hash_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(
             regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
           FROM documents WHERE doc_id < 100),
         d AS (SELECT doc_id, ${hexValSql("md5(token)", 4)} % 1024 AS pos,
             count(*) AS tf
           FROM toks WHERE token <> '' GROUP BY 1, 2),
         df AS (SELECT pos, count(*) AS df FROM d GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM d),
         wt AS (SELECT d.doc_id, d.pos,
             d.tf * (ln((n.n_docs + 1) / (df.df + 1.0)) + 1) AS w0
           FROM d JOIN df USING (pos) CROSS JOIN n),
         nrm AS (SELECT doc_id, sqrt(sum(w0 * w0)) AS nn
           FROM wt GROUP BY 1)
         SELECT wt.doc_id, wt.pos, round(wt.w0 / nrm.nn, 6) AS w
         FROM wt JOIN nrm USING (doc_id) ORDER BY doc_id, pos""",

    "text_sparse_cosine_pairs" ->
      s"""WITH toks AS (SELECT doc_id, unnest(
             regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
           FROM documents WHERE doc_id < 100),
         d AS (SELECT doc_id, ${hexValSql("md5(token)", 4)} % 1024 AS pos,
             count(*) AS tf
           FROM toks WHERE token <> '' GROUP BY 1, 2),
         df AS (SELECT pos, count(*) AS df FROM d GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM d),
         wt AS (SELECT d.doc_id, d.pos,
             d.tf * (ln((n.n_docs + 1) / (df.df + 1.0)) + 1) AS w0
           FROM d JOIN df USING (pos) CROSS JOIN n),
         nrm AS (SELECT doc_id, sqrt(sum(w0 * w0)) AS nn
           FROM wt GROUP BY 1),
         s AS (SELECT wt.doc_id, wt.pos, round(wt.w0 / nrm.nn, 6) AS w
           FROM wt JOIN nrm USING (doc_id)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(sum(a.w * b.w), 4) AS cos
           FROM s a JOIN s b ON a.pos = b.pos AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, cos FROM p WHERE cos >= 0.85
         ORDER BY id_a, id_b""",

    "dsir_pack_greedy" ->
      s"""WITH RECURSIVE $dsirWeightsCte,
         k AS (SELECT doc_id, logw,
             round(logw / 2.0 - ln(-ln(
               (${hexValSql("md5(CAST(doc_id AS VARCHAR) || '#7')", 6)} + 0.5)
                 / 16777216.0)), 6) AS skey
           FROM w),
         sel AS (SELECT doc_id FROM k ORDER BY skey DESC, doc_id LIMIT 150),
         pd AS (SELECT d0.doc_id, d0.n_tokens, d0.h,
             ${hexValSql("d0.h", 2)} % 8 AS shard
           FROM (SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                 AS n_tokens,
               md5(CAST(doc_id AS VARCHAR) || '#3') AS h
             FROM documents JOIN sel USING (doc_id)) d0
           WHERE n_tokens > 0),
         pr AS (SELECT doc_id, n_tokens, h, shard,
             row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
           FROM pd),
         pf AS (
           SELECT doc_id, shard, rn, n_tokens,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM pr WHERE rn = 1
           UNION ALL
           SELECT pr.doc_id, pr.shard, pr.rn, pr.n_tokens,
             CASE WHEN pf.fill + pr.n_tokens <= 2048
                  THEN pf.bin ELSE pf.bin + 1 END,
             CASE WHEN pf.fill + pr.n_tokens <= 2048
                  THEN pf.fill + pr.n_tokens ELSE pr.n_tokens END
           FROM pf JOIN pr ON pr.shard = pf.shard AND pr.rn = pf.rn + 1)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, n_tokens
         FROM pf ORDER BY shard, bin, doc_id""",

    "mine_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < 5),
         pairs AS (SELECT q.query_id, e.vec_id,
           round(list_sum(list_transform(list_zip(q.qe, e.embedding),
                   p -> CAST(p[1] AS DOUBLE) * p[2]))
             / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x)))
                * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))),
               4) AS score
           FROM q CROSS JOIN embeddings e WHERE q.query_id <> e.vec_id),
         banded AS (SELECT * FROM pairs WHERE score >= 0.15 AND score < 0.30),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, vec_id) AS rn FROM banded)
         SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
         ORDER BY query_id, score DESC, vec_id""",

    "ann_pq_adc_exact_sample" ->
      """WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
         q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         subs AS (SELECT unnest(range(0, 16)) AS s),
         cb AS (SELECT subs.s, b.vec_id AS code,
             list_transform(range(1, 5), d ->
               CAST(b.embedding[CAST(subs.s * 4 + d AS INT)] AS DOUBLE)) AS cvec
           FROM subs CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 16) b),
         d2 AS (SELECT c.vec_id, cb.s, cb.code,
             list_sum(list_transform(range(1, 5), d ->
               (CAST(c.embedding[CAST(cb.s * 4 + d AS INT)] AS DOUBLE) - cb.cvec[CAST(d AS INT)])
               * (CAST(c.embedding[CAST(cb.s * 4 + d AS INT)] AS DOUBLE) - cb.cvec[CAST(d AS INT)]))) AS d2
           FROM c CROSS JOIN cb),
         enc AS (SELECT vec_id, s, code FROM (SELECT vec_id, s, code,
             row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, code ASC) AS rn FROM d2)
           WHERE rn = 1),
         n2 AS (SELECT s, code, list_sum(list_transform(cvec, x -> x * x)) AS n2 FROM cb),
         lut AS (SELECT q.query_id, cb.s, cb.code,
             list_sum(list_transform(range(1, 5), d ->
               CAST(q.qe[CAST(cb.s * 4 + d AS INT)] AS DOUBLE) * cb.cvec[CAST(d AS INT)])) AS dot
           FROM q CROSS JOIN cb),
         qn AS (SELECT query_id, sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * x))) AS qn FROM q),
         sc AS (SELECT l.query_id, e.vec_id, sum(l.dot) AS sdot, sum(n2.n2) AS sn2
           FROM enc e JOIN lut l ON e.s = l.s AND e.code = l.code
           JOIN n2 ON e.s = n2.s AND e.code = n2.code
           GROUP BY 1, 2),
         scored AS (SELECT sc.query_id, sc.vec_id,
             round(sc.sdot / (qn.qn * sqrt(sc.sn2)), 4) AS score
           FROM sc JOIN qn USING (query_id)),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, vec_id) AS rn FROM scored)
         SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
         ORDER BY query_id, score DESC, vec_id""",
  ) ++ graft.streaming.StreamQueries.oracleSql
}
