package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.time._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator from SURVEY.md §2
  * through the engine (graft.Timeseries / graft.ops), against the
  * driver's parquet tables; `oracleSql` holds the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  *
  * Float policy: any double produced by reordering-sensitive math
  * (sums, means, rates) is round(_, 6) on BOTH sides so the hash
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

  /** The canonical kairos-style fixture over the events table:
    * name=event_type, ts, value, seq=event_id (arrival order). */
  def eventLog(spark: SparkSession, dir: String, seriesType: SeriesType,
      intervals: Map[String, IntervalSpec]): Timeseries = {
    val t = new Timeseries(spark, seriesType, intervals)
    val ev = events(spark, dir)
    t.attach(t.bucketize(ev, col("event_type"), col("ts"), col("value"), col("event_id")))
    t
  }

  val minuteHour: Map[String, IntervalSpec] = Map(
    "minute" -> IntervalSpec(TimeStep(60L)),
    "hour"   -> IntervalSpec(TimeStep(3600L), None, Some(TimeStep(60L))))

  val gregorian: Map[String, IntervalSpec] = Map(
    "daily"   -> IntervalSpec(TimeStep("daily")),
    "weekly"  -> IntervalSpec(TimeStep("weekly")),
    "monthly" -> IntervalSpec(TimeStep("monthly")),
    "yearly"  -> IntervalSpec(TimeStep("yearly")))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ts_count_minute")(spark, "/root/testdata/sf0.001")

  /** Aggregate the bucket log at (name, i_bucket) — the engine core the
    * per-name kairos API fixes `name` on; inventory queries keep it as
    * a grouping column. `ord` = (r_time, seq): resolution-bucket order
    * then arrival order, the reference's condense/last-write order.
    * Output i_time is the bucket id (convert with fromBucket as
    * needed). */
  private def grouped(t: Timeseries, interval: String): DataFrame = {
    val prepared = t.log
      .filter(col("interval") === interval)
      .select(col("name"), col("i_time"),
        // numeric composite (r_time, seq) — r_time < 10^10, seq < 10^8
        (col("r_time") * lit(100000000L) + col("seq")).as("ord"),
        col("value"))
    t.seriesType.aggregate(prepared, Seq("name", "i_time"))
  }

  private def bucketStart(c: Column, step: TimeStep): Column =
    TimeColumns.fromBucket(c, step)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A3/G2: count-type fold at minute buckets per stat name
    "ts_count_minute" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, minuteHour)
      grouped(t, "minute")
        .select(col("name"),
          bucketStart(col("i_time"), minuteHour("minute").step).as("i_time"),
          round(col("value"), 6).as("value"))
        .orderBy("name", "i_time")
    }),

    // A4/G1+G4: gauge, hour interval condensed from minute resolution —
    // last write of the latest resolution bucket wins
    "ts_gauge_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, GaugeT, minuteHour)
      grouped(t, "hour")
        .select(col("name"),
          bucketStart(col("i_time"), minuteHour("hour").step).as("i_time"),
          col("value"))
        .orderBy("name", "i_time")
    }),

    // A5: set cardinality (distinct count) at hour buckets
    "ts_set_card_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, SetT, minuteHour)
      grouped(t, "hour")
        .select(col("name"),
          bucketStart(col("i_time"), minuteHour("hour").step).as("i_time"),
          size(col("value")).cast(LongType).as("value"))
        .orderBy("name", "i_time")
    }),

    // A2: histogram fold, exploded to (name, i_time, v, cnt) rows so
    // the oracle is plain SQL
    "ts_histogram_daily" -> ((s, dir) => {
      val t = eventLog(s, dir, HistogramT, gregorian)
      grouped(t, "daily")
        .select(col("name"),
          bucketStart(col("i_time"), gregorian("daily").step).as("i_time"),
          explode(col("value")).as(Seq("v", "cnt")))
        .orderBy("name", "i_time", "v")
    }),

    // A1 + T1-T5: series fold with the whole transform matrix at hour
    // buckets
    "ts_series_transforms_hour" -> ((s, dir) => {
      val t = eventLog(s, dir, SeriesT, minuteHour)
      val step = minuteHour("hour").step
      val stepCol = TimeColumns.stepSize(col("i_time"), step)
      grouped(t, "hour").select(
        col("name"),
        bucketStart(col("i_time"), step).as("i_time"),
        round(SeriesT.transformExpr("mean", col("value"), stepCol).get, 6).as("t_mean"),
        SeriesT.transformExpr("count", col("value"), stepCol).get.as("t_count"),
        SeriesT.transformExpr("min", col("value"), stepCol).get.as("t_min"),
        SeriesT.transformExpr("max", col("value"), stepCol).get.as("t_max"),
        round(SeriesT.transformExpr("sum", col("value"), stepCol).get, 6).as("t_sum"),
        round(SeriesT.transformExpr("rate", col("value"), stepCol).get, 6).as("t_rate"))
        .orderBy("name", "i_time")
    }),

    // §1.2: Gregorian weekly %Y%U bucket (custom expression)
    "ts_gregorian_weekly" -> ((s, dir) => {
      val t = eventLog(s, dir, CountT, gregorian)
      val prepared = t.log.filter(col("interval") === "weekly")
        .select(col("name"), col("i_time"), col("value"))
      CountT.aggregate(prepared, Seq("name", "i_time"))
        .select(col("name"), col("i_time").as("bucket"), round(col("value"), 6).as("value"))
        .orderBy("name", "bucket")
    }),
  )

  // NOTE: the driver sorts columns by name before hashing, so Spark
  // and SQL column names/types must line up exactly.
  def oracleSql: Map[String, String] = Map(

    "ts_count_minute" ->
      """SELECT event_type AS name,
         CAST(floor(epoch(ts)/60) AS BIGINT)*60 AS i_time,
         round(sum(value), 6) AS value
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

    "ts_gregorian_weekly" ->
      """SELECT event_type AS name,
         CAST(strftime(ts, '%Y%U') AS BIGINT) AS bucket,
         round(sum(value), 6) AS value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
  )
}
