package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

import graft.model._
import graft.time._

/** Transform argument: built-in names and/or custom `(data, stepSize) =>
  * result` column functions (the reference's callable transforms,
  * timeseries.py:819-820, README.rst:740-749). */
final case class Transforms(
    names: Seq[String] = Nil,
    custom: Map[String, (Column, Column) => Column] = Map.empty) {
  def isEmpty: Boolean = names.isEmpty && custom.isEmpty
  def single: Boolean = names.size + custom.size == 1
  def all: Seq[(String, Option[(Column, Column) => Column])] =
    names.map(n => n -> Option.empty[(Column, Column) => Column]) ++
      custom.map { case (n, f) => n -> Some(f) }
}
object Transforms {
  val none: Transforms = Transforms()
  def apply(name: String): Transforms = Transforms(Seq(name))
}

/** The Spark-native timeseries engine with the query semantics of the
  * reference (kairos timeseries.py). Data model (SURVEY.md §1.4): a
  * canonical bucket log
  *
  *   name STRING, interval STRING, i_time LONG, r_time LONG (-1 when
  *   coarse), seq LONG (arrival order), value <V>
  *
  * maintained append-only; every read aggregates the log once at the
  * requested output granularity (see [[graft.model.SeriesType]] for why
  * that reproduces fold/condense/collapse/join exactly).
  *
  * At scale the log is parquet partitioned by `interval` — reads prune
  * to one partition and push name/i_time filters to the scan.
  */
class Timeseries(
    val spark: SparkSession,
    val seriesType: SeriesType,
    val intervals: Map[String, IntervalSpec],
    val valueType: DataType = DoubleType,
    val readFunc: Column => Column = identity,
    val writeFunc: Column => Column = identity) {

  import Timeseries._

  // ---- ingest -------------------------------------------------------

  /** In-memory insert buffer: (name, value, ts epoch-sec, fanout). API
    * parity with the reference's insert/bulk_insert; real pipelines use
    * bucketize() on a DataFrame instead. */
  private val buffer = ArrayBuffer[(String, Double, Double, Int)]()
  private var attached: Option[DataFrame] = None
  private var seqCounter: Long = 0L

  /** kairos insert(name, value, timestamp, intervals) — timeseries.py:
    * 439-472. Count-type default increment is 1 (:925-926). */
  def insert(name: String, value: Double = 1.0, timestamp: Double, intervalsFanout: Int = 0): Unit =
    buffer += ((name, value, timestamp, intervalsFanout))

  /** kairos bulk_insert (timeseries.py:413-437). */
  def bulkInsert(inserts: Map[Double, Map[String, Seq[Double]]], intervalsFanout: Int = 0): Unit =
    for ((ts, names) <- inserts.toSeq.sortBy(_._1); (n, vs) <- names; v <- vs)
      insert(n, v, ts, intervalsFanout)

  /** Attach an already-bucketized log (e.g. read back from parquet). */
  def attach(log: DataFrame): this.type = { attached = Some(log); this }

  /** Project an events-shaped DataFrame into the canonical bucket log:
    * one output row per (input row × configured interval × fan-out
    * offset). The fan-out (`intervals=±N`, timeseries.py:484-497) lands
    * offset≠0 copies at the interval start (normalize() semantics). */
  def bucketize(events: DataFrame, name: Column, ts: Column, value: Column,
      seq: Column, fanout: Column = lit(0)): DataFrame = {
    val perInterval = intervals.toSeq.map { case (iname, spec) =>
      val base = events.select(
        name.cast(StringType).as("name"),
        ts.as("ts"),
        writeFunc(value).cast(valueType).as("value"),
        seq.cast(LongType).as("seq"),
        fanout.cast(IntegerType).as("fanout"))
      // offsets: 0, plus 1..N (or -1..-N); offset≠0 uses the simulated
      // timestamp normalize(ts, offset)
      val exploded = base
        .withColumn("off", explode(sequence(least(col("fanout"), lit(0)), greatest(col("fanout"), lit(0)))))
        .withColumn("sim_ts", when(col("off") === 0, col("ts"))
          .otherwise(TimeColumns.shiftNormalize(col("ts"), spec.step, col("off"))))
      exploded.select(
        col("name"),
        lit(iname).as("interval"),
        TimeColumns.bucket(col("sim_ts"), spec.step).as("i_time"),
        (if (spec.coarse) lit(-1L)
         else TimeColumns.bucket(col("sim_ts"), spec.resolution.get)).as("r_time"),
        col("seq"),
        col("value"))
    }
    perInterval.reduce(_ unionAll _)
  }

  /** The full bucket log (in-memory buffer ∪ attached). */
  def log: DataFrame = {
    val fromBuffer = if (buffer.isEmpty) None else {
      import spark.implicits._
      val rows = buffer.toSeq.zipWithIndex.map { case ((n, v, t, f), i) => (n, v, t, i.toLong, f) }
      val ev = rows.toDF("name", "value", "ts_sec", "seq", "fanout")
        .withColumn("ts", timestamp_seconds(col("ts_sec")))
      Some(bucketize(ev, col("name"), col("ts"), col("value"), col("seq"), col("fanout")))
    }
    (fromBuffer, attached) match {
      case (Some(a), Some(b)) => a.unionAll(b)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logSchema(valueType))
    }
  }

  /** Persist the bucket log partitioned by interval — at scale each read
    * touches exactly one partition directory and parquet min/max prunes
    * i_time row groups. */
  def save(path: String): Unit =
    log.write.mode("overwrite").partitionBy("interval").parquet(path)

  def load(path: String): this.type = attach(spark.read.parquet(path))

  // ---- reads --------------------------------------------------------

  private def spec(interval: String): IntervalSpec =
    intervals.getOrElse(interval, throw new UnknownInterval(interval))

  /** kairos get() — one interval bucket (timeseries.py:547-611).
    * Output: (i_time[, r_time], value) with times as epoch seconds. */
  def get(names: Seq[String], interval: String, timestamp: Double,
      condense: Boolean = false, transform: Transforms = Transforms.none,
      fetch: DataFrame => DataFrame = identity): DataFrame = {
    val sp = spec(interval)
    val b = sp.iCalc.toBucket(timestamp)
    query(names, interval, sp, b, b, condense = condense, collapse = false,
      transform = transform, fetch = fetch)
  }

  /** kairos series() — range of buckets with the reference's anchoring
    * rules (timeseries.py:619-719): (start,end) / (start,steps) /
    * (end,steps) / default end=now. */
  def series(names: Seq[String], interval: String,
      start: Option[Double] = None, end: Option[Double] = None,
      steps: Option[Int] = None, condense: Boolean = false,
      collapse: Boolean = false, transform: Transforms = Transforms.none,
      now: () => Double = () => System.currentTimeMillis() / 1000.0,
      fetch: DataFrame => DataFrame = identity): DataFrame = {
    val sp = spec(interval)
    val nSteps = steps.orElse(sp.steps).getOrElse(1)
    val (b0, b1) = (start, end) match {
      case (Some(s), Some(e)) => (sp.iCalc.toBucket(s), sp.iCalc.toBucket(e))
      case (Some(s), None)    => (sp.iCalc.toBucket(s), sp.iCalc.toBucket(s, nSteps - 1))
      case (None, Some(e))    => (sp.iCalc.toBucket(e, -nSteps + 1), sp.iCalc.toBucket(e))
      case (None, None)       =>
        val e = now()
        (sp.iCalc.toBucket(e, -nSteps + 1), sp.iCalc.toBucket(e))
    }
    val b1c = math.max(b0, b1)
    query(names, interval, sp, b0, b1c, condense = condense || collapse,
      collapse = collapse, transform = transform, fetch = fetch)
  }

  /** kairos iterate() (timeseries.py:521-545): dense walk between the
    * first and last extant buckets. */
  def iterate(names: Seq[String], interval: String,
      condense: Boolean = false, transform: Transforms = Transforms.none): DataFrame = {
    val sp = spec(interval)
    val bounds = log
      .filter(col("interval") === interval && col("name").isin(names: _*))
      .agg(min("i_time").as("b0"), max("i_time").as("b1")).head()
    require(!bounds.isNullAt(0), s"no data for $names/$interval")
    query(names, interval, sp, bounds.getLong(0), bounds.getLong(1),
      condense = condense, collapse = false, transform = transform)
  }

  /** The single read pipeline behind get/series/iterate (SURVEY.md
    * §3.2-3.3): filter → [fetch hook] → cast → agg-at-output-granularity
    * → dense-axis fill → transforms → time keys.
    *
    * Plan shape at scale: one parquet scan with interval+name+i_time
    * pushed down, one shuffle for the agg, broadcast join against the
    * tiny bucket axis. */
  private def query(names: Seq[String], interval: String, sp: IntervalSpec,
      b0: Long, b1: Long, condense: Boolean, collapse: Boolean,
      transform: Transforms, fetch: DataFrame => DataFrame = identity): DataFrame = {

    val fine = !sp.coarse && !condense
    val filtered = fetch(
      log.filter(col("interval") === interval &&
        col("name").isin(names: _*) &&
        col("i_time").between(b0, b1)))

    // composite merge order: resolution bucket, series-list position,
    // arrival (timeseries.py:727-745 + sql_backend.py:312)
    val nameIdx =
      if (names.size <= 1) lit(0)
      else coalesce(array_position(lit(names.toArray), col("name")), lit(0L))
    val prepared = filtered.select(
      col("i_time"), col("r_time"),
      struct(col("i_time"), col("r_time"), nameIdx.as("name_idx"), col("seq")).as("ord"),
      readFunc(col("value")).as("value"))

    val groupCols =
      if (collapse) Nil
      else if (fine) Seq("i_time", "r_time")
      else Seq("i_time")
    val agged = seriesType.aggregate(prepared, groupCols)

    // dense fill: coarse/condensed outputs show every bucket in range
    // (G6); fine output keeps inner sparsity. collapse keys the single
    // row at the FIRST bucket of the range (timeseries.py:706-713).
    val filled =
      if (collapse) {
        agged.select(lit(b0).as("i_time"), col("value"))
      } else if (fine) {
        agged
      } else {
        val axis = TimeColumns.axis(spark, sp.iCalc, sp.iCalc.fromBucket(b0), sp.iCalc.fromBucket(b1))
          .filter(col("i_time").between(b0, b1))
        // axis is the preserved side, so the broadcast (build) side must
        // be the aggregated result — bounded by #buckets × #names, small
        // by construction for any per-stat read
        axis.join(broadcast(agged), Seq("i_time"), "left")
          .select(col("i_time"),
            coalesce(col("value"), seriesType.empty(agged.schema("value").dataType)).as("value"))
      }

    // step size for transforms (timeseries.py:599-610, 693-717)
    val stepCol: Column =
      if (collapse) {
        // span of first..last bucket: from_bucket(b1+1) - from_bucket(b0)
        lit(sp.iCalc.fromBucket(b1) + sp.iCalc.stepSize(Some(sp.iCalc.fromBucket(b1).toDouble)) -
          sp.iCalc.fromBucket(b0))
      } else if (fine) {
        TimeColumns.stepSize(col("r_time"), sp.resolution.getOrElse(sp.step))
      } else {
        TimeColumns.stepSize(col("i_time"), sp.step)
      }

    val transformed =
      if (transform.isEmpty) filled
      else {
        val outs = transform.all.map {
          case (tname, Some(f)) => f(col("value"), stepCol).as(tname)
          case (tname, None) =>
            seriesType.transformExpr(tname, col("value"), stepCol)
              .getOrElse(col("value")).as(tname)
        }
        if (transform.single) filled.select(
          (groupColsOut(fine, collapse).map(col) :+ outs.head.as("value")): _*)
        else filled.select((groupColsOut(fine, collapse).map(col) ++ outs): _*)
      }

    // bucket ids → epoch-second keys, time-ordered
    val withTimes =
      if (fine)
        transformed
          .withColumn("i_time", TimeColumns.fromBucket(col("i_time"), sp.step))
          .withColumn("r_time", TimeColumns.fromBucket(col("r_time"), sp.resolution.getOrElse(sp.step)))
          .orderBy("i_time", "r_time")
      else
        transformed
          .withColumn("i_time", TimeColumns.fromBucket(col("i_time"), sp.step))
          .orderBy("i_time")
    withTimes
  }

  private def groupColsOut(fine: Boolean, collapse: Boolean): Seq[String] =
    if (fine) Seq("i_time", "r_time") else Seq("i_time")

  // ---- metadata / retention ------------------------------------------

  /** kairos properties() (timeseries.py:401-405): first/last extant
    * bucket timestamps per interval for a stat. */
  def properties(name: String): Map[String, (Long, Long)] = {
    val rows = log.filter(col("name") === name)
      .groupBy("interval")
      .agg(min("i_time").as("first"), max("i_time").as("last"))
      .collect()
    rows.map { r =>
      val iname = r.getString(0)
      val sp = spec(iname)
      iname -> (sp.iCalc.fromBucket(r.getLong(1)), sp.iCalc.fromBucket(r.getLong(2)))
    }.toMap
  }

  /** kairos list() (timeseries.py:395-399). */
  def list(): DataFrame = log.select("name").distinct()

  /** kairos delete(name) — as a log rewrite (anti-filter). */
  def delete(name: String): Unit =
    attached = Some(log.filter(col("name") =!= name))

  /** kairos expire (sql_backend.py:161-178): drop buckets past the
    * retention horizon of every TTL'd interval. Equivalent read-side
    * view; at scale this is the compaction job's predicate. */
  def expired(now: Double): DataFrame = {
    val keep = intervals.toSeq.map { case (iname, sp) =>
      sp.steps match {
        case Some(s) =>
          col("interval") === iname && col("i_time") > (sp.iCalc.toBucket(now) - s)
        case None => col("interval") === iname
      }
    }.reduce(_ || _)
    log.filter(keep)
  }

  def expire(now: Double): Unit = attached = Some(expired(now))
}

class UnknownInterval(interval: String)
  extends IllegalArgumentException(s"unknown interval: $interval")

object Timeseries {
  def logSchema(vt: DataType): StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("interval", StringType),
    StructField("i_time", LongType),
    StructField("r_time", LongType),
    StructField("seq", LongType),
    StructField("value", vt)))
}
