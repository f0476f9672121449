package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Timeseries
import graft.model._
import graft.time._

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference is a live-ingest store queried at now(): an
  * incrementally-maintained bucket aggregate. Two streaming shapes map
  * that exactly:
  *
  *  1. **Log append** (`appendToStore`): bucketize each micro-batch with
  *     the SAME projection as batch ingest and append to the bucket
  *     store; reads stay lazy-aggregation (the engine's batch path).
  *     This is the durable shape — state never lives in the stream.
  *  2. **Live aggregate** (`aggregateStream`): watermarked streaming
  *     groupBy over bucket ids, maintaining the per-type fold in stream
  *     state. Watermark = steps×step, the exact equivalent of the
  *     reference's write-time TTL guard (timeseries.py:121-133,
  *     redis_backend.py:146-148): data older than the retention horizon
  *     is dropped at ingest.
  *
  * State note: count/gauge state is O(1) per bucket; series/set state
  * grows with bucket contents and is bounded only by the watermark TTL —
  * same caveat the reference carries implicitly.
  */
object StreamingIngest {

  /** Bucketize a (possibly streaming) events frame — identical
    * projection to Timeseries.bucketize, reused verbatim. */
  def bucketize(t: Timeseries, events: DataFrame, name: Column, ts: Column,
      value: Column, seq: Column): DataFrame =
    t.bucketize(events, name, ts, value, seq)

  /** Append each micro-batch to a parquet bucket store partitioned by
    * interval (idempotent-enough for at-least-once; exactly-once needs a
    * transactional table format underneath, same as any Spark sink). */
  def appendToStore(t: Timeseries, events: DataFrame, name: Column, ts: Column,
      value: Column, seq: Column, path: String, checkpoint: String) =
    bucketize(t, events, name, ts, value, seq)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .partitionBy("interval")
      .format("parquet")
      .outputMode("append")
      .start(path)

  /** Watermarked live bucket aggregate for one interval. Late data
    * beyond steps×step (the TTL horizon) is dropped — if the interval
    * has no TTL, a generous default horizon is used (state must be
    * bounded in a stream even though the reference keeps data forever).
    */
  def aggregateStream(t: Timeseries, events: DataFrame, interval: String,
      name: Column, ts: Column, value: Column,
      defaultHorizonSec: Long = 7L * 86400): DataFrame = {
    val sp = t.intervals(interval)
    val step = sp.step match {
      case RelativeStep(s)  => s
      case _: GregorianStep => 86400L // calendar buckets: day-granular horizon
    }
    val horizon = sp.steps.map(_ * step).getOrElse(defaultHorizonSec)
    val withWm = events
      .select(name.cast(StringType).as("name"), ts.as("ts"),
        value.cast(t.valueType).as("value"))
      .withWatermark("ts", s"$horizon seconds")
      .select(col("name"),
        TimeColumns.bucket(col("ts"), sp.step).as("i_time"),
        (if (sp.coarse) lit(-1L) else TimeColumns.bucket(col("ts"), sp.resolution.get)).as("r_time"),
        // arrival order inside a micro-batch engine: event time is the
        // only stable order available to a stream; kairos' seq becomes
        // the event timestamp in micros
        unix_micros(col("ts")).as("ord"),
        col("value"))
    t.seriesType.aggregate(withWm, Seq("name", "i_time", "r_time"))
  }
}
