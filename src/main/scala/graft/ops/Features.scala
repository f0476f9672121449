package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity rolling feature extraction over event logs — the
  * lag/delta/rolling-aggregate family every ML feature pipeline
  * derives from behavioral data.
  *
  * Same execution posture as [[Sessions]]: all features are windows
  * over ONE (keys, time-order) partitioning, so Catalyst stacks them
  * over a single Exchange+Sort (asserted in FeaturesSpec); per-row
  * state is O(nRows) for the frame-bounded aggregates and O(1) for
  * lag — a hot entity costs sort time, not memory. `tieBreak` makes
  * equal-timestamp ordering engine-independent.
  */
object Features {

  /** Appends to each event: `prev_value` (lag 1), `delta` (value −
    * prev, null for the first event), `roll_mean`/`roll_min`/
    * `roll_max` over the trailing `nRows` rows INCLUDING the current,
    * and `seq` (1-based per-key event index). */
  def rolling(events: DataFrame, keys: Seq[String], time: String,
      value: Column, nRows: Int, tieBreak: Option[String] = None): DataFrame = {
    val order = col(time).asc +: tieBreak.map(col(_).asc).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val frame = w.rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    val prev = lag(value, 1).over(w)
    events
      .withColumn("prev_value", prev)
      .withColumn("delta", value - prev)
      .withColumn("roll_mean", avg(value).over(frame))
      .withColumn("roll_min", min(value).over(frame))
      .withColumn("roll_max", max(value).over(frame))
      .withColumn("seq", row_number().over(w).cast("long"))
  }

  /** Rolling z-score anomaly detection: each point scored against the
    * trailing `nRows` points EXCLUDING itself (so a spike can't mask
    * itself by inflating its own baseline). `z` is null until the
    * trailing frame is full and has positive spread — a warm-up point
    * or a constant baseline yields no verdict rather than a fake one.
    * `is_anomaly` is never null (false where z is null).
    *
    * Same one-Exchange+Sort posture as [[rolling]]: both frame
    * aggregates and the verdict stack over a single (keys, time)
    * window. stddev is the sample estimator (n−1), matching standard
    * SQL `stddev_samp` everywhere. */
  def zscoreAnomaly(series: DataFrame, keys: Seq[String], time: String,
      value: Column, nRows: Int, threshold: Double = 3.0,
      tieBreak: Option[String] = None): DataFrame = {
    require(nRows >= 2, "zscoreAnomaly needs a trailing frame of >= 2 rows")
    val order = col(time).asc +: tieBreak.map(col(_).asc).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val frame = w.rowsBetween(-nRows.toLong, -1)
    val m = avg(value).over(frame)
    val s = stddev_samp(value).over(frame)
    val c = count(value).over(frame)
    val z = when(c === nRows && s > 0, (value - m) / s)
    series
      .withColumn("base_mean", m)
      .withColumn("base_std", s)
      .withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(z) >= threshold, lit(false)))
  }

  /** Seasonal-baseline anomaly detection: each point z-scores against
    * the trailing window of points at the SAME PHASE of a fixed cycle
    * (`time mod period` — e.g. period = 86400 on epoch seconds means
    * "compare 3 am with the last `nRows` 3 ams", period = 7·86400 on
    * day-starts means same-weekday) instead of its immediate
    * neighbors. The monitoring read [[zscoreAnomaly]] cannot express:
    * a daily traffic peak is NORMAL at peak hour and anomalous at
    * 3 am, and a plain trailing window flags every peak.
    *
    * Same null discipline as [[zscoreAnomaly]] (full frame + positive
    * spread or no verdict), and the same single-window posture — the
    * phase joins the PARTITION key, so the whole analysis is still
    * one Exchange+Sort over (keys, phase, time). Output adds `phase`,
    * `base_mean`, `base_std`, `z`, `is_anomaly`. */
  def seasonalAnomaly(series: DataFrame, keys: Seq[String], time: String,
      value: Column, period: Long, nRows: Int, threshold: Double = 3.0,
      tieBreak: Option[String] = None): DataFrame = {
    require(period > 0, "seasonalAnomaly needs a positive period")
    require(nRows >= 2, "seasonalAnomaly needs a trailing frame of >= 2 rows")
    val withPhase = series.withColumn("phase", pmod(col(time), lit(period)))
    val order = col(time).asc +: tieBreak.map(col(_).asc).toSeq
    val w = Window.partitionBy((keys.map(col) :+ col("phase")): _*)
      .orderBy(order: _*)
    val frame = w.rowsBetween(-nRows.toLong, -1)
    val m = avg(value).over(frame)
    val s = stddev_samp(value).over(frame)
    val c = count(value).over(frame)
    val z = when(c === nRows && s > 0, (value - m) / s)
    withPhase
      .withColumn("base_mean", m)
      .withColumn("base_std", s)
      .withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(z) >= threshold, lit(false)))
  }

  /** Linear interpolation of null gaps in a keyed series: a null value
    * between two non-null neighbors becomes the line through them,
    * weighted by the NUMERIC `time` column (so irregular spacing
    * interpolates correctly, not by row position). Leading/trailing
    * gaps — no neighbor on one side — stay null (`filled` mirrors the
    * input there, `interpolated` = false): extrapolation is a modeling
    * decision this operator refuses to make silently.
    *
    * Execution: four frame aggregates (last/first non-null value and
    * time, backward and forward) over ONE (keys, time) partitioning —
    * Catalyst plans a single Exchange+Sort with both frame directions
    * in one WindowExec. Per-row state is O(1); a 100 TB series log
    * costs one shuffle on the key. */
  def interpolateLinear(series: DataFrame, keys: Seq[String], time: String,
      value: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(time).asc)
    val back = w.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = w.rowsBetween(1, Window.unboundedFollowing)
    val pv = last(value, ignoreNulls = true).over(back)
    val pt = last(when(value.isNotNull, col(time)), ignoreNulls = true).over(back)
    val nv = first(value, ignoreNulls = true).over(fwd)
    val nt = first(when(value.isNotNull, col(time)), ignoreNulls = true).over(fwd)
    val interp = pv + (nv - pv) * (col(time) - pt) / (nt - pt)
    val gap = value.isNull && pv.isNotNull && nv.isNotNull
    series
      .withColumn("filled", when(value.isNotNull, value).when(gap, interp))
      .withColumn("interpolated", gap)
  }
}
