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
}
