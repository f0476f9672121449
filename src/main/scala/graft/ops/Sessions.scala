package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization and ordered-funnel analysis over event logs — the
  * two clickstream operators every behavioral pipeline needs and Spark
  * has no built-in for.
  *
  * Both are pure window constructions over ONE shuffle on the entity
  * key + one per-partition sort; the chained `withColumn` windows share
  * a single partitioning/ordering, so Catalyst plans them as stacked
  * Window operators over a single Exchange+Sort (asserted in
  * SessionsSpec). State per partition is O(1) per window (a running
  * min / lag / running sum), so a hot entity costs sort time, not
  * memory — the same skew posture as [[AsOf.joinAsOf]].
  *
  * Determinism: pass `tieBreak` (an arrival id) so equal-timestamp
  * events order identically on any engine — both operators' contracts
  * are defined over the (time, tieBreak) total order.
  */
object Sessions {

  /** Gap-based sessionization: a new session starts at the first event
    * of a key and at every event whose gap from the previous event
    * exceeds `gapSec`. Appends `session_idx` (1-based, per key, in
    * (time, tieBreak) order) to the input rows.
    *
    * This is the standard web-analytics session definition (30-minute
    * inactivity timeout); the running-sum-of-boundaries construction is
    * the textbook window form of it.
    */
  def sessionize(events: DataFrame, keys: Seq[String], time: String,
      gapSec: Long, tieBreak: Option[String] = None): DataFrame = {
    val order = col(time).asc +: tieBreak.map(col(_).asc).toSeq
    val lagW = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val runW = lagW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(time), 1).over(lagW)
    val boundary = when(prev.isNull || col(time) - prev > gapSec, 1L).otherwise(0L)
    events.withColumn("session_idx", sum(boundary).over(runW))
  }

  /** Ordered funnel: for each key, the earliest time each step in
    * `steps` is reached, where step i+1 only counts at-or-after the
    * (running) earliest reach of step i — events must occur in funnel
    * order, the strict product-analytics contract (a purchase before
    * any view is NOT a step-3 reach).
    *
    * Returns one row per key: `keys…, t_<step>… (nullable), depth`
    * (number of consecutive steps reached). Equal-time step i and
    * step i+1 events count in time order with `tieBreak` deciding
    * equal-time order — "at-or-after" means at-or-after in the sort,
    * evaluated over the strictly-preceding-or-current prefix.
    *
    * Construction: step i's reach time is a running
    * `min(time WHERE step=steps(i) AND time >= running-t(i-1))` over
    * the per-key prefix frame; the chain references the previous
    * window column, so all `steps.size` windows share one sort. The
    * per-key final value of a running min is its minimum, so the
    * closing aggregation is `min(t_i)` — one partial-aggregated
    * shuffle already co-partitioned by the window exchange.
    */
  def funnel(events: DataFrame, keys: Seq[String], time: String,
      step: Column, steps: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val order = col(time).asc +: tieBreak.map(col(_).asc).toSeq
    val runW = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withReach = steps.zipWithIndex.foldLeft(events) { case (df, (s, i)) =>
      val qualified =
        if (i == 0) when(step === s, col(time))
        else when(step === s && col(s"__t${i - 1}").isNotNull &&
          col(time) >= col(s"__t${i - 1}"), col(time))
      df.withColumn(s"__t$i", min(qualified).over(runW))
    }
    val reachCols = steps.indices.map(i => min(col(s"__t$i")).as(s"t_${steps(i)}"))
    // depth = longest prefix of non-null reach times; inner nulls are
    // impossible by construction (step i+1 qualifies only under a
    // non-null running t_i) but the sum-of-prefix form documents it
    val depth = steps.indices.map { i =>
      steps.indices.take(i + 1)
        .map(j => col(s"t_${steps(j)}").isNotNull)
        .reduce(_ && _).cast("int")
    }.reduce(_ + _)
    withReach.groupBy(keys.map(col): _*)
      .agg(reachCols.head, reachCols.tail: _*)
      .withColumn("depth", depth)
  }
}
