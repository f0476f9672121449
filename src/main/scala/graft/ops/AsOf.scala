package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed AS-OF join — the classic timeseries operator Spark has
  * no built-in for: every left row is decorated with columns from the
  * LATEST right row at-or-before its timestamp with equal keys
  * (attribution, mark-to-market, sensor alignment).
  *
  * Shape: union-tag-window. Both sides are tagged and unioned, one
  * window per key partition sorts by (time, side) and carries a
  * running `last(_, ignoreNulls)` of the right columns; left rows then
  * read the carried values. Cost = ONE shuffle on the join keys + one
  * per-partition sort — the canonical scale form: no per-row range
  * probe, no time-index broadcast, no equality-join explosion on
  * (key, bucket) pairs. A hot key concentrates its rows in one
  * partition (window semantics require it); as-of state is one carried
  * row, so memory stays O(1) per partition regardless of skew.
  */
object AsOf {

  /** Left-outer as-of join.
    *
    *  - `keys`: equality join columns (present on both sides).
    *  - `time`: ordering column name (both sides, mutually comparable).
    *  - `carry`: right columns attached to each left row (null when no
    *    right row precedes it — left-outer semantics, like DuckDB/kdb
    *    asof). A null value INSIDE a carried column is treated as
    *    absent (the carry keeps the previous non-null).
    *  - Ties: a right row at exactly the left row's time IS matched
    *    (at-or-before contract). Among equal-time right rows the last
    *    by `tieBreak` order wins — pass one (e.g. a sequence id) for
    *    engine-independent determinism, or pre-aggregate the right
    *    side to unique (keys, time).
    *
    * Right rows with a null time are dropped (a null would otherwise
    * sort as "earliest" and leak into every carry). */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      time: String, carry: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    val lrowType = StructType(left.schema.fields)
    val carryTyped = carry.map(c => c -> right.schema(c).dataType)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(time).as("__t"), lit(1).as("__side"),
        lit(null).cast(LongType).as("__tie"),
        struct(left.columns.map(col): _*).as("__lrow")) ++
        carryTyped.map { case (c, t) => lit(null).cast(t).as(c) }: _*)
    val r = right.filter(col(time).isNotNull).select(
      keys.map(col) ++ Seq(
        col(time).as("__t"), lit(0).as("__side"),
        tieBreak.map(col(_).cast(LongType)).getOrElse(lit(0L)).as("__tie"),
        lit(null).cast(lrowType).as("__lrow")) ++
        carry.map(col): _*)
    // right (side 0) sorts before left (side 1) at equal time, so an
    // equal-time right row is visible to the left row's carry
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col("__side") +: col("__lrow") +:
        carry.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +: carry.map(col): _*)
  }
}
