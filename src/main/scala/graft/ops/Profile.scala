package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven table profiling: one output row per column with null
  * counts, cardinality, and min/max — the first query anyone runs
  * against an unfamiliar 100 TB table, and the health check curation
  * jobs emit after every write.
  *
  * ONE pass over the data: every per-column statistic is an aggregate
  * in a single `agg`, and the wide 1-row result is exploded into rows
  * driver-free. Cardinality defaults to HLL (`approx_count_distinct`,
  * one pass, mergeable at any scale); `exactDistinct = true` switches
  * to exact distinct counts (Spark plans the multi-distinct via
  * Expand — the right trade only at oracle/test scale or on low-card
  * columns). Numeric and timestamp min/max land in `min_num`/
  * `max_num` (timestamps as epoch seconds), strings in `min_str`/
  * `max_str`. */
object Profile {

  def table(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    // maps are unhashable in Spark: count_distinct/approx on a MapType
    // fails analysis — profile such columns with null cardinality
    // instead of crashing the whole table's profile
    def nd(f: StructField): Column = f.dataType match {
      case _: MapType => lit(null).cast(LongType)
      case _ if exactDistinct => count_distinct(col(f.name))
      case _ => approx_count_distinct(col(f.name))
    }
    val nullNum = lit(null).cast(DoubleType)
    val nullStr = lit(null).cast(StringType)

    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val (mn, mx, ms, xs) = f.dataType match {
        case _: NumericType =>
          (round(min(c).cast(DoubleType), 6), round(max(c).cast(DoubleType), 6),
            nullStr, nullStr)
        case TimestampType | TimestampNTZType | DateType =>
          // NTZ casts through TimestampType in the session zone (UTC
          // in the driver contract), matching DuckDB's epoch() on
          // naive timestamps
          val ep = (x: Column) =>
            round(unix_timestamp(x.cast(TimestampType)).cast(DoubleType), 6)
          (ep(min(c)), ep(max(c)), nullStr, nullStr)
        case StringType =>
          (nullNum, nullNum, min(c), max(c))
        case _ =>
          (nullNum, nullNum, nullStr, nullStr)
      }
      Seq(count(c).as(s"${f.name}__nn"), nd(f).cast(LongType).as(s"${f.name}__nd"),
        mn.as(s"${f.name}__mn"), mx.as(s"${f.name}__mx"),
        ms.as(s"${f.name}__ms"), xs.as(s"${f.name}__xs"))
    } :+ count(lit(1)).as("__total")

    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(fields.map(f => struct(
        lit(f.name).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"${f.name}__nn")).as("n_null"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__mn").as("min_num"),
        col(s"${f.name}__mx").as("max_num"),
        col(s"${f.name}__ms").as("min_str"),
        col(s"${f.name}__xs").as("max_str"))): _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
