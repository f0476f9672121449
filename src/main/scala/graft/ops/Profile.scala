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
  * one pass, mergeable at any scale); `exactDistinct = true` adds a
  * second pass — the table unpivoted to `(col_name, value-as-string)`
  * pairs, then two stacked hash aggregations (partial-combined
  * `distinct` shuffle keyed on the pair, then a per-column count).
  * Putting N `count_distinct`s in ONE agg instead would plan an
  * Expand (×N row blowup) whose string min/max buffers force the
  * whole ×N stream through object/sort aggregation — measured 5.6 s
  * vs ~1 s on a 6-column 150 k-row table, and the gap widens with
  * both N and rows. Numeric and timestamp min/max land in `min_num`/
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
      case _ if exactDistinct => lit(null).cast(LongType) // joined below
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

    val base = df.agg(aggs.head, aggs.tail: _*)
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

    val out =
      if (!exactDistinct) base
      else {
        // an all-null column yields no pairs → 0 distinct, not null;
        // map columns (excluded from the unpivot) keep null cardinality
        val mapCols = fields.collect {
          case f if f.dataType.isInstanceOf[MapType] => f.name }
        val filled =
          if (mapCols.isEmpty) coalesce(col("nd_exact"), lit(0L))
          else when(col("col_name").isin(mapCols: _*), lit(null).cast(LongType))
            .otherwise(coalesce(col("nd_exact"), lit(0L)))
        base.drop("n_distinct")
          .join(broadcast(exactDistincts(df)), Seq("col_name"), "left")
          .withColumn("n_distinct", filled)
          .select("col_name", "n_rows", "n_null", "n_distinct",
            "min_num", "max_num", "min_str", "max_str")
      }
    out.orderBy("col_name")
  }

  /** Exact per-column cardinalities without the multi-distinct Expand:
    * unpivot every hashable column to `(col_name, value-as-string)`,
    * then `distinct` (one partial-combined shuffle on the pair — the
    * pair key spreads ALL columns' values over the cluster at once)
    * and a per-column count. String casts are distinct-preserving per
    * type: binary goes through base64, and −0.0 is normalized to 0.0
    * first (native `count_distinct` merges them; their strings don't). */
  private def exactDistincts(df: DataFrame): DataFrame = {
    val hashable = df.schema.fields.filterNot(_.dataType.isInstanceOf[MapType])
    val pairs = df.select(explode(array(hashable.map { f =>
      val c = col(f.name)
      val s = f.dataType match {
        case BinaryType => base64(c)
        case FloatType | DoubleType =>
          when(c === lit(0.0), lit(0.0).cast(f.dataType)).otherwise(c)
            .cast(StringType)
        case _ => c.cast(StringType)
      }
      struct(lit(f.name).as("col_name"), s.as("v"))
    }: _*)).as("p"))
      .select("p.*")
      .filter(col("v").isNotNull)
    pairs.distinct()
      .groupBy("col_name").agg(count(lit(1)).as("nd_exact"))
  }
}
