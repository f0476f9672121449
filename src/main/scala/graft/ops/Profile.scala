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
  private def exactDistincts(df: DataFrame): DataFrame =
    unpivotPairs(df, df.schema.fields
      .filterNot(_.dataType.isInstanceOf[MapType]).map(_.name))
      .distinct()
      .groupBy("col_name").agg(count(lit(1)).as("nd_exact"))

  /** The table as `(col_name, value-as-string)` rows, nulls dropped.
    * String casts are distinct-preserving per type: binary goes
    * through base64, and −0.0 is normalized to 0.0 first (native
    * `count_distinct` merges them; their strings don't). */
  private def unpivotPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(explode(array(cols.map { name =>
      val c = col(name)
      val s = byName(name) match {
        case BinaryType => base64(c)
        case FloatType | DoubleType =>
          when(c === lit(0.0), lit(0.0).cast(byName(name))).otherwise(c)
            .cast(StringType)
        case _ => c.cast(StringType)
      }
      struct(lit(name).as("col_name"), s.as("v"))
    }: _*)).as("p"))
      .select("p.*")
      .filter(col("v").isNotNull)
  }

  /** Equi-depth histogram of one numeric column: rows ranked by
    * `(value, tiebreak)` and cut into `buckets` equal-count bins, one
    * output row per bin with its count, exact value cardinality, and
    * lo/hi edges (rounded to 6 dp — bin populations are
    * order-insensitive but edge doubles travel through an oracle
    * hash). The tiebreak must be unique per row so the cut is a total
    * order — bin-for-bin reproducible in any engine with SQL `ntile`.
    *
    * `exact = true` is the audit/oracle path: one global `ntile`
    * window — a single-reducer sort, the right trade only at
    * verification scale. `exact = false` is the 100 TB path: bin
    * edges from `approx_percentile` (one mergeable-sketch pass), then
    * a codegen'd edge-comparison bin assignment — no global sort, two
    * scans, and bins are approximately (sketch-accuracy) equal-depth.
    * Both paths emit the same schema. */
  def histogram(df: DataFrame, value: Column, tiebreak: Column,
      buckets: Int, exact: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = value.cast(DoubleType)
    val src = df.filter(v.isNotNull)
    val binned =
      if (exact)
        src.select(v.as("v"),
          ntile(buckets).over(Window.orderBy(v, tiebreak))
            .cast(LongType).as("bucket"))
      else {
        // sketch pass: interior edges at i/B quantiles; values bin by
        // first edge >= v (ties -> the lower bin, matching ntile's
        // placement of a run of equal values around a cut)
        val qs = (1 until buckets).map(_.toDouble / buckets)
        val edges = src.agg(
          percentile_approx(v, lit(qs.toArray), lit(100000)).as("e"))
          .head().getSeq[Double](0)
        val bin = edges.zipWithIndex.foldRight(lit(buckets.toLong)) {
          case ((e, i), rest) => when(v <= e, lit(i + 1L)).otherwise(rest)
        }
        src.select(v.as("v"), bin.as("bucket"))
      }
    binned.groupBy("bucket")
      .agg(count(lit(1)).as("n"), count_distinct(col("v")).as("nd"),
        round(min(col("v")), 6).as("lo"), round(max(col("v")), 6).as("hi"))
      .orderBy("bucket")
  }

  /** Exact per-column top-`k` most frequent values, with the total
    * order `(count desc, value asc)` making the cut engine-portable.
    * Output `(col_name, v, n, rank)`, values stringified as in the
    * cardinality unpivot.
    *
    * The 100 TB shape: counts come from one hash aggregation on
    * `(col_name, v)`; the global per-column top-k then runs as a
    * salted two-stage funnel — top-k within `(col_name, salt)` in
    * parallel (any global top-k value is a fortiori top-k in its salt
    * group, so this prunes EXACTLY), then top-k over the surviving
    * `salts × k` candidates per column. No column's full distinct set
    * ever sorts in one task, which is what a bare
    * `row_number() over (partition by col_name)` would do. */
  def heavyHitters(df: DataFrame, cols: Seq[String], k: Int,
      salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = unpivotPairs(df, cols)
      .groupBy("col_name", "v").agg(count(lit(1)).as("n"))
    val bySalt = Window
      .partitionBy(col("col_name"), pmod(xxhash64(col("v")), lit(salts)))
      .orderBy(col("n").desc, col("v"))
    val byCol = Window.partitionBy(col("col_name"))
      .orderBy(col("n").desc, col("v"))
    counts
      .withColumn("sr", row_number().over(bySalt)).filter(col("sr") <= k)
      .withColumn("rank", row_number().over(byCol).cast(LongType))
      .filter(col("rank") <= k)
      .select("col_name", "v", "n", "rank")
      .orderBy("col_name", "rank")
  }
  /** Engine-portable key-skew profile: row counts per md5 bucket of a
    * prospective join/aggregation key — the pre-flight diagnostic
    * read before choosing shuffle partitioning, AQE skew thresholds,
    * or salting for a 100 TB stage. md5-bucketing (the Mix.portableKey
    * idiom, seedless) rather than the engine's own hash partitioner
    * keeps the profile reproducible across engines and versions; a
    * hot key dominates SOME bucket under any uniform hash, so the
    * max/mean bucket ratio reads the same skew either way. */
  def keySkew(df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column, buckets: Int = 32)
      : org.apache.spark.sql.DataFrame =
    df.select((conv(substring(md5(key.cast("string").cast("binary")), 1, 4),
        16, 10).cast("long") % buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
}
