package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-min sketch: fixed-size frequency estimation over unbounded
  * key streams — the counting member of the engine's mergeable-sketch
  * family (HLL cardinality via `approx_count_distinct`, GK quantiles
  * via `approx_percentile`, membership via [[Bloom]]). The classic
  * use at 100 TB: per-token/per-URL/per-user frequencies where the
  * exact count table itself would be a shuffle too big to sit
  * anywhere, but a depth×width counter grid of a few MB answers
  * every point query with a one-sided error bound.
  *
  * Guarantees: estimates NEVER undercount; overcount is ≤ εN with
  * probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉ (N = total
  * stream weight). Counters are additive, so sketches of shards
  * union-merge by summing cells — the same property that lets [[fit]]
  * build the grid with ONE partial-combined aggregation and no
  * key-space shuffle.
  *
  * Probe positions reuse the repo's portable md5 primitive
  * ([[Bloom.position]]), so the counter grid is cell-for-cell
  * reproducible by the DuckDB oracle; swap for `xxhash64` where
  * cross-engine reproducibility doesn't matter. */
object Sketch {

  /** Build the sparse counter grid `(r, c, n)` over `keys`, each
    * occurrence adding `weight` (default 1) to one cell per row:
    * `c = md5-position(key, r) mod width`. Cells never touched are
    * absent (= 0). One explode + one hash aggregation; partial
    * aggregation collapses every map partition to ≤ depth·width rows
    * before the only shuffle. */
  def countMinFit(df: DataFrame, key: Column, depth: Int, width: Long,
      seed: Long = 0L, weight: Column = lit(1L)): DataFrame =
    df.filter(key.isNotNull)
      .select(weight.cast(LongType).as("__w"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"),
            Bloom.position(key, r, width, seed).as("c"))): _*)).as("p"))
      .select(col("p.r").as("r"), col("p.c").as("c"), col("__w"))
      .groupBy("r", "c").agg(sum("__w").as("n"))

  /** Point-estimate the frequency of each row's `key`: the minimum
    * over the grid's `depth` cells the key hashes to (absent cell →
    * 0). Planned like [[Bloom.mightContain]]: `depth` broadcast hash
    * joins, no shuffle — the estimate column streams alongside the
    * input. Output = the input plus `est: BIGINT`. */
  /** Sum a directory of per-batch grids (written by
    * [[graft.streaming.StreamingIngest.sketchStreamCountMin]]) into
    * the live counter grid. Additivity makes this exact regardless of
    * how many batch files exist; run [[compactCountMin]] when the
    * directory grows. */
  def countMinLoad(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path).groupBy("r", "c").agg(sum("n").as("n"))

  /** Collapse all per-batch grids into one `batch=-1` partition
    * (temp-dir + swap, same discipline as [[Layout.compactFiles]]) so
    * the store stays uniformly `batch=`-partitioned for both the
    * reader and future stream batches. */
  def compactCountMin(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    countMinLoad(spark, path)
      .write.mode("overwrite").parquet(s"$path.tmp/batch=-1")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path.tmp"),
      new org.apache.hadoop.fs.Path(path))
  }

  /** Streaming approximate top-k support: given the live counter grid
    * and a candidate key set (typically the keys seen in a batch plus
    * the previously stored candidates), return the `k` keys with the
    * highest CMS estimates, `(key, est, rank)` by `(est desc, key)`.
    * One-sided error makes this conservative in the right direction:
    * a truly frequent key's estimate only exceeds its true count, so
    * it cannot be pushed out by undercounting — only by another key's
    * overcount (bounded by εN). The candidate set keeps the state
    * O(k + batch keys): keys never seen in any batch's top set can't
    * re-enter, which is the SpaceSaving trade every streaming top-k
    * makes. */
  def countMinTopK(candidates: DataFrame, key: Column, sketch: DataFrame,
      depth: Int, width: Long, k: Int, seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    countMinEstimate(candidates.select(key.as("key")).distinct(),
      col("key"), sketch, depth, width, seed)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("est").desc, col("key"))).cast(LongType))
      .filter(col("rank") <= k)
  }

  // ---------------------------------------------------------------
  // Incremental cardinality: persisted HLL register stores
  // ---------------------------------------------------------------

  /** Per-group HLL sketches over `key` (Spark's native DataSketches
    * binary registers, `lgK` trading size for accuracy — rel. std.
    * error ≈ 1.04/√2^lgK). Unlike `approx_count_distinct`, the
    * registers themselves leave the query: they persist, union, and
    * keep absorbing new increments without ever rescanning old data —
    * per-source distinct-token/URL/user counts maintained forever at
    * a few KB per group. */
  def hllFit(df: DataFrame, key: Column, groups: Seq[String],
      lgK: Int = 12): DataFrame =
    df.filter(key.isNotNull)
      .groupBy(groups.map(col): _*)
      .agg(hll_sketch_agg(key, lit(lgK)).as("sketch"))

  /** Union sketch tables (any number of increments per group) down to
    * one register set per group. */
  def hllMerge(sketches: DataFrame, groups: Seq[String]): DataFrame =
    sketches.groupBy(groups.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))

  /** `(groups…, n_distinct)` estimates from a sketch table. */
  def hllEstimate(sketches: DataFrame, groups: Seq[String]): DataFrame =
    hllMerge(sketches, groups)
      .select(groups.map(col) :+
        hll_sketch_estimate(col("sketch")).cast(LongType)
          .as("n_distinct"): _*)

  /** Load the live per-group registers of a `batch=`-partitioned HLL
    * store (written by
    * [[graft.streaming.StreamingIngest.sketchStreamHll]], same
    * exactly-once overwrite-by-batch-id discipline as the count-min
    * store). */
  def hllLoad(spark: org.apache.spark.sql.SparkSession, path: String,
      groups: Seq[String]): DataFrame =
    hllMerge(spark.read.parquet(path).select(
      (groups.map(col) :+ col("sketch")): _*), groups)

  def countMinEstimate(df: DataFrame, key: Column, sketch: DataFrame,
      depth: Int, width: Long, seed: Long = 0L,
      broadcastSketch: Boolean = true): DataFrame = {
    val keep = df.columns
    val joined = (0 until depth).foldLeft(
      df.withColumn("__cm_key", key)) { (acc, r) =>
      val side = sketch.filter(col("r") === r)
        .select(col("c").as(s"__cm_c$r"), col("n").as(s"__cm_n$r"))
      acc.join(if (broadcastSketch) broadcast(side) else side,
        Bloom.position(col("__cm_key"), r, width, seed) === col(s"__cm_c$r"),
        "left")
    }
    val est = (0 until depth).map(r => coalesce(col(s"__cm_n$r"), lit(0L)))
      .reduce((a, b) => least(a, b))
    joined.select(keep.map(col) :+ est.as("est"): _*)
  }
}
