package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A Bloom filter as a sparse DataFrame bitmap — the broadcastable
  * membership gate that turns a full-set semi-join into a map-side
  * prefilter (Spark's own runtime bloom join, but explicit,
  * persistable, and engine-portable).
  *
  * Layout: `(word: BIGINT, bits: BIGINT)` with 32 payload bits per
  * word — bit 31 is the highest ever set, so `1 << (pos % 32)` never
  * touches the sign bit and the same arithmetic runs on any engine
  * with two's-complement BIGINT and no unsigned shifts (DuckDB's
  * `<<` overflow-checks; a 64-bit payload would trap there). Only
  * words with at least one set bit are materialized.
  *
  * Hashing: probe `i` of a key is the top-60-bit integer of
  * `md5("<key>#<seed>:<i>")` mod `mBits` — the repo's portable md5
  * primitive ([[Mix.ordHash]] family), so a filter built here is
  * bit-for-bit reproducible by the DuckDB oracle. The md5 cost is
  * per-key-per-probe; swap [[position]] for `xxhash64` where
  * cross-engine reproducibility doesn't matter — the layout and
  * algebra are hash-agnostic.
  *
  * At 100 TB: [[fit]] streams each key's k positions into one
  * partial-combined `bit_or` aggregation — the shuffle carries at
  * most (set-words × map partitions) rows no matter how many keys go
  * in. [[mightContain]] is k broadcast hash joins on the word column
  * and ZERO shuffles: the candidate stream never stops flowing, which
  * is exactly what gating a 10^12-gram corpus scan needs. Sizing: a
  * 10^8-key set at 16 bits/key is a 200 MB bitmap (k=11 → FPR
  * 4.6·10^-4) — comfortably broadcastable; past ~1 GB pass
  * `broadcastBitmap = false` to shuffle-join instead. */
object Bloom {

  /** Probe position `i` for `key`: `md5("<key>#<seed>:<i>")` top 15
    * hex digits as an integer, mod `mBits`. */
  def position(key: Column, i: Int, mBits: Long, seed: Long): Column =
    pmod(conv(substring(md5(
      concat(key.cast(StringType), lit(s"#$seed:$i")).cast(BinaryType)),
      1, 15), 16, 10).cast(LongType), lit(mBits))

  private def wordOf(pos: Column): Column = shiftright(pos, 5)
  private def maskOf(pos: Column): Column =
    expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__bf_pos, 32) AS INT))")

  /** Build the bitmap over `keys` (nulls skipped, duplicates
    * harmless — `bit_or` is idempotent, and partial aggregation
    * collapses each map partition to its set words before any
    * shuffle). `mBits` should be a multiple of 32. */
  def fit(keys: DataFrame, key: Column, mBits: Long, k: Int,
      seed: Long = 0L): DataFrame =
    keys.filter(key.isNotNull)
      .select(explode(array((0 until k).map(i =>
        position(key, i, mBits, seed)): _*)).as("__bf_pos"))
      .select(wordOf(col("__bf_pos")).as("word"),
        maskOf(col("__bf_pos")).as("__bf_mask"))
      .groupBy("word").agg(expr("bit_or(__bf_mask)").as("bits"))

  /** Rows of `df` whose `key` is POSSIBLY in the fitted set: no false
    * negatives ever; false positives at the [[fpRate]] rate. Planned
    * as k broadcast hash joins (one per probe) + a conjunction filter
    * — no shuffle, no aggregation, so it composes as a map-side gate
    * in front of any expensive join or distinct. */
  def mightContain(df: DataFrame, key: Column, bloom: DataFrame,
      mBits: Long, k: Int, seed: Long = 0L,
      broadcastBitmap: Boolean = true): DataFrame = {
    val keep = df.columns
    val withProbes = (0 until k).foldLeft(df) { (acc, i) =>
      acc.withColumn(s"__bf_p$i", position(key, i, mBits, seed))
    }
    val joined = (0 until k).foldLeft(withProbes) { (acc, i) =>
      val side = bloom.select(col("word").as(s"__bw$i"),
        col("bits").as(s"__bb$i"))
      acc.join(if (broadcastBitmap) broadcast(side) else side,
        wordOf(col(s"__bf_p$i")) === col(s"__bw$i"), "left")
    }
    val allHit = (0 until k).map { i =>
      val mask =
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(__bf_p$i, 32) AS INT))")
      coalesce(col(s"__bb$i"), lit(0L)).bitwiseAND(mask) === mask
    }.reduce(_ && _)
    joined.filter(allHit).select(keep.map(col): _*)
  }

  /** Expected false-positive rate of a filter with `nKeys` keys,
    * `mBits` bits, `k` probes: `(1 − e^{−k·n/m})^k`. */
  def fpRate(nKeys: Long, mBits: Long, k: Int): Double =
    math.pow(1.0 - math.exp(-k.toDouble * nKeys / mBits), k)
}
