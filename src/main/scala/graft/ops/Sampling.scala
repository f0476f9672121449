package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling operators for training-data curation.
  *
  * Every sampler derives its randomness from xxhash64 over a caller
  * key — no RNG state, no seed-per-partition coupling, so a sample is
  * (a) reproducible bit-for-bit across runs, cluster sizes, and
  * retries (speculative tasks can't diverge), (b) stable under
  * repartition/reorder, and (c) a plain pushdown-able filter or
  * bounded top-k — never a shuffle of the full corpus. That's the
  * only sampling shape that works in an incremental 100 TB pipeline:
  * re-running the job on a grown corpus keeps every previously
  * sampled row's verdict unchanged.
  */
object Sampling {

  /** Uniform u ∈ [0, 1) derived from the key hash: the top 53 bits of
    * xxhash64 scaled by 2^-53 — exactly representable in double, the
    * standard 53-bit uniform construction. */
  def uniform(key: Column, seed: Long = 42L): Column =
    shiftrightunsigned(xxhash64(key, lit(seed)), 11).cast(DoubleType) *
      lit(1.0 / (1L << 53))

  /** Deterministic Bernoulli sample: keep rows with u(key) < frac.
    * Nested by construction — sample(0.1) ⊆ sample(0.2) at the same
    * seed — so growing a data mix never churns rows already taken. */
  def bernoulli(df: DataFrame, key: Column, frac: Double,
      seed: Long = 42L): DataFrame =
    df.filter(uniform(key, seed) < lit(frac))

  /** Portable deterministic Bernoulli: the same determinism/nesting
    * contract as [[bernoulli]], but selection is a lexicographic
    * compare of md5hex(key·seed) against an exact hex threshold
    * ([[Mix.hexThreshold]]) — byte-identical in ANY engine with md5
    * (the [[Mix]] selection primitive), at ~2× the per-row cost of
    * xxhash64. Use this when the kept set must reproduce outside
    * Spark (an audit replica, a DuckDB/Python twin of the pipeline);
    * use [[bernoulli]] when only Spark-side reproducibility matters.
    * Still a plain pushdown-able filter: no shuffle, no RNG state. */
  def bernoulliPortable(df: DataFrame, key: Column, frac: Double,
      seed: Long = 42L): DataFrame =
    df.filter(Mix.ordHash(key, seed) < lit(Mix.hexThreshold(frac)))

  /** Portable stratified sampling: per-stratum keep fractions under
    * the SAME md5 selection as [[bernoulliPortable]] (one
    * [[Mix.hexThreshold]] literal per stratum, resolved per row) —
    * the cross-engine twin of [[stratified]], and nested across
    * fraction maps the same way. Still a per-row pushdown filter. */
  def stratifiedPortable(df: DataFrame, key: Column, stratum: Column,
      fracs: Map[String, Double], default: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    val thr = fracs.foldLeft(lit(Mix.hexThreshold(default))) {
      case (acc, (s, f)) =>
        when(stratum.cast(StringType) === s, Mix.hexThreshold(f)).otherwise(acc)
    }
    df.filter(Mix.ordHash(key, seed) < thr)
  }

  /** Stratified deterministic sampling: a per-stratum keep fraction
    * (e.g. downsample dominant languages/domains in a data mix),
    * `default` for strata not in the map. The fraction table is a
    * literal map (broadcast-free, codegen'd); the filter stays a
    * per-row predicate — no shuffle, no per-stratum pass. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      fracs: Map[String, Double], default: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    val fracCol =
      if (fracs.isEmpty) lit(default)
      else coalesce(
        try_element_at(
          map(fracs.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
          stratum.cast(StringType)),
        lit(default))
    df.filter(uniform(key, seed) < fracCol)
  }

  /** Weighted sample WITHOUT replacement of exactly k rows
    * (Efraimidis–Spirakis A-Res, IPL 2006 — public): each row scores
    * log(u)/w (the log-domain form of u^(1/w), monotone-equivalent
    * and immune to double underflow at large weights) and the k
    * best scores win. Inclusion probability is proportional to
    * weight, the sample is deterministic at a fixed seed, and the
    * plan is TakeOrderedAndProject — O(k) per partition, one bounded
    * merge, never a global sort. Rows with weight ≤ 0 never sample. */
  def weightedTakeK(df: DataFrame, key: Column, weight: Column, k: Int,
      seed: Long = 42L): DataFrame = {
    // u ∈ (0,1]: flip the [0,1) uniform so log() never sees 0
    val u = lit(1.0) - uniform(key, seed)
    val score = log(u) / weight.cast(DoubleType)
    df.filter(weight.cast(DoubleType) > 0)
      .orderBy(score.desc)
      .limit(k)
  }

  /** Portable weighted take-k: [[weightedTakeK]]'s A-Res draw with
    * every ingredient reproducible in ANY md5-capable engine. The
    * uniform derives from the first 13 hex digits of md5(key·seed):
    * u = (h+1)·2⁻⁵² ∈ (0,1], integer-exact in double on both sides.
    * The log-domain score is rounded to 6 decimals with the key as
    * tiebreak — coarse enough that a ≤2-ulp cross-engine ln()
    * divergence cannot reorder the draw, fine enough (~1.8e8 score
    * cells over the score range) that inclusion odds stay
    * weight-proportional. Same O(k) TakeOrdered plan. Use
    * [[weightedTakeK]] when only Spark-side reproducibility matters
    * (xxhash64 is cheaper than md5). */
  def weightedTakeKPortable(df: DataFrame, key: Column, weight: Column,
      k: Int, seed: Long = 42L): DataFrame = {
    val h13 = conv(substring(Mix.ordHash(key, seed), 1, 13), 16, 10)
      .cast(DoubleType)
    val u = (h13 + lit(1.0)) / lit(4503599627370496.0) // 2^52: exact
    val score = round(log(u) / weight.cast(DoubleType), 6)
    df.filter(weight.cast(DoubleType) > 0)
      .orderBy(score.desc, key.asc)
      .limit(k)
  }
}
