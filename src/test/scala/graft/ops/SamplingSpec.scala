package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Determinism, rate, nesting, and weighting properties of the
  * hash-derived samplers — the contracts an incremental data-mix
  * pipeline relies on (re-runs must not churn sampled rows). */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ids = spark.range(0, 20000).toDF("id")

  test("bernoulli: deterministic, rate-accurate, nested, order-independent") {
    def take(frac: Double) =
      Sampling.bernoulli(ids, col("id"), frac).collect().map(_.getLong(0)).toSet
    val s10 = take(0.1)
    // deterministic: same rows on a second evaluation
    assert(take(0.1) === s10)
    // rate within 3 sigma of binomial(20000, 0.1)
    assert(math.abs(s10.size - 2000.0) < 3 * math.sqrt(20000 * 0.1 * 0.9), s10.size)
    // nested: the 10% sample is a subset of the 20% sample
    assert(s10.subsetOf(take(0.2)))
    // stable under physical reordering
    val shuffled = Sampling.bernoulli(ids.repartition(13, col("id") % 7), col("id"), 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(shuffled === s10)
  }

  test("bernoulliPortable: bit-parity with reference md5, nested, rate-accurate") {
    def take(frac: Double) =
      Sampling.bernoulliPortable(ids, col("id"), frac)
        .collect().map(_.getLong(0)).toSet
    val s25 = take(0.25)
    // bit-parity: an independent JVM md5 over the same key·seed string
    // reproduces the kept set EXACTLY (this is the portability claim —
    // any engine's md5 yields these bytes)
    val thr = Mix.hexThreshold(0.25)
    val expected = (0L until 20000L).filter { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i#42".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString < thr
    }.toSet
    assert(s25 === expected)
    // nested + rate, same contracts as the xxhash64 sampler
    assert(take(0.1).subsetOf(s25))
    assert(math.abs(s25.size - 5000.0) < 3 * math.sqrt(20000 * 0.25 * 0.75), s25.size)
  }

  test("stratifiedPortable: per-stratum md5 selection, consistent with bernoulliPortable") {
    val df = ids.withColumn("lang", when(col("id") % 2 === 0, "en").otherwise("de"))
    val got = Sampling.stratifiedPortable(df, col("id"), col("lang"),
      Map("en" -> 0.05), default = 0.5)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(math.abs(byLang("en") - 500.0) < 3 * math.sqrt(10000 * 0.05 * 0.95), byLang)
    assert(math.abs(byLang("de") - 5000.0) < 3 * math.sqrt(10000 * 0.5 * 0.5), byLang)
    // an empty frac map degenerates to the portable Bernoulli sampler
    val uniform = Sampling.stratifiedPortable(df, col("id"), col("lang"),
      Map.empty, default = 0.25).select("id").collect().map(_.getLong(0)).toSet
    val bern = Sampling.bernoulliPortable(ids, col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(uniform === bern)
  }

  test("stratified: per-stratum fractions with a default") {
    val df = ids.withColumn("lang", when(col("id") % 2 === 0, "en").otherwise("de"))
    val got = Sampling.stratified(df, col("id"), col("lang"),
      Map("en" -> 0.05), default = 0.5)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // 10000 en at 5% ≈ 500; 10000 de at 50% ≈ 5000 (3-sigma bounds)
    assert(math.abs(byLang("en") - 500.0) < 3 * math.sqrt(10000 * 0.05 * 0.95), byLang)
    assert(math.abs(byLang("de") - 5000.0) < 3 * math.sqrt(10000 * 0.5 * 0.5), byLang)
  }

  test("weightedTakeK: exact k, weight-proportional, deterministic, bounded plan") {
    // 2000 unit-weight rows + 20 rows at weight 500: the heavy rows'
    // total weight is ~83% of the mass, so a k=100 draw takes nearly
    // all of them (each heavy row's exclusion odds are negligible)
    val df = spark.range(0, 2020).toDF("id")
      .withColumn("w", when(col("id") < 20, 500.0).otherwise(1.0))
    val got = Sampling.weightedTakeK(df, col("id"), col("w"), k = 100)
    val rows = got.collect().map(_.getLong(0)).toSet
    assert(rows.size === 100)
    assert((0L until 20L).count(rows.contains) >= 18,
      s"heavy rows sampled: ${(0L until 20L).count(rows.contains)}/20")
    // deterministic
    val again = Sampling.weightedTakeK(df, col("id"), col("w"), k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(again === rows)
    // zero/negative weights never sample
    val z = Sampling.weightedTakeK(
      df.withColumn("w", when(col("id") < 1000, -1.0).otherwise(0.0)),
      col("id"), col("w"), k = 10)
    assert(z.count() === 0L)
    // O(k)-per-partition plan, not a global sort
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), plan.take(500))
  }
}
