package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup: planted semantic duplicates must collapse to one keeper
  * per group, the paper's low-centroid-similarity rule must pick the
  * outlier-most member, coverage must be total (every input row gets
  * a verdict), and the cluster cap must degrade to singletons instead
  * of dropping rows. */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = 16

  /** splitmix64 finalizer — linear or lattice fixtures alias across
    * ids (sin(131·i) repeats near 417·2π; a mod-linear hash is a
    * translation in i), minting accidental near-dups. */
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random vector for id i. */
  private def vec(i: Long, jitter: Double = 0.0, jseed: Long = 0L): Seq[Float] =
    (0 until dims).map { d =>
      val base = Math.floorMod(mix(i * 1000003L + d), 2000L) / 1000.0 - 1.0
      val j = if (jitter == 0.0) 0.0
        else jitter *
          (Math.floorMod(mix(jseed * 7919L + i * 31L + d), 200L) / 100.0 - 1.0)
      (base + j).toFloat
    }

  /** 30 base vectors; ids 100+i are near-copies of base i for
    * i ∈ {0,1,2} (three planted duplicate pairs), id 200 a second
    * near-copy of base 0 (a planted triple). */
  private def corpus: DataFrame = {
    import spark.implicits._
    val base = (0L until 30L).map(i => (i, vec(i)))
    val dups = Seq(0L, 1L, 2L).map(i => (100L + i, vec(i, 0.02, i + 1)))
    val extra = Seq((200L, vec(0L, 0.02, 9L)))
    (base ++ dups ++ extra).toDF("vec_id", "embedding")
  }

  test("planted duplicates collapse to one keeper per group; coverage total") {
    val out = Similarity.semanticDedup(corpus, col("vec_id"),
      col("embedding"), nClusters = 4, threshold = 0.98, seed = 11L)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(2), r.getLong(4))).toSeq
    assert(rows.length === 34) // every input row has a verdict
    val byComp = rows.groupBy(_._2)
    // the planted triple {0, 100, 200} and pairs {1,101}, {2,102}
    assert(byComp(0L).map(_._1).toSet === Set(0L, 100L, 200L))
    assert(byComp(1L).map(_._1).toSet === Set(1L, 101L))
    assert(byComp(2L).map(_._1).toSet === Set(2L, 102L))
    // exactly one keeper per component, singletons keep themselves
    byComp.foreach { case (_, ms) => assert(ms.count(_._3 == 1L) === 1) }
    assert(rows.count(_._3 == 1L) === 30) // 34 rows − 4 pruned dups
  }

  test("low_centroid_sim keeps the member least similar to its centroid") {
    import spark.implicits._
    // one 3-member group: the centroid hugs the {10, 12} majority, so
    // 11's stronger deviation gives it the LOWEST centroid cosine
    val df = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.05f)),
      (11L, Seq(1.0f, 0.0f, 0.0f, -0.60f)),
      (12L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (20L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val m = Similarity.semanticDedupByCluster(df, col("vec_id"),
        col("embedding"), lit(0L), threshold = 0.8)
      .collect().map(r => (r.getLong(0), (r.getDouble(3), r.getLong(4)))).toMap
    assert(m(10L)._1 > m(11L)._1 && m(12L)._1 > m(11L)._1)
    assert(m(11L)._2 === 1L && m(10L)._2 === 0L && m(12L)._2 === 0L)
    assert(m(20L)._2 === 1L) // singleton keeps itself
  }

  test("min_id keep rule is the portable alternative") {
    import spark.implicits._
    val df = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.05f)),
      (11L, Seq(1.0f, 0.0f, 0.0f, -0.40f))
    ).toDF("vec_id", "embedding")
    val m = Similarity.semanticDedupByCluster(df, col("vec_id"),
        col("embedding"), lit(0L), threshold = 0.9, keepRule = "min_id")
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(m === Map(10L -> 1L, 11L -> 0L))
  }

  test("oversized clusters skip pairing but keep members as singletons") {
    val out = Similarity.semanticDedupByCluster(corpus, col("vec_id"),
      col("embedding"), lit(0L), threshold = 0.98, clusterCap = 5)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(rows.length === 34)       // nothing dropped
    assert(rows.forall(_._2 == 1L))  // every member a singleton keeper
  }
  test("mmrSelect spreads picks across clusters; top-k would not") {
    import spark.implicits._
    // three tight clusters along different axes; cluster A nearest
    // the centroid direction. Plain top-3 by relevance = 3 copies of
    // A; MMR must take one per cluster.
    def jitter(base: Seq[Float], i: Int): Seq[Float] =
      base.zipWithIndex.map { case (x, j) =>
        x + (if (j == i % 4) 0.001f else 0f) }
    val a = Seq(1f, 0.3f, 0.3f, 0f); val b = Seq(0f, 1f, 0f, 0.3f)
    val c = Seq(0.3f, 0f, 1f, 0f)
    val rows = (0 until 3).map(i => (i.toLong, jitter(a, i))) ++
      (3 until 6).map(i => (i.toLong, jitter(b, i))) ++
      (6 until 9).map(i => (i.toLong, jitter(c, i)))
    val df = rows.toDF("vec_id", "embedding")
    val sel = Similarity.mmrSelect(df, col("vec_id"), col("embedding"),
        k = 3, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val clusters = sel.map(_._2 / 3).toSet
    assert(clusters.size === 3,
      "one pick per cluster expected, got " + sel.mkString(","))
    // k=1 is the plain relevance argmax with id tiebreak
    val one = Similarity.mmrSelect(df, col("vec_id"), col("embedding"),
      k = 1).collect()(0)
    assert(one.getLong(0) === 1L)
  }
}
