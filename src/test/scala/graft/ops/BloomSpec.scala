package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom filter contracts: zero false negatives, measured FPR near
  * theory, a shuffle-free gate plan, and end-to-end equivalence of
  * bloom-gated decontamination with the exact path. */
class BloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val M = 8192L
  val K = 4

  test("no false negatives: every fitted key passes the gate") {
    import spark.implicits._
    val keys = (1 to 300).map(i => s"key$i").toDF("k")
    val bloom = Bloom.fit(keys, col("k"), M, K, seed = 3L)
    assert(Bloom.mightContain(keys, col("k"), bloom, M, K, seed = 3L)
      .count() === 300L)
  }

  test("false-positive rate on disjoint probes is near theory") {
    import spark.implicits._
    val keys = (1 to 300).map(i => s"key$i").toDF("k")
    val bloom = Bloom.fit(keys, col("k"), M, K, seed = 3L)
    val probes = (1 to 4000).map(i => s"other$i").toDF("k")
    val fp = Bloom.mightContain(probes, col("k"), bloom, M, K, seed = 3L)
      .count().toDouble / 4000
    val theory = Bloom.fpRate(300, M, K) // ~0.00034
    assert(fp <= 5 * theory + 0.002, s"fp=$fp theory=$theory")
  }

  test("gate plan is shuffle-free against a materialized bitmap") {
    import spark.implicits._
    val keys = (1 to 50).map(i => s"key$i").toDF("k")
    val bitmap = spark.createDataFrame(
      Bloom.fit(keys, col("k"), M, K, seed = 0L).collect().toSeq.asJava,
      Bloom.fit(keys, col("k"), M, K, seed = 0L).schema)
    val plan = Bloom.mightContain(keys, col("k"), bitmap, M, K, seed = 0L)
      .queryExecution.executedPlan.toString
    // broadcast exchanges are the point; what must be absent is any
    // SHUFFLE exchange (hash/range/round-robin repartitioning)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(!plan.contains("Exchange RoundRobin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bloom-gated contamination equals the exact path") {
    import spark.implicits._
    val docs = (1 to 60).map { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel " +
        s"w${i % 7} x${i % 11} y$i z${i * 31 % 13}"
      (i.toLong, base)
    }.toDF("doc_id", "text")
    val train = docs.filter($"doc_id" % 3 =!= 0)
    val test_ = docs.filter($"doc_id" % 3 === 0)
    val exact = Decontaminate.contamination(train, test_, $"text", $"doc_id", 3)
      .orderBy("test_id").collect().toSeq
    val gated = Decontaminate.contaminationBloomGated(train, test_, $"text",
      $"doc_id", 3, mBits = 1L << 14, k = 4, seed = 5L)
      .orderBy("test_id").collect().toSeq
    assert(gated === exact)
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
