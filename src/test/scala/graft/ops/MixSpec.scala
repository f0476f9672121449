package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Budget-cut semantics, per-source isolation, seed determinism, and
  * the greedy-prefix property of the deterministic mix. */
class MixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    import spark.implicits._
    (0L until 40L).map { i =>
      val src = if (i < 20) "a" else "b"
      (i, src, ("w " * (5 + (i % 7)).toInt).trim) // 5..11 tokens
    }.toSeq.toDF("doc_id", "source", "text")
  }

  test("cum_tokens never exceeds the source budget; overrides apply") {
    import spark.implicits._
    val got = Mix.build(docs, col("text"), col("doc_id"), col("source"),
        defaultBudget = 30L, budgets = Map("b" -> 50L), seed = 1L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val (as, bs) = got.partition(_._1 == "a")
    assert(as.nonEmpty && as.map(_._3).max <= 30L)
    assert(bs.nonEmpty && bs.map(_._3).max <= 50L)
    assert(bs.map(_._3).max > 30L) // the override actually binds later
    // cum is the running sum of kept prefix: max cum == sum of kept
    assert(as.map(_._2).sum === as.map(_._3).max)
  }

  test("same seed reproduces the exact mix; a new seed re-rolls it") {
    import spark.implicits._
    def ids(seed: Long) = Mix.build(docs, col("text"), col("doc_id"),
        col("source"), 30L, seed = seed)
      .collect().map(_.getLong(0)).toSet
    assert(ids(1L) === ids(1L))
    assert(ids(1L) !== ids(2L)) // 40 docs: same-set collision ~0
  }

  test("greedy prefix: dropping the budget only removes docs") {
    import spark.implicits._
    def ids(b: Long) = Mix.build(docs, col("text"), col("doc_id"),
        col("source"), b, seed = 1L).collect().map(_.getLong(0)).toSet
    assert(ids(20L).subsetOf(ids(60L)))
  }

  test("plan: one window exchange on source, nothing else") {
    import spark.implicits._
    val plan = Mix.build(docs, col("text"), col("doc_id"), col("source"), 30L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    assert(!plan.contains("Union") && !plan.contains("Join"), plan)
  }
}
