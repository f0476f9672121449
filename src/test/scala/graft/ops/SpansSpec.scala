package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture semantics for the exact-substring dedup primitive:
  * span boundaries, keep-first ownership, maximal-merge of
  * overlapping grams, and scrub reconstruction. */
class SpansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // a 12-token verbatim run planted inside two otherwise-distinct docs
  private val run = "one two three four five six seven eight nine ten eleven twelve"
  private val docA = s"alpha beta $run gamma delta epsilon zeta eta theta"
  private val docB = s"iota kappa lambda mu $run nu xi omicron pi rho"

  test("a shared >=n run is found only in the non-owner, with exact bounds") {
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val spans = Spans.duplicatedSpans(docs, col("text"), col("doc_id"), n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 owns every shared gram (min id): only doc 2 is covered.
    // run occupies doc B tokens 5..16 — one maximal span of 12 even
    // though three overlapping 10-grams cover it
    assert(spans.toSeq === Seq((2L, 5L, 12L)))
  }

  test("scrub removes the span from the non-owner and nothing else") {
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val clean = Spans.removeDuplicatedSpans(docs, col("text"), col("doc_id"),
        n = 10)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(clean(1L) === (docA, 0L), "owner text must survive verbatim")
    assert(clean(2L) ===
      ("iota kappa lambda mu nu xi omicron pi rho", 12L))
  }

  test("a doc that is entirely duplicated text scrubs to empty") {
    val docs = Seq((1L, docA), (3L, run)).toDF("doc_id", "text")
    val clean = Spans.removeDuplicatedSpans(docs, col("text"), col("doc_id"),
        n = 10)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(clean(3L) === ("", 12L))
    assert(clean(1L) === (docA, 0L))
  }

  test("docs shorter than n produce no grams and survive scrub intact") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    assert(Spans.duplicatedSpans(docs, col("text"), col("doc_id"), n = 10)
      .count() === 0L)
    val clean = Spans.removeDuplicatedSpans(docs, col("text"), col("doc_id"),
        n = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) === "tiny doc" && clean(2L) === "tiny doc")
  }

  // 200 docs, the HALF with even ids sharing one planted boilerplate
  // 10-gram — fan-in 100 > HotGramDocs(64), so these hits take the
  // SALTED join path; the rest of each doc is unique filler
  private def hotCorpus = {
    val boiler = "this content is provided as is without any warranty whatsoever"
    (1L to 200L).map { i =>
      val filler = (0 until 12).map(j => s"u${i}w$j").mkString(" ")
      val txt = if (i % 2 == 0) s"$filler $boiler" else filler
      (i, txt)
    }.toDF("doc_id", "text")
  }

  test("hot boilerplate gram (salted path) covers every non-owner exactly") {
    val spans = Spans.duplicatedSpans(hotCorpus, col("text"), col("doc_id"),
        n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // owner = min even id (2); the other 99 even docs each lose the
    // 10-token boilerplate at tokens 13..22, merged into one span
    val expect = (4L to 200L by 2).map(i => (i, 13L, 10L))
    assert(spans.toSeq === expect)
  }

  test("capped run drops the hot gram into the ledger, finds nothing else") {
    val docs = hotCorpus
    assert(Spans.duplicatedSpans(docs, col("text"), col("doc_id"), n = 10,
      maxDocsPerGram = 50).count() === 0L)
    val ledger = Spans.droppedGrams(docs, col("text"), col("doc_id"), n = 10,
        maxDocsPerGram = 50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(ledger.toSeq === Seq(
      ("this content is provided as is without any warranty whatsoever", 100L)))
    // and the scrubbed corpus under the cap is untouched
    val untouched = Spans.removeDuplicatedSpans(docs, col("text"),
        col("doc_id"), n = 10, maxDocsPerGram = 50)
      .filter(col("n_removed") > 0).count()
    assert(untouched === 0L)
  }

  test("matching is case-insensitive; reconstruction keeps original case") {
    val docs = Seq((1L, docA), (2L, docB.toUpperCase)).toDF("doc_id", "text")
    val spans = Spans.duplicatedSpans(docs, col("text"), col("doc_id"), n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq === Seq((2L, 5L, 12L)))
    val clean = Spans.removeDuplicatedSpans(docs, col("text"), col("doc_id"),
        n = 10)
      .filter(col("doc_id") === 2).head().getString(1)
    assert(clean === "IOTA KAPPA LAMBDA MU NU XI OMICRON PI RHO")
  }
}
