package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training over the corpus (Sennrich,
  * Haddow & Birch 2016 — the public BPE recipe behind most LLM
  * tokenizers): start from characters, repeatedly merge the most
  * frequent adjacent symbol pair. The trainer is the canonical
  * distributed shape — pair statistics are ONE map-side-combined
  * aggregate per merge over the DISTINCT-WORD table (corpus-scale
  * text reduces to vocabulary-scale state after [[wordCounts]]; at
  * 100 TB the word table is millions of rows, not billions of
  * tokens), and only the single argmax row ever reaches the driver.
  * Merge application is a per-row left-to-right fold (higher-order
  * `aggregate`), so no UDF and no driver data movement.
  *
  * Simplification vs the paper: no end-of-word marker symbol — merges
  * never cross word boundaries here because pairs are only formed
  * within words, and the marker's only role (distinguishing
  * word-final units) is not load-bearing for corpus analytics. Words
  * are [[Dedup.tokens]] (lowercased whitespace tokens), keeping the
  * statistics aligned with every other token-level operator. */
object Bpe {

  /** Distinct words with frequencies — the only corpus-scale pass. */
  def wordCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(Dedup.tokens(text)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wcount"))

  /** Character seed: each word as its symbol sequence. */
  def seedSymbols(words: DataFrame): DataFrame =
    words.select(split(col("word"), "").as("syms"), col("wcount"))

  private def pairsOf(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"),
          element_at(syms, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Adjacent-pair frequencies over the current symbol table,
    * weighted by word frequency. */
  def pairCounts(symWords: DataFrame): DataFrame =
    symWords.select(col("wcount"), explode(pairsOf(col("syms"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wcount")).as("freq"))

  /** One merge applied to a symbol sequence: greedy left-to-right,
    * non-overlapping — the fold replaces the accumulator's tail when
    * it reads `a` and the next symbol is `b`, so a freshly merged
    * symbol never re-merges with the same rule in this pass (exactly
    * the paper's semantics). `get` (0-based, null out-of-bounds)
    * keeps the empty-accumulator probe ANSI-safe. */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(get(acc, size(acc) - 1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  case class Merge(rank: Int, a: String, b: String, freq: Long)

  /** Learn `numMerges` merges. Per merge: one aggregate over the
    * cached word-symbol table, one single-row collect (argmax with
    * the deterministic tie order freq desc, a asc, b asc), one fold
    * pass rewriting the table (localCheckpoint keeps the plan flat —
    * at cluster scale swap for a reliable checkpoint dir). Stops
    * early when no adjacent pair is left. */
  def train(docs: DataFrame, text: Column, numMerges: Int): Seq[Merge] = {
    var words = seedSymbols(wordCounts(docs, text)).localCheckpoint(true)
    val out = ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("freq").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, f) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(r, a, b, f)
        val next = words
          .select(mergeOnce(col("syms"), a, b).as("syms"), col("wcount"))
          .localCheckpoint(true)
        words.unpersist()
        words = next
        r += 1
      }
    }
    words.unpersist()
    out.toSeq
  }

  /** The learned merge ranks in rank order, applied to a text column:
    * per word, chars folded through every merge. Expression depth
    * grows with the merge count — intended for the small-k analytic
    * tokenizer, not a production vocab. */
  def applySymbols(text: Column, merges: Seq[(String, String)]): Column =
    transform(Dedup.tokens(text), w =>
      merges.foldLeft(split(w, "")) { case (syms, (a, b)) =>
        mergeOnce(syms, a, b)
      })

  /** BPE token count per row under the learned merges — the fused
    * codegen kernel ([[graft.functions.Kernels.bpeTokenCount]]), not
    * the [[applySymbols]] column fold: interpreted, that fold nests
    * one `aggregate` lambda per merge per word (measured 30s+ over
    * sf0.1 at 12 merges); the kernel is one linear pass per merge,
    * same greedy left-to-right merge rule (reference-parity proven in
    * BpeSpec on the real corpus). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.GraftFunctions.bpeCount(text,
      merges.flatMap(m => Seq(m._1, m._2)).toArray)
}
