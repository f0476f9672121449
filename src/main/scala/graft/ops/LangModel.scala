package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-based n-gram language-model scoring — the classic
  * perplexity quality filter of a pretraining pipeline (KenLM-style
  * filtering, public: Heafield 2011; CCNet, Wenzek et al. 2020): fit
  * bigram statistics on a corpus, score each document by its average
  * negative log-likelihood under add-k smoothing, and drop/deprioritize
  * the tail. Self-scoring (fit and score on the same corpus) flags
  * documents whose token transitions are atypical for the corpus —
  * boilerplate, gibberish, wrong-language residue.
  *
  * Model: P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V), where c(w1·)
  * is w1's count as a bigram HISTORY (the standard MLE denominator)
  * and V the corpus vocabulary size. Doc score = Σ c_d(w1,w2)·−ln P
  * / Σ c_d — the per-bigram mean NLL (exp of it = perplexity).
  *
  * Scale shape: the corpus explodes to bigrams ONCE into per-doc
  * counts (the big table); global counts derive from per-doc counts
  * (map-side-combined aggregations, never a second corpus pass);
  * scoring is two key-equality joins of counts against counts plus a
  * broadcast of the 1-row vocabulary scalar. No collect, no global
  * sort, no per-doc state.
  */
object LangModel {

  private def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** (doc_id, w1, w2, c) — per-document bigram counts. Documents with
    * fewer than two tokens emit nothing. */
  def docBigramCounts(docs: DataFrame, text: Column, id: Column): DataFrame = {
    val t = tokens(text)
    docs.select(id.as("doc_id"), t.as("__t"))
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
      .groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("c"))
  }

  /** Score every document against bigram statistics of the SAME
    * corpus. Output (doc_id, n_bigrams, nll): mean per-bigram negative
    * log-likelihood, rounded to `roundTo` for engine-portable
    * comparison. Higher = more atypical for the corpus. */
  def scoreBigram(docs: DataFrame, text: Column, id: Column,
      k: Double = 0.5, roundTo: Int = 6): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val d = docBigramCounts(docs, text, id)
    val c2 = d.groupBy("w1", "w2").agg(sum("c").as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val v = docs.select(explode(tokens(text)).as("tok"))
      .agg(countDistinct("tok").as("v"))
    d.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        round(
          sum(col("c") * -log((col("c2") + k) /
            (col("c1") + lit(k) * col("v")))) / sum(col("c")),
          roundTo).as("nll"))
  }
}
