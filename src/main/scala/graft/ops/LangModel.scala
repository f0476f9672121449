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

  /** Persist bigram statistics fit on a reference corpus — the
    * write-once half of the CCNet shape (fit on a trusted corpus,
    * score every crawl increment against it): `path/pairs` =
    * (w1, w2, c2), `path/hist` = (w1, c1) derived FROM the stored
    * pairs (one source of truth), `path/meta` = the vocabulary size,
    * written LAST as the commit marker. */
  def buildBigramStats(docs: DataFrame, text: Column, id: Column,
      path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    docBigramCounts(docs, text, id)
      .groupBy("w1", "w2").agg(sum("c").as("c2"))
      .write.mode("overwrite").parquet(s"$path/pairs")
    spark.read.parquet(s"$path/pairs")
      .groupBy("w1").agg(sum("c2").as("c1"))
      .write.mode("overwrite").parquet(s"$path/hist")
    val v = docs.select(explode(tokens(text)).as("tok"))
      .agg(countDistinct("tok")).head().getLong(0)
    Seq(v).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Score documents against STORED bigram statistics
    * ([[buildBigramStats]]) — add-k smoothing handles what the
    * reference corpus never saw: an unseen bigram of a seen history
    * scores k/(c1+kV), a fully-unseen history k/(kV) = 1/V. Same
    * output contract as [[scoreBigram]]; when the stats were fit on
    * the scored corpus itself the two are identical (spec-proven). */
  def scoreBigramAgainst(spark: org.apache.spark.sql.SparkSession,
      path: String, docs: DataFrame, text: Column, id: Column,
      k: Double = 0.5, roundTo: Int = 6): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val pairs = spark.read.parquet(s"$path/pairs")
    val hist = spark.read.parquet(s"$path/hist")
    val vDf = spark.read.parquet(s"$path/meta")
    docBigramCounts(docs, text, id)
      .join(pairs, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .crossJoin(broadcast(vDf))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        round(
          sum(col("c") * -log((coalesce(col("c2"), lit(0L)) + k) /
            (coalesce(col("c1"), lit(0L)) + lit(k) * col("v")))) /
            sum(col("c")),
          roundTo).as("nll"))
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
