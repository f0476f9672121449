package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus keyword search: inverted postings + BM25 ranking (Robertson
  * et al.'s Okapi weighting with Lucene's +1 IDF form, so IDF stays
  * positive even for terms in most documents) — the exploration
  * primitive every corpus curation loop needs next to the ANN paths.
  *
  * Shape at 100 TB: the postings build is one tokenize pass + one
  * (term, doc) aggregate shuffle over the corpus — write-once via
  * [[buildIndex]], which lays postings out repartitioned-by-term and
  * sorted within partitions so parquet row-group min/max stats prune
  * the term-filter scan of every query. A query then reads only the
  * matching postings slivers (query terms are a handful), broadcasts
  * the per-term document frequencies and the 1-row corpus stats, and
  * resolves the top-k with TakeOrderedAndProject — never a global
  * sort, never a driver collect.
  */
object Search {

  /** Inverted postings: one row per (term, doc_id) with its term
    * frequency. Tokenization matches [[Dedup.tokens]]. */
  def postings(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(Dedup.tokens(text)).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** Per-document token counts (BM25's length normalizer). */
  def docLengths(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.select(id.as("doc_id"), size(Dedup.tokens(text)).cast("long").as("dl"))

  /** Persist the search index: postings (repartitioned by term and
    * sorted within partitions, so every parquet row group covers a
    * narrow term range and query-term filters prune at the footer),
    * doc lengths, and the 1-row (n_docs, avgdl) stats table. */
  def buildIndex(docs: DataFrame, text: Column, id: Column,
      path: String): Unit = {
    postings(docs, text, id)
      // RANGE partitioning, not hash: a stopword-scale term would hash
      // every one of its postings into a single straggler task/file;
      // the range partitioner's sampling splits a hot term across
      // adjacent partitions (doc_id as secondary key) while keeping
      // files term-clustered, so footer min/max pruning still holds
      .repartitionByRange(col("term"), col("doc_id"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(s"$path/postings")
    val dl = docLengths(docs, text, id)
    dl.write.mode("overwrite").parquet(s"$path/doclen")
    dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append new documents to a persisted search index — the
    * write-once-append-many twin of [[Similarity.appendToIvfIndex]].
    * Postings and doc lengths land as NEW parquet files (term-sorted
    * within the appended files, so footer min/max pruning holds per
    * file); the 1-row stats table is recomputed from the doclen store
    * (one cheap aggregate) and overwritten. Per-term document
    * frequencies need no stored state at all: queries derive df from
    * the postings rows they scan, so old and new files compose by
    * construction. Contract: a doc_id is appended at most once (file
    * appends are at-least-once under replay — reconcile upstream with
    * exact dedup, as with the IVF store). */
  def appendToIndex(spark: SparkSession, indexPath: String, docs: DataFrame,
      text: Column, id: Column): Unit = {
    postings(docs, text, id)
      .repartitionByRange(col("term"), col("doc_id"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("append").parquet(s"$indexPath/postings")
    docLengths(docs, text, id)
      .write.mode("append").parquet(s"$indexPath/doclen")
    spark.read.parquet(s"$indexPath/doclen")
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(s"$indexPath/stats")
  }

  /** BM25 top-k over a persisted index. */
  def bm25TopKIndexed(spark: SparkSession, indexPath: String, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    score(spark.read.parquet(s"$indexPath/postings"),
      spark.read.parquet(s"$indexPath/doclen"),
      spark.read.parquet(s"$indexPath/stats"), query, k, k1, b)

  /** Inline BM25 top-k: derive postings/lengths/stats and score in one
    * job. For repeated queries prefer [[buildIndex]] +
    * [[bm25TopKIndexed]]. */
  def bm25TopK(docs: DataFrame, text: Column, id: Column, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dl = docLengths(docs, text, id)
    score(postings(docs, text, id), dl,
      dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")),
      query, k, k1, b)
  }

  /** Per-document keyword extraction: the `k` highest tf·idf terms of
    * each document (idf = ln(N/df), ties broken by term so the cut is
    * deterministic). Output: doc_id, term, score, rk.
    *
    * Reuses the postings aggregate; the ranking is one row_number
    * window per doc over the (small) per-doc term lists. tf, df and N
    * are integers, so scores are bit-identical across engines and the
    * rank cut needs no rounding tolerance. */
  def tfidfKeywords(docs: DataFrame, text: Column, id: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val post = postings(docs, text, id)
    val df = post.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    // df spans the WHOLE vocabulary — unlike the query-filtered df in
    // bm25, forcing a broadcast would ship an unbounded dictionary;
    // plain equality join and let AQE downgrade to broadcast when small
    val scored = post
      .join(df, "term")
      .crossJoin(broadcast(stats))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast(DoubleType) / col("df")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), round(col("score"), 6).as("score"),
        col("rk"))
  }

  private def score(post: DataFrame, doclen: DataFrame, stats: DataFrame,
      query: String, k: Int, k1: Double, b: Double): DataFrame = {
    val qTerms = query.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toSeq.distinct
    val filtered = post.filter(col("term").isin(qTerms: _*))
    val df = filtered.groupBy("term")
      .agg(count(lit(1)).as("df")) // (term, doc) rows are unique
    val idf = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")
    val termScore = idf * col("tf").cast(DoubleType) * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * norm)
    filtered
      .join(broadcast(df), "term")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(termScore), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
