package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN detection — the exact-substring
  * half of training-data dedup (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better": document-level
  * near-dup removal misses the boilerplate, licenses, and quoted
  * passages that repeat VERBATIM inside otherwise-distinct documents;
  * those are what LMs memorize). Document-level funnels (minhash,
  * simhash, containment) live in [[Dedup]]; this module finds and
  * removes the repeated substrings themselves.
  *
  * The distributed shape, instead of the paper's single-node suffix
  * array: token n-grams with start positions → one shuffle grouping
  * by gram to find grams spanning >1 document and their keep-first
  * owner (min doc id) → non-owner occurrences explode to covered
  * token positions → per-document gap-and-islands merge into MAXIMAL
  * spans. Every join is a key-equality join on the gram string, every
  * window is partitioned by document — nothing global, nothing
  * quadratic; overlapping duplicated grams chain into one long span
  * by construction (their covered positions are contiguous), which is
  * how an n-gram filter recovers ≥n-token exact repeats of ANY
  * length.
  *
  * All positions are 1-based token indices over a whitespace
  * tokenization; matching is case-insensitive (grams lowercased),
  * reconstruction keeps original case. Engine-portable verbatim —
  * both queries are DuckDB-oracled end-to-end.
  */
object Spans {

  /** Token n-gram start hits: (doc_id, pos 1-based, gram). The gram
    * is the lowercased space-join of tokens pos..pos+n-1. */
  def gramHits(docs: DataFrame, text: Column, id: Column, n: Int): DataFrame = {
    val toks = split(trim(col("__text")), "\\s+")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => lower(array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
    // exchange BELOW the gram projection: transform/slice/array_join
    // are interpreted higher-order expressions, and a coarse parquet
    // scan would serialize them on a task or two (same rule as
    // Decontaminate's gram stream) — round-robin them wide first
    docs.select(id.as("doc_id"), text.as("__text"))
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col("doc_id"), posexplode(grams).as(Seq("__p0", "gram")))
      .select(col("doc_id"), (col("__p0") + 1).cast("long").as("pos"),
        col("gram"))
  }

  /** Grams appearing in MORE docs than this take the salted join path
    * below; at or under it, plain equi-join skew is bounded (≤64 docs'
    * occurrences per shuffle key). */
  private[ops] val HotGramDocs = 64

  /** Salt fan-out for the hot-gram join: a boilerplate gram's hits
    * spread over this many shuffle keys instead of serializing one. */
  private[ops] val HotGramSalt = 32

  /** Covered positions of non-owner occurrences: every token index
    * that lies inside an n-gram some EARLIER document (min doc id =
    * keep-first owner) also contains.
    *
    * Skew design (r6 verdict fix): a boilerplate 10-gram shared by
    * millions of docs would funnel ALL its occurrences through one
    * shuffle key in a naive hits⋈dup join and then explode ×n — the
    * one serialization point in an otherwise doc-partitioned pipeline.
    * Split the dup-gram table by fan-in instead: grams in ≤
    * [[HotGramDocs]] docs join plainly (skew bounded by construction);
    * hotter grams join SALTED — hits carry a deterministic
    * pmod(xxhash64(doc_id), S) salt, the (small, ≤|hits|/threshold by
    * pigeonhole) hot-gram table replicates ×S, and the join key is
    * (gram, salt), spreading a 50%-of-corpus gram over S tasks. Both
    * paths are exact — semantics and oracle are UNCHANGED; only the
    * physical key distribution differs. `maxDocsPerGram` additionally
    * hard-caps fan-in for adversarial corpora: grams above it are
    * excluded from coverage and surface in [[droppedGrams]]' ledger
    * (default ∞ = exact contract). */
  private def covered(docs: DataFrame, text: Column, id: Column,
      n: Int, maxDocsPerGram: Long = Long.MaxValue): DataFrame = {
    val hits = gramHits(docs, text, id, n)
    val dup = hits.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("__nd"),
        min(col("doc_id")).as("__owner"))
      .filter(col("__nd") > 1 && col("__nd") <= maxDocsPerGram)
    val occ = { (joined: DataFrame) =>
      joined.filter(col("doc_id") =!= col("__owner"))
        .select(col("doc_id"), col("pos"))
    }
    val cold = occ(hits.join(dup.filter(col("__nd") <= HotGramDocs), Seq("gram")))
    val saltedHits = hits.withColumn("__salt",
      pmod(xxhash64(col("doc_id")), lit(HotGramSalt.toLong)))
    val hotRep = dup.filter(col("__nd") > HotGramDocs)
      .withColumn("__salt",
        explode(sequence(lit(0L), lit(HotGramSalt.toLong - 1))))
    val hot = occ(saltedHits.join(hotRep, Seq("gram", "__salt")))
    cold.union(hot)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
  }

  /** Dropped-gram ledger for a capped run: (gram, n_docs) for every
    * gram excluded from span coverage because it appears in more than
    * `maxDocsPerGram` distinct documents. Empty under the default
    * exact contract. */
  def droppedGrams(docs: DataFrame, text: Column, id: Column,
      n: Int, maxDocsPerGram: Long): DataFrame =
    gramHits(docs, text, id, n)
      .groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > maxDocsPerGram)

  /** Maximal duplicated spans per document: (doc_id, span_start,
    * span_len) — islands of consecutive covered positions (window
    * per document, the classic p − row_number() grouping key). */
  def duplicatedSpans(docs: DataFrame, text: Column, id: Column,
      n: Int, maxDocsPerGram: Long = Long.MaxValue): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("p")
    covered(docs, text, id, n, maxDocsPerGram)
      .withColumn("__i", col("p") - row_number().over(w))
      .groupBy(col("doc_id"), col("__i"))
      .agg(min(col("p")).as("span_start"), count(lit(1)).as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_len"))
  }

  /** The span-scrubbed corpus: (doc_id, clean_text, n_removed) with
    * duplicated spans deleted from every document EXCEPT the
    * keep-first owner. Reconstruction is token-level (whitespace
    * normalized to single spaces, original case kept); a document
    * that was nothing but duplicated text comes back as ''. */
  def removeDuplicatedSpans(docs: DataFrame, text: Column, id: Column,
      n: Int, maxDocsPerGram: Long = Long.MaxValue): DataFrame = {
    val toksArr = split(trim(col("__text")), "\\s+")
    val base = docs.select(id.as("doc_id"), text.as("__text"))
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col("doc_id"), toksArr.as("__t"))
    val toks = base
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("__p0", "tok")))
      .select(col("doc_id"), (col("__p0") + 1).cast("long").as("p"),
        col("tok"))
    val keptAgg = toks
      .join(covered(docs, text, id, n, maxDocsPerGram), Seq("doc_id", "p"),
        "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            x => x("tok")), " ").as("__clean"),
        count(lit(1)).as("__n_kept"))
    base.select(col("doc_id"), size(col("__t")).cast("long").as("__n_tok"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__clean"), lit("")).as("clean_text"),
        (col("__n_tok") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"))
  }
}
