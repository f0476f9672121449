package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Large-scale deduplication operators over a documents table.
  *
  * All variants are single-pass + one shuffle on a derived key (content
  * hash, LSH band, …) — the only shape that survives 100 TB. Nothing
  * collects to the driver; candidate generation is always key-equality
  * joins (shuffle- or broadcast-hash), never cartesian.
  */
object Dedup {

  /** Exact duplicates: one shuffle on the content hash. Returns one row
    * per distinct content with its cluster size and the kept (minimum)
    * id — the standard "keep first, drop rest" contract. */
  def exact(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(md5(text.cast(BinaryType)).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("cluster_size"))

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word k-shingles of a text column (array of strings). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(F.transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the shingle set. Pure higher-order
    * columns — stays inside codegen, no UDF. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    F.transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(F.transform(sh, s => xxhash64(s, seed))))

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * signature → `bands` bands of `rows` hashes; docs sharing any band
    * hash become candidates; candidates are verified with exact Jaccard
    * over shingle sets. Plan: project (no shuffle) → explode bands
    * (×bands) → shuffle on (band, hash) → self-join inside buckets →
    * verify. Bucket sizes are capped implicitly by hash diffusion; at
    * 100 TB add a `HAVING count < cap` guard on pathological buckets.
    */
  def minhashLSH(docs: DataFrame, text: Column, id: Column,
      shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sig = docs.select(id.as("doc_id"), shingles(text, shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = sig.select(col("doc_id"), col("sh"),
      posexplode(F.transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .distinct()
  }

  /** 64-bit SimHash fingerprint: per-token hash votes on each bit,
    * sign of the vote sum becomes the bit. Entirely higher-order
    * column functions. */
  def simhash(text: Column): Column = {
    val votes = F.aggregate(
      tokens(text),
      F.transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, bit) => a + when(call_function("shiftright", h, bit).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      })
    F.aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, bit) => when(v > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L))),
      lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** SimHash near-dup candidates: block on rotated 16-bit chunks (docs
    * within Hamming distance 3 of a 64-bit fingerprint share at least
    * one of 4 exact 16-bit chunks — pigeonhole), verify with popcount. */
  def simhashPairs(docs: DataFrame, text: Column, id: Column,
      maxHamming: Int = 3): DataFrame = {
    val fp = docs.select(id.as("doc_id"), simhash(text).as("fp"))
    val chunked = fp.select(col("doc_id"), col("fp"),
      posexplode(F.transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("fp"), c * 16).bitwiseAND(0xFFFFL)))
        .as(Seq("chunk", "ck")))
    val a = chunked.select(col("chunk"), col("ck"), col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("chunk"), col("ck"), col("doc_id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Character n-gram Jaccard similarity pairs, LSH-bucketed by the
    * minimum n-gram hash (cheap single-band blocking), verified exactly. */
  def ngramJaccardPairs(docs: DataFrame, text: Column, id: Column,
      n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val norm = lower(regexp_replace(text, "\\s+", " "))
    val gramsCol = array_distinct(F.transform(
      sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
      i => norm.substr(i, lit(n))))
    val base = docs.select(id.as("doc_id"), gramsCol.as("grams"))
      .withColumn("bucket", array_min(F.transform(col("grams"), g => xxhash64(g))))
    val a = base.select(col("bucket"), col("doc_id").as("id_a"), col("grams").as("g_a"))
    val b = base.select(col("bucket"), col("doc_id").as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast(DoubleType) /
          size(array_union(col("g_a"), col("g_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
