package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>).
  *
  * Scale design: queries are always the broadcast side; the corpus is
  * streamed once. Top-k never sorts globally — it reduces via a
  * two-stage partial top-k (per shuffle partition, then merged), the
  * same shape as TakeOrdered but expressed as aggregations so it
  * composes with the rest of a plan.
  */
object Similarity {

  /** Cosine similarity of two ARRAY<FLOAT> columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = F.aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(F.aggregate(a, lit(0.0), (acc, x) => acc + x.cast(DoubleType) * x))
    val nb = sqrt(F.aggregate(b, lit(0.0), (acc, x) => acc + x.cast(DoubleType) * x))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: every query (small, broadcast) against
    * every corpus vector, reduced to k per query without a global sort.
    *
    * Output: (query_id, vec_id, score) — `score` rounded to `roundTo`
    * decimals with (score desc, vec_id asc) tie-breaking so results are
    * engine-independent deterministic.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      roundTo: Int = 4): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .join(q) // broadcast nested loop: one corpus pass
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), roundTo).as("score"))
    topKPerKey(scored, col("query_id"), col("score"), col("vec_id"), k)
  }

  /** Two-stage distributed top-k per key: partial top-k inside each
    * shuffle partition, then merge of the (tiny) partials. No partition
    * ever holds more than its own rows + k, no global sort. */
  def topKPerKey(scored: DataFrame, key: Column, score: Column,
      id: Column, k: Int): DataFrame = {
    // sort key: score desc then id asc → encode as struct(-score, id)
    val partial = scored
      .groupBy(key.as("query_id"), spark_partition_id().as("_pid"))
      .agg(slice(array_sort(collect_list(struct((-score).as("ns"), id.as("vec_id")))),
        1, k).as("top"))
    partial
      .groupBy(col("query_id"))
      .agg(slice(array_sort(flatten(collect_list(col("top")))), 1, k).as("top"))
      .select(col("query_id"), explode(col("top")).as("e"))
      .select(col("query_id"), col("e.vec_id").as("vec_id"), (-col("e.ns")).as("score"))
  }

  /** Random-hyperplane LSH buckets: the sign bits of `planes`
    * deterministic pseudo-random hyperplanes (seeded by (table, plane,
    * dim) hashes — no RNG state, reproducible across engines/runs). */
  def lshBucket(emb: Column, planes: Int, dims: Int, table: Int = 0): Column = {
    val bits = F.transform(sequence(lit(0), lit(planes - 1)), p => {
      // pseudo-random plane component for (table, p, i): xxhash64 → [-1, 1];
      // seed arithmetic in LONG (int would overflow under ANSI at high
      // table counts)
      val dot = F.aggregate(zip_with(emb, sequence(lit(0), lit(dims - 1)),
        (x, i) => x.cast(DoubleType) *
          ((xxhash64(lit(table.toLong * 1000003L) + p.cast(LongType) * dims + i).cast(DoubleType) /
            lit(Long.MaxValue.toDouble)))),
        lit(0.0), (a, x) => a + x)
      when(dot >= 0, lit(1L)).otherwise(lit(0L))
    })
    F.aggregate(zip_with(bits, sequence(lit(0), lit(planes - 1)),
      (bit, i) => call_function("shiftleft", bit, i)), lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** LSH-bucketed ANN: only corpus vectors sharing a hyperplane bucket
    * with the query — in any of `tables` independent hash tables — are
    * scored. The 100 TB path: bucket-equality join instead of a full
    * corpus scan per query. Recall < 1 by construction; `planes` trades
    * selectivity against per-table recall and `tables` buys recall back
    * (P(candidate) = 1 − (1 − p^planes)^tables). Candidates are
    * de-duplicated across tables BEFORE scoring, so each (query,
    * vector) pays the cosine once. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, dims: Int = 64, tables: Int = 1, roundTo: Int = 4): DataFrame = {
    val tableBuckets = (emb: Column) => F.array(
      (0 until tables).map(t => struct(lit(t).as("t"), lshBucket(emb, planes, dims, t).as("b"))): _*)
    val c = corpus.select(col("vec_id"),
      explode(tableBuckets(col("embedding"))).as("tb"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      explode(tableBuckets(col("embedding"))).as("tb")))
    val cands = c.join(q, Seq("tb")).select("query_id", "vec_id").distinct()
    val scored = cands
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), roundTo).as("score"))
    topKPerKey(scored, col("query_id"), col("score"), col("vec_id"), k)
  }
}
