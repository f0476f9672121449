package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Crawl-dump ingestion: JSONL (one JSON document per line — the
  * format web corpora actually arrive in) normalized into the
  * engine's document shape, with the failure modes a 100 TB crawl
  * guarantees handled as DATA, not exceptions:
  *
  *  - malformed lines land in a quarantine frame (Spark PERMISSIVE
  *    mode + corrupt-record capture), never abort the job;
  *  - documents missing the text field are quarantined too — a
  *    curation funnel reads absence as "invalid", not "empty";
  *  - ids: the source id field when present, else a content hash
  *    (xxhash64 of text ∥ source) — deterministic across retries and
  *    engines, so downstream stores' anti-join idempotence keeps
  *    working when the crawler re-delivers a shard.
  *
  * An explicit schema skips Spark's inference pass (inference reads
  * the data TWICE — never acceptable at crawl scale); pass
  * `schema = None` only for exploration. */
object Ingest {

  val DefaultSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("source", StringType),
    StructField("lang", StringType)))

  /** `(documents, quarantine)`: documents as
    * `(doc_id, text, source, lang)` with synthesized ids where
    * needed; quarantine as `(line, reason)`. */
  def jsonlDocuments(spark: SparkSession, path: String,
      schema: Option[StructType] = Some(DefaultSchema)): (DataFrame, DataFrame) = {
    val withCorrupt = schema.map(s =>
      if (s.fieldNames.contains("__corrupt")) s
      else s.add(StructField("__corrupt", StringType)))
    val reader = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "__corrupt")
    val raw = withCorrupt.map(reader.schema).getOrElse(reader).json(path)
    val hasCorrupt = raw.columns.contains("__corrupt")
    val corrupt = if (hasCorrupt) col("__corrupt").isNotNull else lit(false)
    val quarantine = raw
      .filter(corrupt || col("text").isNull)
      .select(
        (if (hasCorrupt) coalesce(col("__corrupt"), to_json(struct(raw.columns
          .filterNot(_ == "__corrupt").map(col): _*)))
         else to_json(struct(raw.columns.map(col): _*))).as("line"),
        when(corrupt, "malformed_json").otherwise("missing_text").as("reason"))
    val docs = raw
      .filter(!corrupt && col("text").isNotNull)
      .select(
        coalesce(col("id"), xxhash64(col("text"), coalesce(col("source"),
          lit("")))).as("doc_id"),
        col("text"), col("source"), col("lang"))
    (docs, quarantine)
  }
}
