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
  /** Deterministic WARC fixture for the ingest oracle: a 2-record
    * WARC/1.0 container per document — a `warcinfo` record with a
    * fixed software banner and a `response` whose payload is the
    * document text's UTF-8 bytes, so every oracle field (lengths,
    * URIs, payload md5) is recomputable in SQL without the bytes. */
  val WarcInfoPayload = "software: graft-crawler/1.0\r\n"
  def warcFixture(id: Long, text: String): Array[Byte] =
    Codecs.encodeWarc(Seq(
      (Map("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> s"<urn:uuid:info-$id>"),
        WarcInfoPayload.getBytes("UTF-8")),
      (Map("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"http://example.com/doc/$id",
        "WARC-Record-ID" -> s"<urn:uuid:resp-$id>"),
        text.getBytes("UTF-8"))))

  private val warcRecordSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType)))

  /** Explode WARC containers into records: (doc_id, rec_idx,
    * warc_type, target_uri, content_length, payload). Gzipped
    * containers (`.warc.gz` — one gzip member per record,
    * concatenated; detected by magic) are decompressed inline, so
    * the same entry point ingests both wire formats. A malformed
    * container yields a single quarantine row (rec_idx −1, type
    * 'malformed') instead of failing the job — the same
    * data-not-exceptions contract as the JSONL path. mapPartitions is
    * the per-partition imperative codec path (like
    * Multimodal.decodeMetaAuto); at crawl scale the input is one row
    * per WARC member (the gzip-member split the format was designed
    * for), so partitions parallelize by container. */
  def warcRecords(containers: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    val pruned = containers.select("doc_id", "warc")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(warcRecordSchema)
    pruned.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val raw = r.getAs[Array[Byte]](1)
        val bytes =
          if (Codecs.isGzip(raw)) Codecs.gunzipAll(raw).orNull else raw
        (if (bytes == null) None else Codecs.parseWarc(bytes)) match {
          case Some(recs) => recs.zipWithIndex.map { case (w, i) =>
            Row(id, i, w.warcType, w.targetUri, w.contentLength, w.payload)
          }
          case None =>
            Seq(Row(id, -1, "malformed", null, -1L, null))
        }
      }
    }(enc)
  }

  /** Gzipped twin of [[warcFixture]]: each record compressed as its
    * own gzip member, members concatenated — byte-for-byte the
    * `.warc.gz` layout crawlers ship. Decompressed content is
    * IDENTICAL to the plain fixture, so the same oracle covers it. */
  def warcGzFixture(id: Long, text: String): Array[Byte] = {
    val recs = Seq(
      (Map("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> s"<urn:uuid:info-$id>"),
        WarcInfoPayload.getBytes("UTF-8")),
      (Map("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"http://example.com/doc/$id",
        "WARC-Record-ID" -> s"<urn:uuid:resp-$id>"),
        text.getBytes("UTF-8")))
    recs.map(r => Codecs.gzipBytes(Codecs.encodeWarc(Seq(r))))
      .reduce(_ ++ _)
  }

  /** Charset sniff + decode stage for raw crawl payloads — runs
    * BETWEEN container ingest (WARC payload bytes) and every text
    * operator: BOM dispatch (UTF-8 / UTF-16LE / UTF-16BE), strict
    * RFC 3629 UTF-8 validation (pure 7-bit reported "ascii"),
    * windows-1252 byte fallback for everything else — sniffed, never
    * trusted from headers. One codegen'd kernel call per row inside
    * the scan ([[graft.functions.GraftFunctions.charsetDecode]]);
    * at 100 TB this is projection work, no shuffle. Adds (charset,
    * text_decoded, n_bytes). */
  def decodeTextAuto(df: DataFrame, payload: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("__cd", graft.functions.GraftFunctions.charsetDecode(payload))
      .withColumn("charset", col("__cd.charset"))
      .withColumn("text_decoded", col("__cd.text"))
      .withColumn("n_bytes", col("__cd.n_bytes"))
      .drop("__cd")

  /** [[decodeTextAuto]] with a declared-charset column (HTTP
    * Content-Type / HTML `meta charset` label; `''` = none — use
    * `coalesce(hint, lit(""))` for nullable columns): strong sniff
    * evidence (BOMs, strict UTF-8) still wins, a recognized and
    * strictly-decodable declaration is trusted — the contract that
    * makes the EUC-KR/GBK/Big5 families (structurally ambiguous,
    * ubiquitous on CJK sites) decode correctly instead of collapsing
    * to windows-1252 mojibake — and lying declarations fall back to
    * the structural sniff. Same 100 TB shape: one codegen'd kernel
    * call per row in the scan projection. */
  def decodeTextHint(df: DataFrame, payload: org.apache.spark.sql.Column,
      hint: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("__cd",
        graft.functions.GraftFunctions.charsetDecodeHint(payload, hint))
      .withColumn("charset", col("__cd.charset"))
      .withColumn("text_decoded", col("__cd.text"))
      .withColumn("n_bytes", col("__cd.n_bytes"))
      .drop("__cd")

  /** Deterministic mixed-charset payload fixture for the
    * `ingest_charset_decode` oracle: doc_id%5 selects the encoding of
    * the document text (+ a non-ASCII suffix where the charset can
    * carry it), so the oracle knows the expected charset verdict,
    * decoded text, and byte length in closed form. */
  /** Deterministic sitemap-document fixture for `url_sitemap_entries`:
    * every fifth doc is a `<sitemapindex>` (two child sitemaps, the
    * second with whitespace-padded loc and no lastmod), the rest are
    * `<urlset>`s (two urls, the second with an `&amp;`-escaped query
    * and no lastmod); every third payload is REALLY gzipped — the
    * `.xml.gz` wire format — so the oracle's closed-form restatement
    * proves decompression, tag walk, trim, and entity decode at once. */
  def sitemapFixture(id: Long): Array[Byte] = {
    val lm = s"2026-0${id % 9 + 1}-15"
    val xml =
      if (id % 5 == 0)
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
           |<sitemap><loc>https://s${id % 7}.example/sitemap-a.xml.gz</loc><lastmod>$lm</lastmod></sitemap>
           |<sitemap><loc>  https://s${id % 7}.example/sitemap-b.xml.gz
           |</loc></sitemap>
           |</sitemapindex>""".stripMargin
      else
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
           |<url><loc>https://w${id % 7}.example/p/${id % 11}</loc><lastmod>$lm</lastmod></url>
           |<url>
           |  <loc>https://w${id % 7}.example/p/${id % 11}/sub?a=1&amp;b=2</loc>
           |</url>
           |</urlset>""".stripMargin
    val bytes = xml.getBytes("UTF-8")
    if (id % 3 == 0) Codecs.gzipBytes(bytes) else bytes
  }

  def charsetFixture(id: Long, text: String): Array[Byte] = {
    val accented = text + " café"            // é — cp1252-representable
    val wide = accented + " Ωμέγα" // + Greek Ωμέγα
    (id % 5) match {
      case 0 => text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      case 1 => wide.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case 2 => Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        wide.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case 3 => Array(0xFF.toByte, 0xFE.toByte) ++
        wide.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      case _ => accented.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    }
  }

  /** HTTP/1.x response parse over a payload column — one codegen'd
    * kernel call in the scan projection
    * ([[graft.functions.Kernels.httpResponse]]'s contract: status
    * line, case-insensitive headers, charset hint from the
    * Content-Type parameter or a WHATWG-style `<meta charset>`
    * prescan, gzip Content-Encoding inflated). Keeps the input
    * columns and adds (status, content_type, charset_hint,
    * content_encoding, n_headers, body) — `body`/`charset_hint` feed
    * [[decodeTextHint]] directly, completing the WARC → HTTP →
    * charset → text chain. */
  def parseHttp(df: DataFrame, payload: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("__h", graft.functions.GraftFunctions.httpResponse(payload))
      .withColumn("status", col("__h.status"))
      .withColumn("content_type", col("__h.content_type"))
      .withColumn("charset_hint", col("__h.charset_hint"))
      .withColumn("content_encoding", col("__h.content_encoding"))
      .withColumn("n_headers", col("__h.n_headers"))
      .withColumn("body", col("__h.body"))
      .drop("__h")

  /** Deterministic HTTP-response fixture for `ingest_http_responses`
    * — doc_id%6 selects the response class: utf-8 with a header
    * charset, Shift_JIS declared only by `<meta charset>` (the
    * prescan path), a 404 with case-variant header name and value,
    * a GZIPPED utf-8 body, windows-1252, and a bodyless 301. */
  def httpFixture(id: Long, text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(b.length + 64)
      val out = new java.util.zip.GZIPOutputStream(bos)
      out.write(b); out.close(); bos.toByteArray
    }
    (id % 6) match {
      case 0 =>
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
          "Server: graft-fixture\r\n\r\n").getBytes(utf8) ++
          s"<html><body>$text café Ωμέγα</body></html>".getBytes(utf8)
      case 1 =>
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n".getBytes(utf8) ++
          ("<html><head><meta charset=\"shift_jis\"></head><body>" +
            s"$text 日本語テキスト</body></html>")
            .getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
      case 2 =>
        ("HTTP/1.1 404 Not Found\r\ncontent-TYPE: TEXT/PLAIN\r\n\r\n" +
          s"not found $text").getBytes(utf8)
      case 3 =>
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
          "Content-Encoding: gzip\r\n\r\n").getBytes(utf8) ++
          gz(s"<html><body>$text gzipped café</body></html>".getBytes(utf8))
      case 4 =>
        ("HTTP/1.1 200 OK\r\n" +
          "Content-Type: text/html; charset=windows-1252\r\n\r\n")
          .getBytes(utf8) ++
          s"<html><body>$text café</body></html>"
            .getBytes(java.nio.charset.Charset.forName("windows-1252"))
      case _ =>
        ("HTTP/1.1 301 Moved Permanently\r\nLocation: https://x.example/\r\n" +
          "Content-Type: text/html\r\n\r\n").getBytes(utf8)
    }
  }

  /** Deterministic garbled-text fixture for the `text_mojibake_fix`
    * oracle — doc_id%5 selects the damage class: untouched ASCII,
    * legitimately-accented text the repair must NOT alter, single
    * mojibake (UTF-8 misdecoded as windows-1252), double mojibake
    * (misdecoded text re-published and re-misdecoded), and single
    * mojibake exercising the cp1252 0x80–0x9F punctuation region
    * (curly quote, em dash, euro sign). */
  def mojibakeFixture(id: Long, text: String): String = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    def moji(s: String): String =
      new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), cp1252)
    (id % 5) match {
      case 0 => text
      case 1 => text + " café — naïve ’quote’"
      case 2 => moji(text + " café résumé")
      case 3 => moji(moji(text + " déjà vu"))
      case _ => moji(text + " l’élan — 20€")
    }
  }

  /** Deterministic CJK/declared-charset payload fixture for the
    * `ingest_charset_cjk` oracle — doc_id%8 selects (encoding of the
    * document text + a language-marked suffix, declared hint), so
    * every layer of the hint contract gets a closed-form row: strict
    * UTF-8 overriding a lying Shift_JIS declaration (0), Shift_JIS
    * and EUC-JP found by STRUCTURE with no hint (1, 2), the
    * structurally-ambiguous EUC-KR/GBK/Big5 resolved by (aliased)
    * declarations (3, 4, 5), the web's latin-1→windows-1252 mapping
    * (6), a lying GBK declaration over windows-1252 bytes whose
    * strict decode fails back to the fallback (7), and ISO-2022-JP
    * found by its ESC-shift structure inside an otherwise 7-bit
    * buffer (8). */
  def charsetCjkFixture(id: Long, text: String): (Array[Byte], String) = {
    val jp = " 日本語テキスト"   // 7 two-byte chars in Shift_JIS / EUC-JP
    val kr = " 한국어 텍스트"    // 6 two-byte hangul in EUC-KR
    val zhS = " 中文文本"        // 4 two-byte hanzi in GBK
    val zhT = " 中文測試"        // 4 two-byte hanzi in Big5
    val fr = " café"
    def enc(s: String, cs: String) =
      s.getBytes(java.nio.charset.Charset.forName(cs))
    (id % 9) match {
      case 0 => (enc(text + fr, "UTF-8"), "shift_jis")
      case 1 => (enc(text + jp, "Shift_JIS"), "")
      case 2 => (enc(text + jp, "EUC-JP"), "")
      case 3 => (enc(text + kr, "EUC-KR"), "euc-kr")
      case 4 => (enc(text + zhS, "GBK"), "GB2312")
      case 5 => (enc(text + zhT, "Big5"), "Big5")
      case 6 => (enc(text + fr, "windows-1252"), "latin-1")
      case 7 => (enc(text + fr, "windows-1252"), "gbk")
      case _ => (enc(text + jp, "ISO-2022-JP"), "")
    }
  }
}
