package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC walk semantics: roundtrip, the length-delimiting contract
  * (magic bytes inside payloads must not desync), header case
  * tolerance, and the malformed-container quarantine row. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("encode/parse roundtrip preserves types, uris, exact payloads") {
    val bytes = Ingest.warcFixture(7L, "hello warc world")
    val recs = Codecs.parseWarc(bytes).get
    assert(recs.map(_.warcType) === Seq("warcinfo", "response"))
    assert(recs(0).targetUri === null)
    assert(recs(1).targetUri === "http://example.com/doc/7")
    assert(new String(recs(1).payload, "UTF-8") === "hello warc world")
    assert(recs(1).contentLength === 16L)
  }

  test("a payload containing 'WARC/1.0' text never desyncs the walk") {
    val tricky = "fake record: WARC/1.0\r\nContent-Length: 999\r\n\r\nboom"
    val bytes = Codecs.encodeWarc(Seq(
      (Map("WARC-Type" -> "response"), tricky.getBytes("UTF-8")),
      (Map("WARC-Type" -> "metadata"), "after".getBytes("UTF-8"))))
    val recs = Codecs.parseWarc(bytes).get
    assert(recs.size === 2)
    assert(new String(recs(0).payload, "UTF-8") === tricky)
    assert(new String(recs(1).payload, "UTF-8") === "after")
  }

  test("header names are case-insensitive; unknown headers skipped") {
    val raw = ("WARC/1.0\r\nwarc-type: response\r\nX-Custom: y\r\n" +
      "WARC-TARGET-URI: http://x/\r\ncontent-length: 2\r\n\r\nok\r\n\r\n")
      .getBytes("UTF-8")
    val recs = Codecs.parseWarc(raw).get
    assert(recs.head.warcType === "response")
    assert(recs.head.targetUri === "http://x/")
    assert(new String(recs.head.payload, "UTF-8") === "ok")
  }

  test("truncated containers quarantine as rec_idx -1, never throw") {
    val good = Ingest.warcFixture(1L, "alpha")
    val bad = good.dropRight(9)
    assert(Codecs.parseWarc(bad) === None)
    val df = Seq((1L, good), (2L, bad)).toDF("doc_id", "warc")
    val out = Ingest.warcRecords(df)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.count(_._1 == 1L) === 2)
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, -1, "malformed")))
  }

  test("empty payload records parse cleanly") {
    val bytes = Codecs.encodeWarc(Seq(
      (Map("WARC-Type" -> "response"), Array.empty[Byte])))
    val recs = Codecs.parseWarc(bytes).get
    assert(recs.head.contentLength === 0L && recs.head.payload.isEmpty)
  }

  test(".warc.gz: multi-member gzip containers decode to identical records") {
    val gz = Ingest.warcGzFixture(9L, "hello gz world")
    assert(Codecs.isGzip(gz))
    // the fixture really is TWO gzip members (one per record)
    var members = 0
    for (i <- 0 until gz.length - 1)
      if ((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b) members += 1
    assert(members >= 2, s"expected per-record members, found $members")
    val plainRecs = Codecs.parseWarc(Ingest.warcFixture(9L, "hello gz world")).get
    val df = Seq((9L, gz)).toDF("doc_id", "warc")
    val out = Ingest.warcRecords(df).collect()
    assert(out.length === 2)
    for ((r, exp) <- out.zip(plainRecs)) {
      assert(r.getString(2) === exp.warcType)
      assert(r.getLong(4) === exp.contentLength)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](5), exp.payload))
    }
  }

  test("corrupt gzip containers quarantine as malformed, never throw") {
    val gz = Ingest.warcGzFixture(3L, "text")
    // truncate inside the final member: the ISIZE/CRC trailer is gone,
    // so GZIPInputStream must throw (caught → quarantine row)
    val bad = gz.dropRight(6)
    val df = Seq((3L, bad)).toDF("doc_id", "warc")
    val out = Ingest.warcRecords(df)
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(out === Seq((-1, "malformed")))
  }
}
