package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the sitemaps.org document parse kernel
  * (`graft.functions.Kernels.sitemapEntries`) — each case isolates
  * one protocol or robustness rule. */
class SitemapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def entries(payload: Array[Byte]): Seq[(String, String, Option[String])] = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("b")
      .select(explode(graft.functions.GraftFunctions.sitemapEntries(col("b"))).as("e"))
      .select("e.kind", "e.loc", "e.lastmod")
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSeq
  }

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("urlset entries parse with optional lastmod") {
    val xml = """<?xml version="1.0"?><urlset>
      <url><loc>https://a.example/1</loc><lastmod>2026-01-02</lastmod></url>
      <url><loc>https://a.example/2</loc></url>
      </urlset>"""
    assert(entries(utf8(xml)) === Seq(
      ("url", "https://a.example/1", Some("2026-01-02")),
      ("url", "https://a.example/2", None)))
  }

  test("sitemapindex children report kind 'sitemap'; the root tag is not an entry") {
    val xml = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>https://a.example/s1.xml.gz</loc></sitemap>
      </sitemapindex>"""
    assert(entries(utf8(xml)) === Seq(
      ("sitemap", "https://a.example/s1.xml.gz", None)))
  }

  test("locs trim whitespace and decode the five XML entities") {
    val xml = "<urlset><url><loc>\n  https://a.example/p?a=1&amp;b=&lt;2&gt;&quot;&apos; \n</loc></url></urlset>"
    assert(entries(utf8(xml)) ===
      Seq(("url", "https://a.example/p?a=1&b=<2>\"'", None)))
  }

  test("gzipped payloads (.xml.gz) decompress transparently") {
    val xml = "<urlset><url><loc>https://gz.example/x</loc></url></urlset>"
    assert(entries(Codecs.gzipBytes(utf8(xml))) ===
      Seq(("url", "https://gz.example/x", None)))
  }

  test("tag case is insensitive; empty locs and loc-less entries drop") {
    val xml = "<URLSET><URL><LOC>https://a.example/U</LOC></URL>" +
      "<url><loc>  </loc></url><url><lastmod>2026-01-01</lastmod></url></URLSET>"
    assert(entries(utf8(xml)) === Seq(("url", "https://a.example/U", None)))
  }

  test("malformed bytes are data: tag soup and truncated gzip yield empty") {
    assert(entries(utf8("<html><body>not a sitemap</body></html>")) === Seq.empty)
    assert(entries(utf8("<urlset><url><loc>https://a.example/x")) === Seq.empty)
    val gz = Codecs.gzipBytes(utf8("<urlset><url><loc>https://a.example/x</loc></url></urlset>"))
    assert(entries(gz.take(gz.length - 6)) === Seq.empty)
  }
}
