package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the URL canonicalization chain — each case isolates
  * one normalization rule so a regression names its own culprit. */
class UrlsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(raw: String*): Seq[String] = {
    import spark.implicits._
    raw.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTP://ExAmPle.COM/Path/File") ===
      Seq("http://example.com/Path/File"))
  }

  test("default ports stripped, non-default kept") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x", "http://a.com:8080/x") ===
      Seq("http://a.com/x", "https://a.com/x", "http://a.com:8080/x"))
  }

  test("fragment and userinfo dropped") {
    assert(canon("http://user:pw@a.com/x#frag") === Seq("http://a.com/x"))
  }

  test("empty path and trailing slashes normalise") {
    assert(canon("http://a.com", "http://a.com/", "http://a.com/x/", "http://a.com/x//") ===
      Seq("http://a.com/", "http://a.com/", "http://a.com/x", "http://a.com/x"))
  }

  test("schemeless input assumed http; trailing host dot stripped") {
    assert(canon("a.com/x", "http://a.com./x") ===
      Seq("http://a.com/x", "http://a.com/x"))
  }

  test("tracking params dropped, survivors sorted, bare ? vanishes") {
    assert(canon(
      "http://a.com/x?utm_source=f&b=2&a=1",
      "http://a.com/x?a=1&b=2",
      "http://a.com/x?utm_campaign=c&gclid=g&fbclid=f",
      "http://a.com/x?") ===
      Seq("http://a.com/x?a=1&b=2", "http://a.com/x?a=1&b=2",
        "http://a.com/x", "http://a.com/x"))
  }

  test("valueless tracking params dropped; ref-prefixed real params kept") {
    assert(canon(
      "http://a.com/x?utm_source&b=2",
      "http://a.com/x?gclid",
      "http://a.com/x?refresh=1&ref=sidebar") ===
      Seq("http://a.com/x?b=2", "http://a.com/x",
        "http://a.com/x?refresh=1"))
  }

  test("registeredDomain honours multi-part suffixes") {
    import spark.implicits._
    val got = Seq("www.news.bbc.co.uk", "a.b.example.com", "example.com",
        "localhost", "shop.site.com.au")
      .toDF("h").select(Urls.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("bbc.co.uk", "example.com", "example.com",
      "localhost", "site.com.au"))
  }

  test("registeredDomain: exotic two-label and three-label suffixes") {
    import spark.implicits._
    val got = Seq(
      "shop.acme.com.sg", "acme.co.nz", "news.site.com.hk",
      "myschool.k12.ca.us", "www.myschool.k12.ca.us",
      "stjohns.vic.edu.au", "portal.stjohns.vic.edu.au",
      "k12.ca.us")
      .toDF("h").select(Urls.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq(
      "acme.com.sg", "acme.co.nz", "site.com.hk",
      "myschool.k12.ca.us", "myschool.k12.ca.us",
      "stjohns.vic.edu.au", "stjohns.vic.edu.au",
      // a host that IS a bare 3-label suffix falls back to the
      // 2-label rule: ca.us is itself a suffix, so keep 3 labels
      "k12.ca.us"))
  }

  test("registeredDomain: PSL wildcard rules push the boundary one label deeper") {
    import spark.implicits._
    val got = Seq(
      "www.shop.foo.ck",    // *.ck: foo.ck is a suffix → shop.foo.ck
      "shop.foo.ck", "foo.ck", "ck",
      "www.example.com.np", // *.np agrees with the explicit com.np rule
      "ward.nakahara.kawasaki.jp", "nakahara.kawasaki.jp")
      .toDF("h").select(Urls.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq(
      "shop.foo.ck", "shop.foo.ck",
      // bare wildcard suffixes pass through as themselves
      "foo.ck", "ck",
      "example.com.np",
      "ward.nakahara.kawasaki.jp", "nakahara.kawasaki.jp"))
  }

  test("registeredDomain: exception rules override their wildcard") {
    import spark.implicits._
    val got = Seq("www.ck", "pages.www.ck", "a.b.www.ck",
        "city.kawasaki.jp", "www.city.kawasaki.jp")
      .toDF("h").select(Urls.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("www.ck", "www.ck", "www.ck",
      "city.kawasaki.jp", "city.kawasaki.jp"))
  }

  test("registeredDomain kernel agrees with the Column formulation") {
    import spark.implicits._
    // every suffix class above plus the degenerate shapes the two
    // formulations could diverge on (no dots, empty labels, bare
    // suffixes, deep hosts)
    val hosts = Seq(
      "www.news.bbc.co.uk", "a.b.example.com", "example.com", "localhost",
      "shop.site.com.au", "myschool.k12.ca.us", "k12.ca.us", "ca.us",
      "stjohns.vic.edu.au", "www.shop.foo.ck", "foo.ck", "ck",
      "www.example.com.np", "ward.nakahara.kawasaki.jp", "kawasaki.jp",
      "www.ck", "a.b.www.ck", "city.kawasaki.jp", "www.city.kawasaki.jp",
      "", "com", "a..b.com", "b.com.", "site0.example")
    val df = hosts.toDF("h")
    val got = df.select(
        Urls.registeredDomain(col("h")).as("k"),
        Urls.registeredDomainColumns(col("h"), Urls.MultiPartSuffixes,
          Urls.ThreePartSuffixes, Urls.WildcardSuffixBases,
          Urls.SuffixExceptions).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    for (((k, c), h) <- got.zip(hosts)) assert(k === c, s"host=$h")
  }

  test("dedupByCanonical merges spellings and keeps the first id") {
    import spark.implicits._
    val d = Seq(
      (1L, "http://A.com/x/"), (2L, "http://a.com:80/x"),
      (3L, "a.com/x#top"), (4L, "http://a.com/y"))
      .toDF("doc_id", "url")
    val got = Urls.dedupByCanonical(d, col("url"), col("doc_id"))
      .orderBy("url_canonical")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      ("http://a.com/x", 1L, 3L, 3L),
      ("http://a.com/y", 4L, 1L, 1L)))
  }
}
