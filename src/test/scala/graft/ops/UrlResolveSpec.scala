package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

/** Pins for RFC 3986 relative-reference resolution and href
  * extraction: the kernel against the spec's own §5.4 test vectors,
  * the kernel against the bounded-pass Column formulation
  * ([[Urls.resolveRef]]) across every reference class the fixture
  * carries, and the extraction/unescape/drop rules one case each. */
class UrlResolveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- RFC 3986 §5.4 examples (base http://a/b/c/d;p?q). Fragments
  // are dropped by scope (canonicalize drops them), so the expected
  // values here are the RFC's with any '#...' tail removed.
  private val base = "http://a/b/c/d;p?q"
  private val rfcNormal = Seq(
    "g:h" -> "g:h",
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    "#s" -> "http://a/b/c/d;p?q",
    "g#s" -> "http://a/b/c/g",
    "g?y#s" -> "http://a/b/c/g?y",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "g;x?y#s" -> "http://a/b/c/g;x?y",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g")
  private val rfcAbnormal = Seq(
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
    "g?y/./x" -> "http://a/b/c/g?y/./x",
    "g?y/../x" -> "http://a/b/c/g?y/../x")

  test("kernel passes RFC 3986 §5.4.1 normal examples") {
    for ((ref, want) <- rfcNormal)
      assert(Kernels.resolveRefStr(base, ref) === want, s"ref=$ref")
  }

  test("kernel passes RFC 3986 §5.4.2 abnormal examples") {
    for ((ref, want) <- rfcAbnormal)
      assert(Kernels.resolveRefStr(base, ref) === want, s"ref=$ref")
  }

  test("Column formulation agrees with the kernel on every RFC vector") {
    import spark.implicits._
    val refs = (rfcNormal ++ rfcAbnormal).map(_._1)
    val got = refs.map(r => (base, r)).toDF("base", "ref")
      .select(Urls.resolveRef(col("base"), col("ref")).as("r"))
      .collect().map(_.getString(0)).toSeq
    val want = refs.map(Kernels.resolveRefStr(base, _))
    assert(got === want)
  }

  test("Column formulation agrees with the kernel on the fixture classes") {
    import spark.implicits._
    val b = "https://site2.example/a/b/page7.html"
    val refs = Seq(
      "https://ext1.example/abs/7", "//cdn.example/lib/3",
      "/root/item?id=7&utm_source=feed", "../up/4", "./same/2",
      "plain/rel1", "HTTPS://EXT1.EXAMPLE/UP", "?page=7", "#frag",
      "../../../deep/7", "/squote/5", " padded/ws ")
    val got = refs.map(r => (b, r)).toDF("base", "ref")
      .select(Urls.resolveRef(col("base"), col("ref")).as("r"))
      .collect().map(_.getString(0)).toSeq
    val want = refs.map(Kernels.resolveRefStr(b, _))
    assert(got === want)
  }

  test("remove_dot_segments is exact at depth beyond the Column bound") {
    // six levels of nesting — the bounded-pass twin is documented to
    // fold at most `depth` pair levels; the kernel must stay exact
    assert(Kernels.removeDotSegmentsStr(
      "/a/b/c/d/e/f/../../../../../../g") === "/g")
    assert(Kernels.resolveRefStr("http://h/x/y", "../../../../../../g")
      === "http://h/g")
  }

  test("extractHrefs: order, quoting, unescape, and drop rules") {
    import spark.implicits._
    val html = "<html><body>" +
      "<a href=\"/one?a=1&amp;b=2\">1</a>" +
      "<a id='k' href=\"  /two  \">2</a>" +
      "<a href=\"mailto:x@y.example\">m</a>" +
      "<a href=\"JavaScript:void(0)\">j</a>" +
      "<a href=\"\">empty</a>" +
      "<a href='/single'>s</a>" +
      "</body></html>"
    val got = Seq(html).toDF("h")
      .select(Urls.extractHrefs(col("h")).as("links"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("/one?a=1&b=2", "/two", "/single"))
  }

  test("pageLinks resolves each anchor against the page base") {
    import spark.implicits._
    val df = Seq((1L, "https://s.example/a/b/p.html",
      "<a href=\"../x\">x</a><a href=\"//c.example/y\">y</a>"))
      .toDF("id", "url", "html")
    val got = Urls.pageLinks(df, col("id"), col("url"), col("html"))
      .orderBy("ord").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(got === Seq(
      (0, "../x", "https://s.example/a/x"),
      (1, "//c.example/y", "https://c.example/y")))
  }

  test("domainLinkGraph drops internal edges and lowercases hosts") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://s.example/p",
        "<a href=\"/internal\">i</a><a href=\"HTTPS://EXT.EXAMPLE/x\">e</a>"),
      (2L, "https://s.example/q",
        "<a href=\"https://ext.example/y\">e</a>"))
      .toDF("id", "url", "html")
    val got = Urls.domainLinkGraph(df, col("id"), col("url"), col("html"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("s.example", "ext.example", 2L, 2L)))
  }

  test("crawlSchedule spaces per-host slots by the effective delay") {
    import spark.implicits._
    val frontier = Seq("https://h1.example/b", "https://h1.example/a",
      "https://h2.example/a").toDF("url")
    val robots = Seq(("h1.example", "User-agent: *\nCrawl-delay: 2.5\n"))
      .toDF("host", "robots_txt")
    val got = Urls.crawlSchedule(frontier, col("url"), robots,
        col("host"), col("robots_txt"), "graftbot")
      .orderBy("host", "url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(3),
        r.getDouble(4))).toSeq
    // h1 declares 2.5s; h2 has no robots row → 1.0s default
    assert(got === Seq(
      ("h1.example", "https://h1.example/a", 0, 0.0),
      ("h1.example", "https://h1.example/b", 1, 2.5),
      ("h2.example", "https://h2.example/a", 0, 0.0)))
  }

  test("SQL registration graft_resolve_ref matches the Column API") {
    val s = spark
    graft.GraftExtensions.register(s)
    val got = s.sql(
      "SELECT graft_resolve_ref('http://a/b/c/d;p?q', '../g') AS r")
      .collect().head.getString(0)
    assert(got === "http://a/b/g")
  }
}
