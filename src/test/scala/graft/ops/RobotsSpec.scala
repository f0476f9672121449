package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the robots.txt parse kernel and the RFC 9309 evaluation
  * rules — each case isolates one grammar or matching rule. */
class RobotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rules(txt: String, agent: String): Seq[(String, Boolean)] = {
    import spark.implicits._
    Seq(txt).toDF("t")
      .select(explode(graft.functions.GraftFunctions.robotsRules(col("t"), agent)).as("r"))
      .select("r.pattern", "r.allow")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
  }

  private def delay(txt: String, agent: String = "graftbot"): Option[Double] = {
    import spark.implicits._
    val robots = Seq(("H.Example", txt)).toDF("host", "txt")
    val row = Urls.crawlDelay(robots, col("host"), col("txt"), agent)
      .collect().head
    assert(row.getString(0) === "h.example") // host key lowercases
    if (row.isNullAt(1)) None else Some(row.getDouble(1))
  }

  private def verdict(robotsTxt: String, path: String,
      agent: String = "graftbot"): Boolean = {
    import spark.implicits._
    val urls = Seq((1L, s"http://h.example$path")).toDF("doc_id", "url")
    val robots = Seq(("h.example", robotsTxt)).toDF("host", "txt")
    Urls.robotsVerdicts(urls, col("url"), col("doc_id"), robots,
      col("host"), col("txt"), agent)
      .collect().head.getAs[Boolean]("allowed")
  }

  test("named group shadows the star group; case-insensitive agent") {
    val txt = "User-agent: GraftBot\nDisallow: /a\n\nUser-agent: *\nDisallow: /\n"
    assert(rules(txt, "graftbot") === Seq(("/a", false)))
    assert(rules(txt, "otherbot") === Seq(("/", false)))
  }

  test("a trailing named group with zero rules means allow-all, not star fallback") {
    val txt = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\n"
    assert(rules(txt, "graftbot") === Seq.empty)
    assert(verdict(txt, "/anything") === true)
  }

  test("user-agent lines stack into one group even across blank lines (RFC 9309)") {
    // blanks are insignificant: with no rule between them, graftbot
    // and * name the SAME group, so its rules bind graftbot too
    val txt = "User-agent: graftbot\n\nUser-agent: *\nDisallow: /\n"
    assert(rules(txt, "graftbot") === Seq(("/", false)))
  }

  test("consecutive User-agent lines share one group; comments strip") {
    val txt = "User-agent: a # primary\nUser-agent: b\nDisallow: /x\n"
    assert(rules(txt, "a") === Seq(("/x", false)))
    assert(rules(txt, "b") === Seq(("/x", false)))
  }

  test("rules before any User-agent line are ignored; empty values drop") {
    val txt = "Disallow: /orphan\nUser-agent: *\nDisallow:\nAllow: /ok\n"
    assert(rules(txt, "any") === Seq(("/ok", true)))
  }

  test("multiple groups naming the agent merge their rules") {
    val txt = "User-agent: g\nDisallow: /a\n\nUser-agent: g\nAllow: /a/b\n"
    assert(rules(txt, "g") === Seq(("/a", false), ("/a/b", true)))
  }

  test("longest match wins; Allow wins exact-length ties") {
    val txt = "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
    assert(verdict(txt, "/p/doc") === false)
    assert(verdict(txt, "/p/ok/doc") === true)
    val tie = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    assert(verdict(tie, "/dir/x") === true)
  }

  test("'*' wildcard rules match per RFC 9309 §2.2.3") {
    val txt = "User-agent: *\nDisallow: /*?sid=\nDisallow: /private*/x\n"
    assert(verdict(txt, "/page?sid=5") === false)   // query is matched
    assert(verdict(txt, "/a/b/c?sid=2&x=1") === false)
    assert(verdict(txt, "/page?id=5") === true)
    // '?sid=' is literal: an '&sid=' param does NOT match this rule
    assert(verdict(txt, "/a/b?x=1&sid=2") === true)
    assert(verdict(txt, "/private123/x") === false)
    assert(verdict(txt, "/private123/y") === true)
  }

  test("'$' anchors a rule at the path end; wildcard + anchor compose") {
    val txt = "User-agent: *\nDisallow: /dl$\nDisallow: /*.pdf$\n"
    assert(verdict(txt, "/dl") === false)
    assert(verdict(txt, "/dl/x") === true)          // anchor fails open
    assert(verdict(txt, "/docs/a.pdf") === false)
    assert(verdict(txt, "/docs/a.pdfx") === true)
  }

  test("a more-specific wildcard Allow overrides a shorter Disallow") {
    val txt = "User-agent: *\nDisallow: /p/\nAllow: /p/*.html$\n"
    assert(verdict(txt, "/p/a.html") === true)      // rank 10 > 3
    assert(verdict(txt, "/p/a.htm") === false)
  }

  test("rule and path compare in canonical percent-encoding") {
    // literal space in the rule vs %20 in the URL — and vice versa
    assert(verdict("User-agent: *\nDisallow: /a b\n", "/a%20b") === false)
    assert(verdict("User-agent: *\nDisallow: /a%20b\n", "/a b") === false)
    // hex case insensitive; unreserved escapes decode on both sides
    assert(verdict("User-agent: *\nDisallow: /x%2fy\n", "/x%2Fy") === false)
    assert(verdict("User-agent: *\nDisallow: /caf%C3%A9\n", "/café") === false)
    assert(verdict("User-agent: *\nDisallow: /%7Euser\n", "/~user") === false)
    // LIKE metacharacters in a path are literals, not wildcards
    assert(verdict("User-agent: *\nDisallow: /a_b\n", "/axb") === true)
    assert(verdict("User-agent: *\nDisallow: /a_b\n", "/a_b") === false)
  }

  test("crawl-delay: last valid value wins within the applicable group") {
    val txt = "User-agent: graftbot\nCrawl-delay: 1.5\nDisallow: /x\n" +
      "Crawl-delay: 2.5\n\nUser-agent: *\nCrawl-delay: 10\n"
    assert(delay(txt) === Some(2.5))
  }

  test("crawl-delay: invalid values skip; star fallback; absent → None") {
    assert(delay("User-agent: *\nCrawl-delay: fast\ncrawl-delay: 0.5\n")
      === Some(0.5))
    // a named group WITHOUT a delay shadows the star group's delay
    assert(delay("User-agent: graftbot\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 7\n") === None)
    assert(delay("User-agent: *\nDisallow: /x\n") === None)
    assert(delay("User-agent: *\nCrawl-delay: -3\n") === None)
  }

  test("no matching rule, or no robots entry for the host, allows") {
    assert(verdict("User-agent: *\nDisallow: /private\n", "/public") === true)
    import spark.implicits._
    val urls = Seq((1L, "http://nobody.example/x")).toDF("doc_id", "url")
    val robots = Seq(("h.example", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "txt")
    val got = Urls.robotsVerdicts(urls, col("url"), col("doc_id"), robots,
      col("host"), col("txt"), "g").collect().head.getAs[Boolean]("allowed")
    assert(got === true)
  }

  test("map-side gate agrees with the max_by gate on the wildcard matrix") {
    import spark.implicits._
    // every rule mechanic at once: mid-rule wildcard, anchored
    // wildcard Allow out-ranking a directory Disallow, bare-$ rule,
    // percent-encoded rules, a no-robots host, and a no-match path
    val robots = Seq(
      ("w.example", "User-agent: *\nDisallow: /*?sid=\nAllow: /p/*.html$\n" +
        "Disallow: /p/\nDisallow: /dl$\n"),
      ("x.example", "User-agent: *\nDisallow: /a b\nDisallow: /caf%c3%a9\n"))
      .toDF("host", "txt")
    val urls = Seq(
      "https://w.example/p/x.html", "https://w.example/p/x.htmlz",
      "https://w.example/q?sid=5", "https://w.example/dl",
      "https://w.example/dl/x", "https://w.example/free",
      "https://x.example/a%20b", "https://x.example/café",
      "https://x.example/plain", "https://norobots.example/y")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        String) => org.apache.spark.sql.DataFrame): Seq[(Long, Boolean)] =
      f(urls, col("url"), col("doc_id"), robots, col("host"), col("txt"),
        "graftbot")
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getAs[Boolean]("allowed"))).toSeq
    val agg = run(Urls.robotsVerdicts)
    val map = run(Urls.robotsVerdictsMapSide)
    assert(map === agg)
    assert(agg.map(_._2) === Seq(true, false, false, false, true, true,
      false, false, true, true))
  }

  test("map-side gate agrees with the max_by gate on duplicate host rows") {
    import spark.implicits._
    // two robots rows for the same host (e.g. re-fetched robots.txt):
    // the gates must merge BOTH rows' rules into one verdict per URL
    // — one row per URL out, never a join fan-out — with the second
    // row's more-specific Allow out-ranking the first row's Disallow
    val robots = Seq(
      ("d.example", "User-agent: *\nDisallow: /p/\n"),
      ("d.example", "User-agent: *\nAllow: /p/ok.html\n"))
      .toDF("host", "txt")
    val urls = Seq(
      "https://d.example/p/ok.html", "https://d.example/p/no.html",
      "https://d.example/free")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        String) => org.apache.spark.sql.DataFrame): Seq[(Long, Boolean)] =
      f(urls, col("url"), col("doc_id"), robots, col("host"), col("txt"),
        "graftbot")
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getAs[Boolean]("allowed"))).toSeq
    val agg = run(Urls.robotsVerdicts)
    val map = run(Urls.robotsVerdictsMapSide)
    assert(map.map(_._1) === Seq(0L, 1L, 2L)) // no fan-out: 3 URLs, 3 rows
    assert(map === agg)
    assert(agg.map(_._2) === Seq(true, false, true))
  }
}
