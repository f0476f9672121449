package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the first stage of every
  * crawl-corpus curation pipeline (the same fetched page typically
  * appears under dozens of raw spellings: scheme/host case, default
  * ports, tracking params, fragments, userinfo, trailing slashes).
  *
  * Everything here is a composition of built-in string/array
  * expressions (regexp_extract / regexp_replace / split / filter /
  * array_sort / concat): whole-stage-codegen'd, no UDFs, and restatable
  * verbatim in the DuckDB oracle. At 100 TB the canonical key is
  * computed in the scan projection and the dedup is one hash
  * aggregation on it — the cheapest possible shape.
  *
  * Deliberate scope choices (documented, not hidden):
  *   - percent-encoding is NOT decoded (decoding %2F etc. can change
  *     path semantics; safe canonicalizers leave it);
  *   - "www." is kept (stripping it merges distinct hosts);
  *   - the registered-domain split uses a small embedded multi-part
  *     suffix list, not the full public-suffix registry (no egress in
  *     this environment); the hook is one set to extend.
  */
object Urls {

  /** Query parameters dropped during canonicalization: click/campaign
    * trackers that never change the fetched content. */
  val TrackingParamRe = "^(utm_[A-Za-z]+|gclid|fbclid|msclkid|ref|ref_src)="

  /** Multi-part public suffixes the registered-domain split must keep
    * three labels for ("bbc.co.uk", not "co.uk"). */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.ar", "com.tr")

  /** Canonical form of a raw URL:
    * scheme+host lowercased (schemeless input assumed http), userinfo
    * and fragment dropped, trailing host dot and default ports (http
    * :80 / https :443) stripped, path ""/trailing-slash normalised to
    * "/" / slash-stripped, query params sorted with tracking params
    * removed. Pure built-in expressions end to end. */
  def canonicalize(u: Column): Column = {
    val t = trim(u)
    val noFrag = regexp_replace(t, "#.*", "")
    val scheme0 = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val scheme = when(scheme0 === "", "http").otherwise(scheme0)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://", "")
    val hostport = regexp_replace(regexp_extract(rest, "^([^/?]*)", 1), "^.*@", "")
    val host = regexp_replace(lower(regexp_extract(hostport, "^([^:]*)", 1)), "\\.$", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portSuffix = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val path0 = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val path = when(path0 === "", "/").otherwise(path0)
    val query = regexp_extract(pathq, "\\?(.*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val qcanon = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, portSuffix, path,
      when(qcanon === "", lit("")).otherwise(concat(lit("?"), qcanon)))
  }

  /** Lowercased host of a raw URL (same parse as [[canonicalize]]). */
  def hostOf(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*", "")
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://", "")
    val hostport = regexp_replace(regexp_extract(rest, "^([^/?]*)", 1), "^.*@", "")
    regexp_replace(lower(regexp_extract(hostport, "^([^:]*)", 1)), "\\.$", "")
  }

  /** Registered domain of a host: the last two labels, or three when
    * the two-label tail is a known multi-part suffix (co.uk, com.au,
    * …). Hosts with fewer labels pass through unchanged. */
  def registeredDomain(host: Column): Column = {
    val two = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val three = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(two.isin(MultiPartSuffixes: _*) && three =!= "", three)
      .otherwise(when(two === "", host).otherwise(two))
  }

  /** URL-level dedup: group raw URLs by canonical form, keep the
    * lowest id (first fetch wins under a monotone fetch id), count the
    * raw spellings merged. One hash aggregation on the canonical key —
    * fully distributed, no skew risk beyond genuinely hot pages. */
  def dedupByCanonical(df: DataFrame, url: Column, id: Column): DataFrame =
    df.select(canonicalize(url).as("url_canonical"), id.as("doc_id"),
        url.as("__raw"))
      .groupBy("url_canonical")
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_raw"),
        countDistinct(col("__raw")).as("n_spellings"))
}
