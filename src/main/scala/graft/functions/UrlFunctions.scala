package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for dedup keys and per-domain governance — the
  * normalization pass that makes `capPerGroup`-style domain ceilings and
  * exact-URL dedup meaningful on crawled corpora, where the same page
  * arrives as `HTTP://Example.com:80/a?utm_source=x#top` and
  * `http://example.com/a`.
  *
  * Everything here is codegen'd built-ins over strings (regexp_extract /
  * split / filter / array_sort) — map-only at 100 TB, no UDF, and every
  * rule replays in DuckDB SQL (q134).
  *
  * Normalization scope (documented contract, not exhaustive RFC 3986):
  * lowercase scheme and host, drop the default port (:80 http, :443
  * https), drop the fragment, empty path → "/", drop tracking params
  * (utm_*, gclid, fbclid, msclkid), sort surviving query params by
  * byte order. Percent-encoding normalization and IDN are out of scope.
  */
object UrlFunctions {

  /** Query-param names stripped during canonicalization. */
  val trackingParamPattern = "^(utm_[^=]*|gclid|fbclid|msclkid)(=|$)"

  /** Canonical form of an absolute http(s)-style URL (see object doc for
    * the rule set). Non-URL strings come back best-effort (no throw). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPath = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^?]*)", 1)
    val rawQuery = regexp_extract(noFrag, "\\?(.*)$", 1)
    val hostPort = lower(regexp_extract(hostPath, "^([^/]*)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(hostPath, "^[^/]*(/.*)?$", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val params = filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Host part of the canonical URL (lowercased, default port dropped). */
  def urlHost(url: Column): Column =
    regexp_extract(canonicalizeUrl(url), "^[a-z0-9+.-]*://([^/]*)", 1)

  /** Multi-label public suffixes recognized by [[registrableDomain]] —
    * the high-traffic subset; a production crawl would load the full
    * Mozilla public-suffix list as a broadcast lookup instead. */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "co.nz", "co.in", "com.br", "com.cn", "com.mx", "co.za")

  /** Registrable domain ("example.co.uk" / "example.com") of a host —
    * the grouping key for per-domain caps and mixing weights. Hosts with
    * a single label (localhost, bare IP-ish strings) pass through. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = when(n >= 2,
      concat(element_at(labels, -2), lit("."), element_at(labels, -1)))
    when(n <= 1, host)
      .when(n >= 3 && lastTwo.isin(twoLevelSuffixes: _*),
        concat(element_at(labels, -3), lit("."), lastTwo))
      .otherwise(lastTwo)
  }

  /** Registrable domain straight from a URL. */
  def urlDomain(url: Column): Column = registrableDomain(urlHost(url))
}
