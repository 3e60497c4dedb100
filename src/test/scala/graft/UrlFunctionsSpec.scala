package graft

import graft.functions.UrlFunctions
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u"))).head().getString(0)

  test("canonicalization: case, default ports, fragments, tracking, " +
      "param order") {
    assert(canon("HTTP://Example.COM:80/A/b?utm_source=x&b=2&a=1#frag") ==
      "http://example.com/A/b?a=1&b=2")
    assert(canon("https://Example.com:443/") == "https://example.com/")
    // non-default port survives; path case preserved
    assert(canon("https://example.com:8443/Path") ==
      "https://example.com:8443/Path")
    // empty path -> "/"; all-tracking query -> no "?"
    assert(canon("https://example.com?gclid=1&fbclid=2&utm_medium=m") ==
      "https://example.com/")
    // bare utm param without '=' is still tracking; empty params dropped
    assert(canon("http://a.b/p?utm_campaign&&x=1") == "http://a.b/p?x=1")
    // :80 is NOT stripped for https (not the default there)
    assert(canon("https://example.com:80/") == "https://example.com:80/")
  }

  test("identical pages under cosmetic variation share one canonical key") {
    val variants = Seq(
      "http://WWW.News.com/story/42?id=7&utm_source=tw",
      "http://www.news.com:80/story/42?id=7",
      "http://www.news.com/story/42?utm_medium=a&id=7#comments")
    val keys = variants.toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u"))).distinct().count()
    assert(keys == 1L)
  }

  test("registrable domain: plain TLD, two-level suffix, single label") {
    val r = Seq(
      ("a", "www.example.com"),
      ("b", "news.bbc.co.uk"),
      ("c", "sub.deep.example.com.au"),
      ("d", "localhost"),
      ("e", "example.org"))
      .toDF("id", "h")
      .select(col("id"), UrlFunctions.registrableDomain(col("h")).as("d"))
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r("a") == "example.com")
    assert(r("b") == "bbc.co.uk")
    assert(r("c") == "example.com.au")
    assert(r("d") == "localhost")
    assert(r("e") == "example.org")
  }

  test("urlDomain composes; plan is map-only (no Exchange)") {
    val df = Seq("HTTPS://Blog.Example.CO.UK:443/post?a=1").toDF("u")
      .select(UrlFunctions.urlDomain(col("u")).as("d"))
    assert(df.head().getString(0) == "example.co.uk")
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(UrlFunctions.canonicalizeUrl(
        concat(lit("https://"), col("source"), lit(".example.com/d/"),
          col("doc_id"))).as("cu"))
    assert(!docs.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
