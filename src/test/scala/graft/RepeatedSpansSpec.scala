package graft

import graft.operators.RepeatedSpans
import org.apache.spark.sql.functions._

class RepeatedSpansSpec extends SparkTestBase {
  import spark.implicits._

  // Corpus with a known shared 3-gram span: docs 1 and 2 both contain
  // "shared boiler plate" (and 2 extends it to 4 shared tokens); doc 3 is
  // all-unique; doc 4 is too short for any 3-gram.
  private def corpus = Seq(
    (1L, "alpha shared boiler plate omega unique1"),
    (2L, "beta shared boiler plate text gamma"),
    (3L, "entirely fresh words never repeated anywhere else"),
    (4L, "too short")).toDF("doc_id", "text")

  test("positionalGrams: positions 0-based, short docs emit nothing") {
    val g = RepeatedSpans.positionalGrams(corpus, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(!g.exists(_._1 == 4L)) // 2 tokens < k
    assert(g.count(_._1 == 1L) == 4) // 6 tokens -> 4 trigrams
    assert(g.contains((1L, 1, "shared boiler plate")))
    assert(g.contains((2L, 1, "shared boiler plate")))
  }

  test("dupStats: hand-computed counts, ratio, merged coverage") {
    val s = RepeatedSpans.dupStats(corpus, "doc_id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    // doc1: grams at pos 0..3; only "shared boiler plate" (pos 1) is
    // shared -> 1/4 dup, covering tokens 1..3 = 3 tokens.
    assert(s(1L) == ((4L, 1L, 0.25, 3L)))
    // doc2 same single shared gram at pos 1 of 4 grams.
    assert(s(2L) == ((4L, 1L, 0.25, 3L)))
    // doc3: nothing shared.
    assert(s(3L) == ((5L, 0L, 0.0, 0L)))
    // doc4: absent (shorter than k).
    assert(!s.contains(4L))
  }

  test("covered_tokens merges overlapping spans, not double-counting") {
    // Both docs share the SAME 5-token run "a b c d e": doc 1 has 3
    // overlapping shared trigrams at pos 0,1,2 -> merged coverage is 5
    // tokens, not 9.
    val df = Seq(
      (1L, "a b c d e tail1"),
      (2L, "a b c d e tail2"),
      // disjoint second shared span in doc 3/4 to test multi-interval
      (3L, "a b c x y z p q r s"),
      (4L, "p q r s x1 x2 a b c")).toDF("doc_id", "text")
    val s = RepeatedSpans.dupStats(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(s(1L) == 5L)
    assert(s(2L) == 5L)
    // doc3: "a b c" at pos 0 (3 tokens) + "p q r"/"q r s" at pos 6,7
    // merge to 4 tokens -> 7 total.
    assert(s(3L) == 7L)
    // doc4: "p q r s" spans pos 0,1 merge to 4 + "a b c" at pos 6 -> 7.
    assert(s(4L) == 7L)
  }

  test("hashed and exact-string key arms agree on real data") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val hashed = RepeatedSpans.dupStats(docs, "doc_id", "text",
      k = 6, hashKeys = true).orderBy("doc_id").collect().toSeq
    val exact = RepeatedSpans.dupStats(docs, "doc_id", "text",
      k = 6, hashKeys = false).orderBy("doc_id").collect().toSeq
    assert(hashed == exact)
    assert(hashed.nonEmpty)
  }

  test("fused positional grams equal the declarative HOF construction") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val fused = RepeatedSpans.positionalGrams(docs, "doc_id", "text", 4)
      .orderBy("doc_id", "__pos").collect().toSeq
    val tk = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val gramArr = when(size(tk) >= 4,
      transform(sequence(lit(1), size(tk) - lit(3)),
        i => array_join(slice(tk, i, lit(4)), " ")))
      .otherwise(array().cast("array<string>"))
    val declarative = docs.select(col("doc_id"),
        posexplode(gramArr).as(Seq("__pos", "__g")))
      .orderBy("doc_id", "__pos").collect().toSeq
    assert(fused == declarative)
    assert(fused.nonEmpty)
  }

  test("incremental stats over a persisted gram index equal the " +
      "full-corpus run restricted to the batch") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val idx = RepeatedSpans.gramIndex(old, "doc_id", "text", k = 6)
    val inc = RepeatedSpans.incrementalDupStats(batch, idx,
        "doc_id", "text", k = 6).orderBy("doc_id").collect().toSeq
    val fullForBatch = RepeatedSpans.dupStats(docs, "doc_id", "text", k = 6)
      .filter(col("doc_id") % 5 === 0).orderBy("doc_id").collect().toSeq
    assert(inc == fullForBatch)
    assert(inc.nonEmpty)
    // merged index equals the from-scratch full-corpus index
    val merged = RepeatedSpans.mergeGramIndex(idx, batch, "doc_id", "text",
        k = 6).orderBy("__key").collect().toSeq
    val full = RepeatedSpans.gramIndex(docs, "doc_id", "text", k = 6)
      .orderBy("__key").collect().toSeq
    assert(merged == full)
  }

  test("clean drops exactly the docs above the dup-ratio cutoff") {
    val kept = RepeatedSpans.clean(corpus, "doc_id", "text",
      k = 3, maxDupRatio = 0.2).select("doc_id").as[Long].collect().toSet
    // docs 1,2 have ratio 0.25 > 0.2 -> dropped; 3 (0.0) and 4 (no row,
    // nothing to flag) stay.
    assert(kept == Set(3L, 4L))
  }

  test("excise cuts the span from NON-owners only, keeps every doc") {
    val out = RepeatedSpans.excise(corpus, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 owns "shared boiler plate" (lowest id) -> untouched
    assert(out(1L) === (("alpha shared boiler plate omega unique1",
      6L, 0L)))
    // doc 2 loses the 3-token window at pos 1, keeps the rest in order
    assert(out(2L) === (("beta text gamma", 6L, 3L)))
    // unique and too-short docs pass through whole
    assert(out(3L)._3 === 0L)
    assert(out(4L) === (("too short", 2L, 0L)))
    assert(out.size === 4) // no document row is lost
  }

  test("excise: overlapping flagged spans merge (no double-cutting)") {
    // docs share a 4-token run -> NON-owner has flagged positions 0 and
    // 1 whose [p, p+3) windows overlap; union = tokens 0..3, not 6
    val d = Seq(
      (1L, "one two three four alpha"),
      (2L, "one two three four beta")).toDF("doc_id", "text")
    val out = RepeatedSpans.excise(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(3)))).toMap
    assert(out(1L) === (("one two three four alpha", 0L)))
    assert(out(2L) === (("beta", 4L)))
  }

  test("excise: hashed and exact-string key arms agree on real data") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(150)
    def run(h: Boolean) =
      RepeatedSpans.excise(docs, "doc_id", "text", k = 6, hashKeys = h)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val a = run(true); val b = run(false)
    assert(a === b)
    // the corpus's planted dups actually exercise the cut
    assert(a.values.exists(_._3 > 0))
  }
}
