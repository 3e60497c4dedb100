package graft

import org.apache.spark.sql.functions._

import graft.operators.{Datasheet, Dedup, Drift}

/** The datasheet is a COMPOSITION of already-tested operators — these
  * tests pin the composition: each column reconciles against the
  * standalone operator on the same rows, and the hand fixture pins the
  * deterministic language-mode tie-break and the floor-ppm means. */
class DatasheetSpec extends SparkTestBase {
  import spark.implicits._

  test("hand fixture: volumes, mode tie-break, dup and mix fractions") {
    val docs = Seq(
      // s1: two langs tied 1-1 -> mode breaks to 'de' (lang asc);
      // two docs share text -> both are dup docs
      (1L, "same text here", "s1", "fr", 14L),
      (2L, "same text here", "s1", "de", 14L),
      // s2: lang mode 'en' 2 of 3; no dups; null lang buckets visibly
      (3L, "alpha beta", "s2", "en", 10L),
      (4L, "gamma delta epsilon", "s2", "en", 19L),
      (5L, "zeta", "s2", null, 4L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val out = Datasheet.corpusDatasheet(
        docs, "text", "source", "lang", "n_chars", vocabSize = 100)
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_docs") === 2L)
    assert(s1.getAs[Long]("n_tokens") === 6L)
    assert(s1.getAs[Double]("mean_chars") === 14.0)
    assert(s1.getAs[String]("top_lang") === "de") // tie -> lang asc
    assert(s1.getAs[Double]("top_lang_frac") === 0.5)
    assert(s1.getAs[Long]("n_dup_docs") === 2L)
    assert(s1.getAs[Double]("dup_rate") === 1.0)
    val s2 = out("s2")
    assert(s2.getAs[Long]("n_docs") === 3L)
    assert(s2.getAs[String]("top_lang") === "en")
    // floor-ppm of 2/3 and of (10+19+4)/3 = 11
    assert(s2.getAs[Double]("top_lang_frac") === 0.666666)
    assert(s2.getAs[Double]("mean_chars") === 11.0)
    assert(s2.getAs[Long]("n_dup_docs") === 0L)
    assert(s2.getAs[Double]("dup_rate") === 0.0)
  }

  test("a token-less source keeps its row with NULL divergences") {
    // review finding: the drift side is derived from exploded tokens,
    // so a source of empty-text docs never enters it — the inner join
    // silently deleted the source from the datasheet
    val docs = Seq(
      (1L, "real words here", "s1", "en", 15L),
      (2L, "", "s_empty", "en", 0L),
      (3L, "   ", "s_empty", "en", 3L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val out = Datasheet.corpusDatasheet(
        docs, "text", "source", "lang", "n_chars", vocabSize = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("s1", "s_empty"))
    val e = out("s_empty")
    assert(e.getAs[Long]("n_docs") === 2L)
    assert(e.getAs[Long]("n_tokens") === 0L)
    assert(e.isNullAt(e.fieldIndex("js_vs_global")))
    assert(e.isNullAt(e.fieldIndex("kl_vs_global")))
  }

  test("composite columns reconcile against the standalone operators") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val sheet = Datasheet.corpusDatasheet(
        docs, "text", "source", "lang", "n_chars", vocabSize = 200)
      .collect().map(r => r.getString(0) -> r).toMap
    // dup columns == Dedup.dupRateByGroup
    Dedup.dupRateByGroup(docs, "source", "text").collect().foreach { r =>
      val s = sheet(r.getString(0))
      assert(s.getAs[Long]("n_dup_docs") === r.getAs[Long]("n_dup_docs"))
      assert(s.getAs[Double]("dup_rate") === r.getAs[Double]("dup_rate"))
    }
    // divergence columns == Drift.unigramDivergence at the same K
    Drift.unigramDivergence(
        docs.select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("tk")),
        "source", "tk", 200).collect().foreach { r =>
      val s = sheet(r.getString(0))
      assert(s.getAs[Double]("oov_frac") === r.getAs[Double]("oov_frac"))
      assert(s.getAs[Double]("kl_vs_global") ===
        r.getAs[Double]("kl_vs_global"))
      assert(s.getAs[Double]("js_vs_global") ===
        r.getAs[Double]("js_vs_global"))
    }
    // volumes == direct aggregates
    docs.groupBy("source")
      .agg(count(lit(1)).as("nd"),
        sum(graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("bigint")).as("nt"))
      .collect().foreach { r =>
        val s = sheet(r.getString(0))
        assert(s.getAs[Long]("n_docs") === r.getAs[Long]("nd"))
        assert(s.getAs[Long]("n_tokens") === r.getAs[Long]("nt"))
      }
    assert(sheet.size === 20)
  }

  test("concentration: hand-computed Gini / top-share / HHI") {
    // sizes 0,0,0,10: n=4, S=10, S₁ = 4·10 = 40 →
    //   G = (2·40 − 5·10)/(4·10) = 0.75; top ⌈4/100⌉=1 doc holds all
    val docs = Seq(
      (1L, 0L, "a"), (2L, 0L, "a"), (3L, 0L, "a"), (4L, 10L, "b")
    ).toDF("doc_id", "n_chars", "source")
    val r = Datasheet.concentration(docs, "n_chars", "source")
      .collect().head
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("total_size") === 10L)
    assert(r.getAs[Long]("gini_ppm") === 750000L)
    assert(r.getAs[Long]("top1pct_share_ppm") === 1000000L)
    // shares 3/4 and 1/4 → HHI = 9/16 + 1/16 = 0.625
    assert(r.getAs[Long]("hhi_source_ppm") === 625000L)
    assert(r.getAs[Long]("n_sources") === 2L)
  }

  test("concentration: high-cardinality sizeCol fails fast with the " +
      "bucketing recipe; the bound is a parameter") {
    // 5000 distinct byte-granular sizes against a bound of 100: the
    // guard must throw BEFORE any window work, data-independently,
    // and name the fix. approx_count_distinct carries ~±5 % HLL error,
    // so the fixture overshoots the bound 50×, far past the noise.
    val wide = (1L to 5000L).map(i => (i, i, s"s${i % 3}"))
      .toDF("doc_id", "n_bytes", "source")
    val e = intercept[IllegalArgumentException] {
      Datasheet.concentration(wide, "n_bytes", "source",
        maxDistinctSizes = 100L)
    }
    assert(e.getMessage.contains("maxDistinctSizes"))
    assert(e.getMessage.contains("floor(col/width)*width"))
    // same frame, bucketed per the message's recipe → passes the same
    // bound and produces the one-row report
    val bucketed = wide.withColumn("n_bytes",
      expr("CAST(floor(n_bytes / 100) * 100 AS BIGINT)"))
    val r = Datasheet.concentration(bucketed, "n_bytes", "source",
      maxDistinctSizes = 100L).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_docs") === 5000L)
  }

  test("concentration: the HLL error band WARNS and proceeds; only a " +
      "clear overshoot throws; Long.MaxValue skips the guard (ADVICE r17)") {
    val wide = (1L to 5000L).map(i => (i, i, s"s${i % 3}"))
      .toDF("doc_id", "n_bytes", "source")
    // self-calibrating band probe: place the bound so the operator's
    // own estimate lands inside (bound, 1.1x bound] — an
    // estimate-near-the-bound caller must NOT flip pass/fail on HLL
    // noise (the estimate is deterministic for a fixed fixture, so
    // this pins the band semantics exactly at the seam)
    val est = wide.select(
        approx_count_distinct(col("n_bytes")).as("d"))
      .collect().head.getLong(0)
    val inBand = math.ceil(est / 1.05).toLong
    val r = Datasheet.concentration(wide, "n_bytes", "source",
      maxDistinctSizes = inBand).collect()
    assert(r.length === 1 && r.head.getAs[Long]("n_docs") === 5000L)
    // past the band (> 1.1x) still fails fast with the recipe
    val farOver = (est / 1.2).toLong
    val e = intercept[IllegalArgumentException] {
      Datasheet.concentration(wide, "n_bytes", "source",
        maxDistinctSizes = farOver)
    }
    assert(e.getMessage.contains("maxDistinctSizes"))
    assert(e.getMessage.contains("Long.MaxValue"))
    // explicit opt-out: no eager scan, no gate — the call just runs
    val r2 = Datasheet.concentration(wide, "n_bytes", "source",
      maxDistinctSizes = Long.MaxValue).collect()
    assert(r2.length === 1 && r2.head.getAs[Long]("n_docs") === 5000L)
  }

  test("concentration: equal corpus has Gini 0; ties don't break the " +
      "value-level rank-sum; layout-invariant") {
    val eq = (1L to 40L).map(i => (i, 7L, s"s${i % 8}"))
      .toDF("doc_id", "n_chars", "source")
    val r = Datasheet.concentration(eq, "n_chars", "source").collect().head
    assert(r.getAs[Long]("gini_ppm") === 0L)
    assert(r.getAs[Long]("hhi_source_ppm") === 125000L) // 8 equal sources
    // top 1% = ⌈40/100⌉ = 1 doc of 40 equal docs → 1/40 = 25000 ppm
    assert(r.getAs[Long]("top1pct_share_ppm") === 25000L)
    val rng = new scala.util.Random(31)
    val mix = (1L to 120L).map(i =>
      (i, rng.nextInt(20).toLong, s"s${rng.nextInt(5)}"))
      .toDF("doc_id", "n_chars", "source")
    val a = Datasheet.concentration(mix, "n_chars", "source").collect().head
    val b = Datasheet.concentration(mix.repartition(11), "n_chars", "source")
      .collect().head
    assert(a.toSeq === b.toSeq)
    // Gini against the naive per-row rank formula (floor-ppm)
    val sizes = mix.collect().map(_.getLong(1)).sorted
    val n = sizes.length.toLong
    val s = sizes.sum
    val s1 = sizes.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expect = (BigInt(2) * s1 - BigInt(n + 1) * s) * 1000000 /
      (BigInt(n) * s)
    assert(a.getAs[Long]("gini_ppm") === expect.toLong)
  }
}
