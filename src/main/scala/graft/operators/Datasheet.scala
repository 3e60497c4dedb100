package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus DATASHEET: the one-relation per-source profile a data team
  * publishes with a training corpus (datasheet/data-card practice) —
  * volume, length, exact-duplication health, language mix, and lexical
  * distance from the corpus average, each an already-verified operator,
  * composed and emitted as one row per source:
  *
  *   (source, n_docs, n_tokens, mean_chars, top_lang, top_lang_frac,
  *    n_dup_docs, dup_rate, oov_frac, kl_vs_global, js_vs_global)
  *
  * Composition cost (documented, not hidden): ~5 corpus passes — one
  * (source, lang) count/token/char aggregate (lang mix and volume ride
  * the SAME pass: per-source totals re-aggregate from the bounded
  * (source, lang) frame), the md5 fingerprint pass + group-size join of
  * [[Dedup.dupRateByGroup]], and [[Drift.unigramDivergence]]'s two
  * token passes. Everything downstream of those passes is
  * source- or (source × lang)-sized, joined broadcast; the final
  * relation is |sources| rows.
  *
  * Float discipline: means and fractions are floor-ppm exact-integer
  * arithmetic (the q173 tie lesson); dup_rate keeps
  * [[Dedup.dupRateByGroup]]'s established contract; divergences carry
  * [[Drift.unigramDivergence]]'s decimal-quantized terms. Null langs
  * bucket as the visible `<null>` value rather than vanishing from the
  * mix.
  */
object Datasheet {

  def corpusDatasheet(
      docs: DataFrame, textCol: String, sourceCol: String,
      langCol: String, nCharsCol: String,
      vocabSize: Int = 1000): DataFrame = {
    val base = docs.filter(col(sourceCol).isNotNull)

    // one pass: (source, lang) cells carry doc/token/char sums; the
    // per-source totals re-aggregate from this bounded frame
    val cells = base
      .select(col(sourceCol).as("src"),
        coalesce(col(langCol), lit("<null>")).as("lang"),
        graft.functions.TextFunctions.tokenCount(col(textCol))
          .cast("bigint").as("__nt"),
        col(nCharsCol).cast("bigint").as("__nc"))
      .groupBy(col("src"), col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("__nt")).as("nt"),
        sum(col("__nc")).as("nc"))
    val perSrc = cells.groupBy(col("src"))
      .agg(sum(col("n")).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(col("nc")).as("sum_chars"))
      .select(col("src"), col("n_docs"), col("n_tokens"),
        (expr("CAST(sum_chars AS DECIMAL(38,0)) * 1000000 " +
          "DIV CAST(n_docs AS DECIMAL(38,0))").cast("double") / lit(1e6))
          .as("mean_chars"))
    // lang mix: deterministic mode over the bounded cell frame
    // (count desc, lang asc), fraction as floor-ppm
    val byMix = Window.partitionBy(col("src"))
      .orderBy(col("n").desc, col("lang"))
    val topLang = cells
      .withColumn("__rk", row_number().over(byMix))
      .filter(col("__rk") === 1)
      .join(perSrc.select(col("src"), col("n_docs").as("__nd")), Seq("src"))
      .select(col("src"), col("lang").as("top_lang"),
        (expr("CAST(n AS DECIMAL(38,0)) * 1000000 " +
          "DIV CAST(__nd AS DECIMAL(38,0))").cast("double") / lit(1e6))
          .as("top_lang_frac"))
    val dup = Dedup.dupRateByGroup(base, sourceCol, textCol)
      .select(col(sourceCol).as("src"),
        col("n_dup_docs"), col("dup_rate"))
    val drift = Drift.unigramDivergence(
        base.select(col(sourceCol),
          explode(graft.functions.TextFunctions.tokens(col(textCol)))
            .as("__tok")),
        sourceCol, "__tok", vocabSize)
      .select(col(sourceCol).as("src"),
        col("oov_frac"), col("kl_vs_global"), col("js_vs_global"))

    // drift joins LEFT: a source whose documents yield zero tokens
    // (all-empty/null text) never enters the divergence frame — its
    // datasheet row must still exist (the one-row-per-source contract),
    // with NULL divergences saying "no lexical signal", not vanish.
    // topLang can't lose sources (derives from `base`); dup can't
    // either SINCE dupRateByGroup buckets null text under the ""
    // fingerprint (ADVICE r14: md5(null) used to null-join away a
    // source whose docs all had null text, and shrink a mixed-null
    // source's dup_rate denominator below its n_docs column).
    perSrc
      .join(topLang, Seq("src"))
      .join(dup, Seq("src"))
      .join(drift, Seq("src"), "left")
      .withColumnRenamed("src", sourceCol)
  }

  /** Corpus CONCENTRATION report — ONE row answering "how unequal is
    * this corpus?", the datasheet's inequality sidebar:
    *
    *   (n_docs, total_size, gini_ppm, top1pct_share_ppm,
    *    hhi_source_ppm, n_sources)
    *
    * gini_ppm: the Gini coefficient of the per-doc `sizeCol`
    * distribution (0 = all docs equal, →1 = all mass in one doc), the
    * standard inequality summary for length/token skew. Computed
    * EXACTLY from the VALUE-LEVEL frame — groupBy(size) → (value,
    * count), then ascending-cumulative window math over |distinct
    * sizes| rows: the rank-sum Σ_i i·x_(i) folds per value v to
    * v·(c·C_prev + c(c+1)/2), which is tie-order invariant, so no
    * global row sort ever runs (the naive formula sorts the corpus;
    * this sorts the bounded value frame). All terms DECIMAL(38,0),
    * share as floor-ppm: G = (2·S₁ − (n+1)·S) ppm-div (n·S).
    *
    * top1pct_share_ppm: share of total size held by the largest
    * ⌈n/100⌉ docs — computed from the same value frame by a
    * descending-cumulative cut (the boundary value contributes only its
    * partial count), so "top 1 %" is exact under ties without ranking
    * individual docs.
    *
    * hhi_source_ppm: Herfindahl–Hirschman index of source shares,
    * Σ(n_s/n)² in floor-ppm — 10⁶ = single-source corpus, 10⁶/k = k
    * equal sources. One map-combined groupBy(source).
    *
    * Scale: two map-combined aggregates (value frame + source frame),
    * window math over bounded frames, one cross-joined 1×1 result.
    * Rows with null `sizeCol` are excluded from the size metrics
    * (null has no magnitude); null sources form a visible group in the
    * HHI. Sizes must be non-negative integers (counts/lengths) — the
    * cumulative formulas assume x_(i) ≥ 0.
    *
    * PRECONDITION (same contract as [[Selection.curriculumSchedule]]),
    * ENFORCED fail-fast (round 17, the [[Normalize.quantileNormalize]]
    * `maxRefRows` pattern): `sizeCol` must be LOW-CARDINALITY relative
    * to the corpus — the cumulative windows run `Window.orderBy` with
    * no partitionBy, so the |distinct sizes| value frame lands on ONE
    * task. Token/char counts naturally saturate (≤ a few hundred
    * thousand distinct values at any corpus size); for a continuous or
    * high-cardinality size (bytes, float scores), bucket first —
    * `floor(col/width)*width` — or the single-partition window becomes
    * the bottleneck at scale. The guard is an EAGER
    * `approx_count_distinct` pass at call time (map-combined, one
    * scalar — the cheapest corpus-sized question there is): a caller
    * passing byte-granular sizes fails data-independently with the
    * bucketing recipe in the message instead of silently serializing
    * at crawl scale. HLL estimates carry ~±5 % error at the default
    * rsd, so `maxDistinctSizes` is an order-of-magnitude envelope
    * (default 10M — the same single-partition bound quantileNormalize
    * uses), not a precise cliff: estimates inside the error band
    * (bound < est ≤ 1.1× bound) WARN and proceed rather than flip
    * pass/fail on estimator noise, and only a clear overshoot
    * (> 1.1× bound) throws. The band means the EFFECTIVE admit
    * ceiling is 1.1× the declared bound (computed as an exact
    * BigDecimal edge — no double rounding at huge bounds); a caller
    * using the bound as a hard resource cap should declare cap/1.1.
    * Raise the bound knowingly if a bigger
    * value frame is genuinely wanted, or pass
    * `maxDistinctSizes = Long.MaxValue` to skip the eager guard scan
    * entirely — call-time laziness is then exactly the pre-guard
    * shape (ADVICE r17). */
  def concentration(
      docs: DataFrame, sizeCol: String, sourceCol: String,
      maxDistinctSizes: Long = 10000000L): DataFrame = {
    // Guard refinements (ADVICE r17): the estimate is an HLL with
    // ~±5 % error, so the bound is an envelope, not a cliff — a true
    // count just past it gets a WARNING band (up to 1.1× the bound)
    // instead of an estimate-dependent pass/fail flip, and only a
    // clear overshoot throws. maxDistinctSizes = Long.MaxValue
    // skips the eager corpus action entirely (restores laziness for
    // callers that KNOW their size column is bounded) — the plan is
    // then exactly the pre-guard shape.
    if (maxDistinctSizes != Long.MaxValue) {
      val estDistinct = docs.filter(col(sizeCol).isNotNull)
        .select(approx_count_distinct(col(sizeCol)).as("__d"))
        .collect()(0).getLong(0)
      lazy val recipe = "Bucket the size first " +
        "(e.g. floor(col/width)*width preserves concentration shape " +
        "at any width), raise maxDistinctSizes knowingly, or pass " +
        "maxDistinctSizes=Long.MaxValue to skip this eager guard"
      // exact band arithmetic (ADVICE r18): Long * 1.1 promotes to
      // Double, which loses integer precision past 2^53 — a caller
      // raising the bound near Long range would get a band edge off
      // by ulps. BigDecimal keeps the 1.1x edge exact at any bound.
      val bandEdge = (BigDecimal(maxDistinctSizes) * BigDecimal("1.1"))
        .setScale(0, BigDecimal.RoundingMode.CEILING)
      require(BigDecimal(estDistinct) <= bandEdge,
        s"concentration: sizeCol '$sizeCol' has ~$estDistinct distinct " +
          s"values, over the single-partition window bound " +
          s"maxDistinctSizes=$maxDistinctSizes — the exact-Gini value " +
          s"frame is window-sorted on ONE task. $recipe")
      if (estDistinct > maxDistinctSizes)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"concentration: sizeCol '$sizeCol' has ~$estDistinct " +
            s"distinct values — within the HLL error band of " +
            s"maxDistinctSizes=$maxDistinctSizes (<= 1.1x), so " +
            s"proceeding, but the single-task value-frame window is " +
            s"near its declared bound. $recipe")
    }
    val vals = docs.filter(col(sizeCol).isNotNull)
      .groupBy(col(sizeCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val ascW = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val annotated = vals
      .withColumn("__cum", sum(col("__c")).over(ascW))
      .withColumn("__n", sum(col("__c")).over(totW))
      .withColumn("__cprev", col("__cum") - col("__c"))
    // rank-sum term per value: v·(c·C_prev + c(c+1)/2), exact decimal
    val sizeAgg = annotated
      .withColumn("__k", expr("(__n + 99) DIV 100")) // ⌈n/100⌉
      // docs of this value inside the top-k by size: k minus the count
      // of strictly larger docs (__n − __cum), clamped into [0, c]
      .withColumn("__take",
        greatest(lit(0L), least(col("__c"),
          col("__k") - (col("__n") - col("__cum")))))
      .agg(
        max(col("__n")).as("n_docs"),
        sum(expr("CAST(__v AS DECIMAL(38,0)) * __c")).as("__s"),
        sum(expr("CAST(__v AS DECIMAL(38,0)) * " +
          "(CAST(__c AS DECIMAL(38,0)) * __cprev + " +
          "CAST(__c AS DECIMAL(38,0)) * (__c + 1) DIV 2)")).as("__s1"),
        sum(expr("CAST(__v AS DECIMAL(38,0)) * __take")).as("__top"))
      .withColumn("total_size", col("__s").cast("long"))
      .withColumn("gini_ppm",
        when(col("__s") === 0, lit(null).cast("long")).otherwise(
          expr("(2 * __s1 - (CAST(n_docs AS DECIMAL(38,0)) + 1) * __s) " +
            "* 1000000 DIV (CAST(n_docs AS DECIMAL(38,0)) * __s)")
            .cast("long")))
      .withColumn("top1pct_share_ppm",
        when(col("__s") === 0, lit(null).cast("long")).otherwise(
          expr("__top * 1000000 DIV __s").cast("long")))
      .select(col("n_docs"), col("total_size"), col("gini_ppm"),
        col("top1pct_share_ppm"))
    val srcAgg = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__ns"))
      .agg(
        count(lit(1)).as("n_sources"),
        sum(col("__ns")).as("__nt"),
        sum(expr("CAST(__ns AS DECIMAL(38,0)) * __ns")).as("__sq"))
      .withColumn("hhi_source_ppm",
        expr("__sq * 1000000 DIV " +
          "(CAST(__nt AS DECIMAL(38,0)) * __nt)").cast("long"))
      .select(col("n_sources"), col("hhi_source_ppm"))
    sizeAgg.crossJoin(srcAgg)
      .select(col("n_docs"), col("total_size"), col("gini_ppm"),
        col("top1pct_share_ppm"), col("hhi_source_ppm"), col("n_sources"))
  }
}
