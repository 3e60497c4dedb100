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
}
