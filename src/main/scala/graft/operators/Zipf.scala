package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf power-law fit over the corpus token-frequency distribution —
  * the classic corpus-health diagnostic: natural text follows
  * freq ∝ rank^(-s) with s ≈ 1; a slope far from -1 (or a poor fit)
  * flags template spam, boilerplate floods, or tokenizer damage
  * (Zipf 1949; Piantadosi 2014 review).
  *
  * Fit: least-squares of ln(freq) on ln(rank) over the top `topK`
  * tokens. Scale shape: token counts are one corpus-sized shuffle
  * (map-side combined); the top-K carve is a distributed
  * TakeOrderedAndProject (never a global sort); the rank window then
  * runs over topK rows — bounded by construction, the
  * [[Metrics]]-shard-offsets convention. Numeric discipline is the
  * [[Drift]] recipe: ln()'s last-ulp (libm-unspecified) is absorbed by
  * a DECIMAL(24,10) round, per-term products are rounded to
  * DECIMAL(28,12), and all sums are exact decimal sums — so the fit is
  * bit-reproducible on any engine and independent of partition layout.
  */
object Zipf {

  /** One-row fit report: (n_tokens, slope, intercept, r2), each rounded
    * to 6 decimals (n_tokens = min(topK, vocabulary size)). */
  def fit(docs: DataFrame, textCol: String, topK: Int = 1000): DataFrame = {
    require(topK >= 2, s"topK must be >= 2, got $topK")
    // row-level empty filter after the explode instead of TF.tokens's
    // array-filter lambda: same multiset, but every operator here stays
    // in whole-stage codegen (HOF lambdas run interpreted)
    val freq = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    // distributed top-K; ties broken by token for a deterministic carve
    val top = freq.orderBy(col("freq").desc, col("tok")).limit(topK)
    // window over <= topK rows — bounded by construction
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
    val lx = log(col("rank")).cast("decimal(24,10)").cast("double")
    val ly = log(col("freq")).cast("decimal(24,10)").cast("double")
    val terms = ranked.select(
      lx.cast("decimal(24,10)").as("x"),
      ly.cast("decimal(24,10)").as("y"),
      (lx * ly).cast("decimal(28,12)").as("xy"),
      (lx * lx).cast("decimal(28,12)").as("xx"),
      (ly * ly).cast("decimal(28,12)").as("yy"))
    val sums = terms.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("xy")).cast("double").as("sxy"),
      sum(col("xx")).cast("double").as("sxx"),
      sum(col("yy")).cast("double").as("syy"))
    sums.select(
      col("n").cast("long").as("n_tokens"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
      round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
        col("n"), 6).as("intercept"),
      round(
        ((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }
}
