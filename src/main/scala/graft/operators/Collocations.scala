package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Collocation (association-strength) statistics over adjacent-token
  * bigrams — the corpus-analysis pass behind phrase mining, tokenizer
  * merge-rule candidates, and boilerplate detection in a training-data
  * pipeline.
  *
  * The strength measure is LIFT over the bigram corpus:
  *
  *   lift(a,b) = P(ab) / (P1(a) · P2(b))
  *             = n_ab · N / (n_a· · n_·b)
  *
  * where n_ab is the bigram count, n_a· / n_·b the first-/second-position
  * marginals, and N the total bigram count — all drawn from the SAME
  * bigram table, so the measure is self-consistent (PMI is ln(lift);
  * lift itself is kept because the ratio of exact integer counts divides
  * to an identically-rounded double on every engine, while ln() differs
  * in ulps across libm implementations).
  *
  * Plan shape: one explode (doc → bigrams), one groupBy(w1,w2) with
  * map-side partial aggregation, two window sums over the COUNTS table
  * (marginals — the window input is |vocab|² at worst, corpus-independent),
  * and a broadcast of the single-row total. No shuffle touches the corpus
  * twice.
  */
object Collocations {

  /** Adjacent-token bigram rows (w1, w2) — one row per OCCURRENCE. */
  def bigramRows(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("__tk"))
    toks.filter(size(col("__tk")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__tk")) - 1),
        i => struct(element_at(col("__tk"), i).as("w1"),
          element_at(col("__tk"), i + 1).as("w2")))).as("__bi"))
      .select(col("__bi.w1").as("w1"), col("__bi.w2").as("w2"))
  }

  /** Bigram lift table: (w1, w2, n_ab, lift), restricted to bigrams seen
    * at least `minCount` times (rare-pair lift is noise — the classic
    * sparse-count guard). Lift is computed as
    * CAST(n_ab·N AS DOUBLE)/(n_a·n_b): the integer products stay exact
    * in 64-bit well past trillion-token corpora for the counts that
    * survive `minCount`, and the single double division is correctly
    * rounded — so two engines agree bit-for-bit. */
  def bigramLift(
      docs: DataFrame, textCol: String, minCount: Long = 5L): DataFrame = {
    val counts = bigramRows(docs, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_ab"))
    val total = counts.agg(sum(col("n_ab")).as("__n")) // single row
    counts
      .withColumn("__n_a", sum(col("n_ab")).over(Window.partitionBy(col("w1"))))
      .withColumn("__n_b", sum(col("n_ab")).over(Window.partitionBy(col("w2"))))
      .join(broadcast(total))
      .filter(col("n_ab") >= minCount)
      .select(col("w1"), col("w2"), col("n_ab"),
        round((col("n_ab") * col("__n")).cast("double") /
          (col("__n_a") * col("__n_b")).cast("double"), 6).as("lift"))
  }

  /** Top collocations by lift, total-ordered (lift desc, then w1, w2). */
  def topCollocations(
      docs: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 20): DataFrame =
    bigramLift(docs, textCol, minCount)
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)

  /** Ordered skip-gram pair rows (center, context): for every position i,
    * the up-to-`window` tokens FOLLOWING it — word2vec-style co-occurrence
    * pair generation (forward arcs only; the symmetric set is this
    * unioned with its swap). MAP-ONLY: the pairs are built inside one
    * codegen'd `transform`/`flatten`/`explode` over each doc's token
    * array — no join, no shuffle until the caller aggregates, so the
    * stage parallelizes embarrassingly at any corpus size. */
  def skipgramRows(
      docs: DataFrame, textCol: String, window: Int = 2): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("__tk"))
    // size >= 2 guard: Spark's sequence(1, 0) is a DESCENDING range
    toks.filter(size(col("__tk")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("__tk")) - 1),
        i => transform(
          sequence(lit(1), least(lit(window), size(col("__tk")) - i)),
          j => struct(element_at(col("__tk"), i).as("center"),
            element_at(col("__tk"), i + j).as("context")))))).as("__p"))
      .select(col("__p.center").as("center"), col("__p.context").as("context"))
  }

  /** Most frequent skip-gram pairs, total-ordered. */
  def topSkipgrams(
      docs: DataFrame, textCol: String,
      window: Int = 2, k: Int = 20): DataFrame =
    skipgramRows(docs, textCol, window)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("center"), col("context"))
      .limit(k)
}
