package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Eval-set decontamination: find (and drop) training documents whose
  * word n-grams overlap an evaluation corpus — the standard leakage
  * control of LLM training pipelines (GPT-3 §C / The Pile used 8–13-gram
  * collision against benchmark sets).
  *
  * Plan shape: explode both corpora to distinct n-grams, LEFT-join the
  * train grams against the (distinct) eval gram set — multiplicity one on
  * the build side, so no fan-out — and aggregate hits per document. The
  * eval set is usually tiny relative to training data: Catalyst
  * broadcasts it, making the pass effectively map-side at 100 TB.
  */
object Decontaminate {

  /** Per-train-doc overlap: (idCol, n_grams, n_shared, overlap) where
    * overlap = |doc's distinct n-grams ∩ eval n-grams| / |doc's distinct
    * n-grams|. Documents with fewer than n tokens have no n-grams and
    * produce no row (nothing to leak). */
  def ngramOverlap(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val grams = train.select(col(idCol),
      explode(TextFunctions.shinglesFast(col(textCol), n)).as("__g"))
    val evalGrams = eval
      .select(explode(TextFunctions.shinglesFast(col(textCol), n)).as("__g"))
      .distinct()
      .withColumn("__hit", lit(1))
    grams.join(evalGrams, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_shared"))
      .withColumn("overlap",
        col("n_shared").cast("double") / col("n_grams").cast("double"))
  }

  /** Training corpus with contaminated documents removed (overlap ≥
    * `maxOverlap`). */
  def clean(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      n: Int = 8, maxOverlap: Double = 0.5): DataFrame = {
    val flagged = ngramOverlap(train, eval, idCol, textCol, n)
      .filter(col("overlap") >= maxOverlap)
      .select(col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }
}
