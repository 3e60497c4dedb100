package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curriculum source mixing: downsample each source so the output matches
  * target mixture proportions ("60% web, 30% code, 10% books") — the
  * standard pre-training data-recipe step.
  *
  * No upsampling: the achievable total is N = min_s(n_s / w_s) (the
  * binding source is kept whole) and every other source is hash-
  * downsampled to w_s·N rows. Sampling is the deterministic md5-bucket
  * primitive from [[Sampling]] — a row's keep/drop never changes across
  * runs, partitionings, or engines, so the mix is reproducible lineage.
  *
  * Scale note: the only driver-side data is the per-source row count
  * (k = |weights| rows — bounded by the mixture spec, the same
  * justified-collect shape as IVF centroids); the sampling itself is a
  * pure map-side filter.
  */
object Mixing {

  /** Keep fractions per source for target `weights` (must sum to ~1; no
    * normalization is applied so oracle SQL can mirror the arithmetic
    * operation-for-operation). */
  def mixFractions(
      counts: Map[String, Long],
      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(math.abs(weights.values.sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.values.sum}")
    val total = weights.map { case (s, w) =>
      counts.getOrElse(s, 0L).toDouble / w
    }.min
    weights.map { case (s, w) =>
      val n = counts.getOrElse(s, 0L)
      s -> (if (n == 0) 0.0 else math.min(1.0, w * total / n))
    }
  }

  /** Temperature-scaled mixture weights from raw source sizes:
    * w_s ∝ n_s^alpha (then normalized). alpha = 1 reproduces the natural
    * distribution; alpha = 0 is uniform; the 0.2–0.5 range is the
    * published multilingual-pretraining practice for upweighting
    * low-resource sources relative to their natural share. Compose with
    * [[mixSources]]: `mixSources(df, key, src, temperatureWeights(counts,
    * 0.3))`. */
  def temperatureWeights(
      counts: Map[String, Long], alpha: Double): Map[String, Double] = {
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      "counts must be positive")
    require(alpha >= 0, "alpha must be >= 0")
    val raised = counts.map { case (s, n) =>
      s -> math.pow(n.toDouble, alpha)
    }
    val z = raised.values.sum
    raised.map { case (s, p) => s -> p / z }
  }

  /** Per-source token-budget selection: keep each source's documents in
    * `orderCols` order (quality-descending, typically) while the source's
    * RUNNING token total stays ≤ `budget` — the greedy knapsack every
    * data recipe runs when a source's share is capped in tokens, not
    * rows. One window per source partition (shuffle-on-source; within a
    * partition the cumulative sum is a single sorted pass — no global
    * window, so no serial point). Adds `__cum` (tokens through this row)
    * to the survivors; callers drop it or aggregate on it.
    *
    * Deterministic: `orderCols` must be a total order (tie-break with the
    * doc id) or the boundary row at the budget edge is layout-dependent. */
  def selectWithinTokenBudget(
      df: DataFrame, sourceCol: String, tokenCol: String,
      budget: Long, orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(orderCols: _*)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= budget)
  }

  /** The mixed corpus: rows from sources named in `weights`, hash-
    * downsampled to the target proportions. */
  def mixSources(
      df: DataFrame, keyCol: String, sourceCol: String,
      weights: Map[String, Double],
      buckets: Int = 1000): DataFrame = {
    val counts = df
      .filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Sampling.stratifiedSample(df, keyCol, sourceCol,
      mixFractions(counts, weights), buckets)
  }
}
