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

  /** Token-budget WATERFILL across sources: given each source's token
    * count, a target mixture weight, and a per-source repetition ceiling
    * (`maxEpochs` — the "don't repeat data more than k times" rule of
    * published pretraining recipes), allocate a global token budget T so
    * every source receives tokens ∝ its weight until its ceiling binds:
    *
    *   alloc_s = min(λ · w_s, cap_s),   cap_s = n_s · maxEpochs,
    *   λ chosen so Σ_s alloc_s = T.
    *
    * The classic waterfilling solution: sort sources by r_s = cap_s/w_s
    * ascending; the first k sources (smallest ratios) are capped, the
    * rest share the remaining budget in proportion to weight, and
    * k is the smallest count with λ(k) = (T − Σ_{j≤k} cap_j)/Σ_{j>k} w_j
    * ≤ r_{k+1}. When even capping everything cannot reach T (Σ cap < T),
    * λ is NULL, every source is capped, and Σ alloc < T — the caller
    * sees the infeasibility in the output rather than an error.
    *
    * Scale shape: the input is the |sources|-row mixture frame (bounded
    * — it is the OUTPUT of a corpus aggregate, never the corpus), so the
    * single-partition windows are bounded by construction; nothing here
    * touches data-sized rows. Exactness: caps and cumulative sums fold
    * in DECIMAL(38,6); λ and the allocations are single correctly-
    * rounded double divisions of exact decimals, so Spark and a replay
    * engine agree bit-for-bit; ROUND(6) once at the end.
    *
    * Output per source: (source, n_tokens, weight, cap_tokens,
    * alloc_tokens, epochs, capped, lambda) — epochs NULL for an empty
    * source (0/0), lambda replicated for report reading.
    *
    * Weights must be positive numbers: a null/NaN/non-positive weight
    * raises at evaluation (it would otherwise sort into the ratio order
    * and silently corrupt λ for every other source). */
  def budgetWaterfill(
      sources: DataFrame, sourceCol: String, tokensCol: String,
      weightCol: String, budget: Long, maxEpochs: Double): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val w = org.apache.spark.sql.expressions.Window
    val cap = col(tokensCol).cast("decimal(38,6)") *
      lit(maxEpochs).cast("decimal(12,6)")
    // a non-positive / NaN / null weight doesn't error anywhere
    // downstream — it sorts into the ratio order and silently corrupts
    // λ for every OTHER source — so fail fast at evaluation like the
    // driver-side requires above (the frame is |sources|-sized, the
    // check is free)
    val wGuard = {
      val dw = col(weightCol).cast("double")
      when(dw.isNull || isnan(dw) || dw <= 0d,
        raise_error(concat(
          lit("budgetWaterfill: weight must be a positive number, got "),
          coalesce(dw.cast("string"), lit("null")),
          lit(" for source "),
          coalesce(col(sourceCol).cast("string"), lit("null")))))
        .otherwise(dw)
    }
    val base = sources.select(
        col(sourceCol).as("source"),
        col(tokensCol).cast("bigint").as("n_tokens"),
        wGuard.as("weight"))
      .withColumn("__cap", cap)
      .withColumn("__w", col("weight").cast("decimal(28,12)"))
      .withColumn("__r",
        col("__cap").cast("double") / col("weight"))
    // sorted ascending by ratio (ties broken by source for a total
    // order): prefix caps C_{i-1} and remaining weight W_{i-1}
    val order = w.partitionBy(lit(1))
      .orderBy(col("__r"), col("source"))
    val annotated = base
      .withColumn("__cum_cap",
        coalesce(sum(col("__cap")).over(
          order.rowsBetween(w.unboundedPreceding, -1)),
          lit(0).cast("decimal(38,6)")))
      .withColumn("__w_rem",
        sum(col("__w")).over(
          order.rowsBetween(w.currentRow, w.unboundedFollowing)))
      .withColumn("__lam_prev",
        (lit(budget).cast("decimal(38,6)") - col("__cum_cap"))
          .cast("double") / col("__w_rem").cast("double"))
    // λ* = λ(k*) where k* is the smallest prefix with λ(k) ≤ r_{k+1}:
    // the first row (in ratio order) whose λ_prev stops exceeding its
    // own ratio. A one-row frame; empty ⇒ infeasible ⇒ NULL λ via the
    // condition-less left join (a cross join would DROP every row).
    val lamRow = annotated
      .filter(col("__lam_prev") <= col("__r"))
      .orderBy(col("__r"), col("source")).limit(1)
      .select(col("__lam_prev").as("__lambda"))
    annotated.join(broadcast(lamRow), lit(true), "left")
      .select(col("source"), col("n_tokens"), col("weight"),
        round(col("__cap").cast("double"), 6).as("cap_tokens"),
        round(when(col("__lambda").isNull,
            col("__cap").cast("double"))
          .otherwise(least(col("__lambda") * col("weight"),
            col("__cap").cast("double"))), 6).as("alloc_tokens"),
        round(when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(
            when(col("__lambda").isNull, col("__cap").cast("double"))
              .otherwise(least(col("__lambda") * col("weight"),
                col("__cap").cast("double"))) /
            col("n_tokens").cast("double")), 6).as("epochs"),
        (col("__lambda").isNull ||
          col("__r") <= col("__lambda")).as("capped"),
        round(col("__lambda"), 6).as("lambda"))
      .orderBy(col("source"))
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
