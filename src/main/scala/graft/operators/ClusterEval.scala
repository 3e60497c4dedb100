package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pair-counting agreement between two clusterings of the same items —
  * the evaluation gate on a DEDUP STRATEGY change: before swapping
  * MinHash parameters, a fingerprint normalization, or a semantic
  * threshold into the production pipeline, measure how much the new
  * duplicate-cluster assignment agrees with the old one (or with a
  * labeled gold clustering) WITHOUT materializing a single pair of
  * items.
  *
  * Metrics (all over the universe of unordered item pairs):
  *  - pair precision / recall / F1, reading clustering B as the
  *    prediction and clustering A as the reference: of the pairs B
  *    puts together, how many does A also put together (precision);
  *    of A's pairs, how many does B recover (recall);
  *  - Adjusted Rand Index (Hubert & Arabie 1985, "Comparing
  *    partitions"): pair agreement corrected for chance, 1 = identical
  *    partitions, ~0 = random relabeling, negative = worse than chance.
  *
  * Scale shape (the point, at 100 TB): everything derives from the
  * CONTINGENCY TABLE, never from pairs. One map-side-combined
  * shuffle on (a, b) builds the co-occurrence counts n_ab; the
  * marginals a_i, b_j are aggregates OF THE CONTINGENCY ROWS (bounded
  * by the number of distinct label pairs, not by items); the final
  * metrics are three 1-row aggregates joined together. Pair counts
  * C(n,2) accumulate as exact DECIMAL(38,0) — a 10¹²-item corpus has
  * ~10²³ pairs, far past any 64-bit integer — and only the final
  * ratios drop to IEEE double.
  *
  * Null contract: items with a NULL in EITHER label column are
  * excluded from the comparison (a null cluster id asserts nothing
  * about pair membership); the drop is counted by a
  * `graft.cluster_eval.agreement.*` observe metric
  * (`null_label_rows_dropped`) — the no-silent-drops contract
  * capPerGroup and balanceClasses follow.
  *
  * Degenerate edges (pinned in ClusterEvalSpec):
  *  - B has no co-clustered pair (all singletons) → precision NULL
  *    (0/0 — nothing was predicted); likewise recall when A has none;
  *  - F1 is 0.0 when precision + recall = 0 with both defined, NULL
  *    when either is NULL;
  *  - the ARI denominator maxIndex − expectedIndex is 0 exactly when
  *    both partitions are in the same trivial limit (both all-
  *    singletons, or both one-cluster) — there the partitions are
  *    necessarily identical and ARI is defined as 1.0 (the standard
  *    convention, e.g. scikit-learn's adjusted_rand_score).
  */
object ClusterEval {

  /** Per-invocation suffix for observe() metric names (Spark rejects two
    * CollectMetrics nodes sharing a name in one plan). */
  private val metricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Exact C(n, 2) as DECIMAL(38,0) for a non-negative BIGINT count
    * column, without overflow: halve the even factor in 64-bit integer
    * space (shiftright), multiply in decimal. n ≤ ~10¹⁹ keeps the
    * product under 38 digits. Package-visible for the overflow spec. */
  private[graft] def pairsOf(n: Column): Column = {
    val even = n % 2 === 0
    val half = shiftright(when(even, n).otherwise(n - 1), 1)
    val other = when(even, n - 1).otherwise(n)
    (half.cast("decimal(19,0)") * other.cast("decimal(19,0)"))
      .cast("decimal(38,0)")
  }

  /** Agreement between the partitions induced by `aCol` (reference) and
    * `bCol` (prediction) over the rows of `df`. Returns ONE row:
    * (n_items BIGINT, pair_precision, pair_recall, pair_f1, ari — all
    * double, 6 dp). Label columns may be any equatable type; rows with
    * a null label on either side are dropped (counted by the observe
    * metric — see the object doc). */
  def agreement(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    ObservedLog.ensure(df.sparkSession)
    val labeled = df
      .observe(
        s"graft.cluster_eval.agreement.${metricSeq.incrementAndGet()}",
        sum(when(col(aCol).isNull || col(bCol).isNull, 1L).otherwise(0L))
          .as("null_label_rows_dropped"))
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)

    // the one item-sized shuffle: contingency counts n_ab
    val ct = labeled.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))

    // everything below aggregates CONTINGENCY rows (≤ distinct label
    // pairs). Spark can't reuse one exchange across three different
    // grouping keys, but each re-shuffle ships contingency rows, not
    // items.
    val joint = ct.agg(
      sum(pairsOf(col("__n"))).cast("decimal(38,0)").as("__pab"),
      sum(col("__n")).as("__n_items"))
    val aSide = ct.groupBy(col("__a"))
      .agg(sum(col("__n")).as("__na"))
      .agg(sum(pairsOf(col("__na"))).cast("decimal(38,0)").as("__pa"))
    val bSide = ct.groupBy(col("__b"))
      .agg(sum(col("__n")).as("__nb"))
      .agg(sum(pairsOf(col("__nb"))).cast("decimal(38,0)").as("__pb"))

    // empty input: joint aggregates to (NULL, NULL) — normalize to the
    // canonical empty-comparison row (0 items, all metrics NULL)
    val scalars = joint.crossJoin(aSide).crossJoin(bSide)
      .select(
        coalesce(col("__n_items"), lit(0L)).as("n_items"),
        col("__pab").cast("double").as("__pabD"),
        col("__pa").cast("double").as("__paD"),
        col("__pb").cast("double").as("__pbD"),
        pairsOf(coalesce(col("__n_items"), lit(0L)))
          .cast("double").as("__tD"))

    // ratios in IEEE double over the exact pair sums. expected/maxIndex
    // stay double — pa·pb can reach ~10⁴⁶, past ANY fixed decimal; the
    // ~1e-16 relative error is immaterial for a [-1, 1] index.
    val prec = when(col("__pbD") > 0, col("__pabD") / col("__pbD"))
    val rec = when(col("__paD") > 0, col("__pabD") / col("__paD"))
    val expected =
      when(col("__tD") > 0, col("__paD") * col("__pbD") / col("__tD"))
        .otherwise(lit(0.0))
    val maxIndex = (col("__paD") + col("__pbD")) / lit(2.0)
    val denom = maxIndex - expected
    scalars
      .withColumn("__p", prec)
      .withColumn("__r", rec)
      .select(
        col("n_items"),
        round(col("__p"), 6).as("pair_precision"),
        round(col("__r"), 6).as("pair_recall"),
        round(
          when(col("__p").isNull || col("__r").isNull, lit(null))
            .when(col("__p") + col("__r") > 0,
              lit(2.0) * col("__p") * col("__r") /
                (col("__p") + col("__r")))
            .otherwise(lit(0.0)).cast("double"), 6).as("pair_f1"),
        round(
          when(col("n_items") === 0, lit(null))
            .when(denom === 0, lit(1.0))
            .otherwise((col("__pabD") - expected) / denom)
            .cast("double"), 6).as("ari"))
  }

  /** B-cubed (B³) precision/recall/F1 (Bagga & Baldwin 1998; the
    * Amigó et al. 2009 survey's recommended extrinsic clustering
    * metric): per-ITEM averages, the third standard view next to
    * [[agreement]]'s pair counting and [[informationAgreement]]'s
    * label information. For item i in predicted cluster C(i) and
    * reference class G(i): precision_i = |C(i)∩G(i)|/|C(i)|,
    * recall_i = |C(i)∩G(i)|/|G(i)|; B³P/B³R are their means, B³F1 the
    * harmonic mean of the two. Unlike ARI (trivial-limit conventions)
    * and NMI (zero-entropy conventions), B³ is total for every
    * non-empty input — an all-singleton prediction scores precision
    * exactly 1.0 with low recall, an all-one-cluster prediction the
    * reverse, which is why coreference/dedup evaluations prefer it.
    *
    * Identity used: Σ_i |C(i)∩G(i)|/|C(i)| = Σ_cells n_ab² / n_b (and
    * symmetrically with n_a for recall) — so both sums are aggregates
    * of CONTINGENCY cells with their marginals attached by two
    * label-partitioned windows (cell rows only; a window partition is
    * one label's cells, bounded by the other side's distinct labels —
    * never items, never a marginals⋈cells self-join). Each cell's
    * ratio term (≤ n_ab, so ≤ 10¹⁹ — inside DECIMAL(38,10)'s 28
    * integer digits) is quantized to 1e-10 and decimal-summed: order-
    * independent and DuckDB-replayable; the final /N is double.
    *
    * Null contract as [[agreement]] (dropped + counted,
    * `graft.cluster_eval.bcubed.*`). Empty input → (0, NULL × 3).
    */
  def bCubed(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    ObservedLog.ensure(df.sparkSession)
    val labeled = df
      .observe(
        s"graft.cluster_eval.bcubed.${metricSeq.incrementAndGet()}",
        sum(when(col(aCol).isNull || col(bCol).isNull, 1L).otherwise(0L))
          .as("null_label_rows_dropped"))
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val ct = labeled.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__a"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b"))
    val cells = ct
      .withColumn("__na", sum(col("__n")).over(wA))
      .withColumn("__nb", sum(col("__n")).over(wB))
    def term(marginal: String): Column =
      ((col("__n").cast("double") * col("__n").cast("double")) /
        col(marginal).cast("double")).cast("decimal(38,10)")
    val sums = cells.agg(
      sum(term("__nb")).as("__ps"),
      sum(term("__na")).as("__rs"),
      coalesce(sum(col("__n")), lit(0L)).as("__N"))
    val nD = col("__N").cast("double")
    val p = col("__ps").cast("double") / nD
    val r = col("__rs").cast("double") / nD
    val empty = col("__N") === 0L
    sums
      .withColumn("__p", when(empty, lit(null)).otherwise(p))
      .withColumn("__r", when(empty, lit(null)).otherwise(r))
      .select(
        col("__N").as("n_items"),
        round(col("__p"), 6).as("b3_precision"),
        round(col("__r"), 6).as("b3_recall"),
        round(when(empty, lit(null))
          .otherwise(lit(2.0) * col("__p") * col("__r") /
            (col("__p") + col("__r"))), 6).as("b3_f1"))
  }

  /** Information-theoretic agreement between the partitions induced by
    * `aCol` (reference) and `bCol` (prediction): entropies, mutual
    * information, NMI, and Rosenberg-Hirschberg homogeneity /
    * completeness / V-measure (EMNLP 2007), with scikit-learn's
    * conventions so numbers are comparable to the ecosystem standard:
    *  - NMI normalizer is the ARITHMETIC mean (H(A)+H(B))/2
    *    (sklearn's default `average_method`);
    *  - both partitions trivial (H(A)=H(B)=0 — each a single cluster)
    *    → NMI 1.0; MI = 0 with a nontrivial side → NMI 0.0;
    *  - homogeneity = MI/H(A) (1.0 when H(A)=0), completeness =
    *    MI/H(B) (1.0 when H(B)=0), V = harmonic mean (0.0 when both 0).
    * Natural-log entropies (units cancel in every ratio).
    *
    * The pair-counting `agreement` and this measure disagree by design:
    * ARI counts pair CO-MEMBERSHIP (sensitive to cluster sizes), MI
    * counts label INFORMATION — report both before accepting a dedup
    * strategy change.
    *
    * Scale shape: identical to [[agreement]] — one item-sized
    * map-side-combined shuffle builds the contingency table; MI is
    * computed as H(A) + H(B) − H(A,B), so the three entropy legs are
    * independent aggregates OVER that one reused exchange (contingency
    * rows only — two fine-grained clusterings can have ~|items| cells,
    * which is why nothing ever joins marginals back onto cells). The
    * only driver materialization is N, one long (the aucRoc-quantile
    * class of bounded collect) — which makes this operator EAGER: it
    * runs the contingency count when called. Determinism: each
    * row's p·ln(p) term is DECIMAL(24,10)-rounded then decimal-summed
    * (the LangModel/Zipf contract), so aggregation order cannot move a
    * metric and DuckDB replays the sums bit-for-bit; the final ratios
    * are double. MI is clamped at 0 and the ratios at 1 — the 1e-10
    * term quantization can push exact-zero/exact-one limits a hair
    * past, never a real signal.
    *
    * Null contract: as [[agreement]] — null-label rows dropped, counted
    * by a `graft.cluster_eval.info.*` observe metric. Empty input →
    * (0, NULL × 7).
    */
  def informationAgreement(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = df.sparkSession
    ObservedLog.ensure(spark)
    val labeled = df
      .observe(
        s"graft.cluster_eval.info.${metricSeq.incrementAndGet()}",
        sum(when(col(aCol).isNull || col(bCol).isNull, 1L).otherwise(0L))
          .as("null_label_rows_dropped"))
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)

    val ct = labeled.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))

    // MI = H(A) + H(B) − H(A,B): three independent entropy aggregates
    // over the SAME contingency exchange (the partial aggregate below
    // each marginal is identical, so ReusedExchange dedupes the
    // item-sized shuffle) — no marginal join back onto the cells, which
    // both re-ships contingency rows and trips the USING-join
    // hidden-output ambiguity on self-lineage frames. N is ONE eagerly
    // collected long (bounded by construction, the aucRoc-quantile
    // class of collect) so each p·ln(p) term keeps p as a plain
    // division by a literal.
    val nItems = ct.agg(coalesce(sum(col("__n")), lit(0L)))
      .head().getLong(0)
    if (nItems == 0L) {
      // canonical empty-comparison row; the observe metric already
      // fired on the eager N count above
      return spark.range(1).select(
        lit(0L).as("n_items"),
        lit(null).cast("double").as("h_a"),
        lit(null).cast("double").as("h_b"),
        lit(null).cast("double").as("mutual_info"),
        lit(null).cast("double").as("nmi"),
        lit(null).cast("double").as("homogeneity"),
        lit(null).cast("double").as("completeness"),
        lit(null).cast("double").as("v_measure"))
    }
    val nD = lit(nItems.toDouble)
    // quantized p·ln(p) term, exact decimal sum (order-independent,
    // DuckDB-replayable — the LangModel/Zipf contract)
    def entropyOf(counts: DataFrame, c: String, out: String): DataFrame =
      counts.agg(
        (-sum(((col(c).cast("double") / nD) *
          log(col(c).cast("double") / nD)).cast("decimal(24,10)")))
          .cast("double").as(out))
    val hA = entropyOf(
      ct.groupBy(col("__a")).agg(sum(col("__n")).as("__na")),
      "__na", "__ha")
    val hB = entropyOf(
      ct.groupBy(col("__b")).agg(sum(col("__n")).as("__nb")),
      "__nb", "__hb")
    val hJ = entropyOf(ct, "__n", "__hj")

    val scalars = hA.crossJoin(hB).crossJoin(hJ)
      .select(col("__ha"), col("__hb"),
        greatest(col("__ha") + col("__hb") - col("__hj"), lit(0.0))
          .as("__mi"))

    val hom = when(col("__ha") === 0.0, lit(1.0))
      .otherwise(least(col("__mi") / col("__ha"), lit(1.0)))
    val com = when(col("__hb") === 0.0, lit(1.0))
      .otherwise(least(col("__mi") / col("__hb"), lit(1.0)))
    scalars
      .withColumn("__hom", hom)
      .withColumn("__com", com)
      .select(
        lit(nItems).as("n_items"),
        round(col("__ha"), 6).as("h_a"),
        round(col("__hb"), 6).as("h_b"),
        round(col("__mi"), 6).as("mutual_info"),
        round(
          when(col("__ha") === 0.0 && col("__hb") === 0.0, lit(1.0))
            .when(col("__mi") === 0.0, lit(0.0))
            .otherwise(least(
              col("__mi") / ((col("__ha") + col("__hb")) / lit(2.0)),
              lit(1.0))), 6).as("nmi"),
        round(col("__hom"), 6).as("homogeneity"),
        round(col("__com"), 6).as("completeness"),
        round(
          when(col("__hom") + col("__com") === 0.0, lit(0.0))
            .otherwise(lit(2.0) * col("__hom") * col("__com") /
              (col("__hom") + col("__com"))), 6).as("v_measure"))
  }
}
