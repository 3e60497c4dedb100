package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Algebraic partial-aggregate states for incremental (materialized-view)
  * maintenance: compute fine-grained states once, then MERGE them to any
  * coarser grouping without touching the raw table again.
  *
  * This is the rollup-maintenance pattern for an append-only 100 TB fact
  * store: "recompute the month" must mean "merge 30 daily states", not
  * "rescan 3 TB of raw rows". count/sum/min/max are algebraic (their
  * states merge associatively); avg is derived sum/count at read time,
  * never stored. Sums run through exact DECIMAL so that merge ORDER
  * cannot perturb the result — a double sum's value depends on the
  * partial-aggregation tree, which would make `merge(states(day))` and
  * `states(month)` differ in the last bit and break the central equality
  * this operator exists to provide.
  *
  * Typical use: `states(fact, day-grain keys, value)` appended daily;
  * `merge(allStates, month-grain keys)` serves the rollup; a late
  * partition's correction is one more state row unioned in, then the
  * same merge.
  */
object PartialAgg {

  /** Per-group partial state of `value`: groupCols* → (cnt, sum, mn, mx).
    * `value` is cast through DECIMAL(28,4) for the sum leg (exact,
    * merge-order-free), so the stored state is DECIMAL(38,4) — overflow
    * bound 10^34, i.e. 10^20 rows of 10^14-valued measures before a
    * non-ANSI null could appear. The narrower DECIMAL(18,4) input cast
    * would have bounded the STATE at 10^24, reachable by a plausible
    * 100 TB × extreme-value corner; min/max keep the native type. */
  def states(
      df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(value).as("cnt"),
        sum(value.cast("decimal(28,4)")).as("sum"),
        min(value).as("mn"),
        max(value).as("mx"))

  /** Merge states down to a coarser grouping (any subset or derivation of
    * the state's group columns present on `st`). The output is again a
    * valid state: merge composes, so day→month→year chains reuse it. */
  def merge(st: DataFrame, groupCols: Seq[String]): DataFrame =
    st.groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Read-time report over a state: exact sum surfaced as double plus the
    * derived average — the columns a rollup consumer actually selects. */
  def report(st: DataFrame, groupCols: Seq[String]): DataFrame =
    st.select(groupCols.map(col) ++ Seq(
      col("cnt"),
      col("sum").cast("double").as("sum_value"),
      col("mn"), col("mx"),
      round(col("sum").cast("double") / col("cnt"), 6).as("avg_value")): _*)

  // ===== distinct-count states (HLL sketch columns) =====
  // COUNT(DISTINCT) is the aggregate that BREAKS the algebraic pattern
  // above — distinct counts don't add across states. The mergeable form
  // is the HyperLogLog sketch itself, stored as a binary column per
  // fine-grain group (Spark's Datasketches-backed hll_sketch_agg).
  // Merging preserves the DISTINCT-SET information (conceptually a
  // register-wise max under one hash), but Datasketches unions may
  // switch internal representation (sparse→dense, HLL_4→HLL_8) and
  // with it the estimator, so a merged estimate can differ from the
  // direct one-pass estimate by a sliver WITHIN the sketch's error —
  // bounded, not bit-identical (q126 and PartialAggSpec assert the
  // bound; the exact-equality claim fails in practice at sf0.01).

  /** Per-group HLL sketch state of `value`'s distinct set.
    * lgConfigK = 12 → 4 KiB registers, ~1.6% standard error. */
  def distinctStates(
      df: DataFrame, groupCols: Seq[String], value: Column,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(value, lit(lgConfigK)).as("sketch"))

  /** Merge distinct-count states to a coarser grouping; output is again
    * a state (composes, like [[merge]]). */
  def mergeDistinct(st: DataFrame, groupCols: Seq[String]): DataFrame =
    st.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  /** Estimated distinct count of a (possibly merged) state. */
  def distinctEstimate(sketch: Column): Column =
    hll_sketch_estimate(sketch)

  // ===== quantile states (KLL-style sketch columns) =====
  // Order statistics break the algebraic pattern the same way DISTINCT
  // does: medians don't add. The mergeable form is the quantile sketch
  // ([[graft.functions.QuantileSketchAgg]]) — exact (and merge-shape
  // independent) while a group holds ≤ k values, deterministic
  // parity-compaction beyond that with spec-measured rank error.

  private val shims = org.apache.spark.sql.graftshim.Shims

  /** Per-group quantile-sketch state of `value` (binary column). */
  def quantileStates(
      df: DataFrame, groupCols: Seq[String], value: Column,
      k: Int = 4096): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(shims.column(graft.functions.QuantileSketchAgg(
        shims.expression(value), k).toAggregateExpression()).as("qsketch"))

  /** Merge quantile states to a coarser grouping; output is again a
    * state (composes, like [[merge]] / [[mergeDistinct]]). */
  def mergeQuantiles(st: DataFrame, groupCols: Seq[String]): DataFrame =
    st.groupBy(groupCols.map(col): _*)
      .agg(shims.column(graft.functions.QuantileSketchUnion(
        shims.expression(col("qsketch"))).toAggregateExpression())
        .as("qsketch"))

  /** Discrete quantiles of a (possibly merged) state at `probs` —
    * percentile_disc rank semantics (item at cumulative weight ≥
    * max(1, ceil(q·n))); null for an empty sketch. */
  def quantileEstimate(sketch: Column, probs: Seq[Double]): Column =
    shims.column(graft.functions.SketchQuantiles(
      shims.expression(sketch),
      shims.expression(
        org.apache.spark.sql.functions.typedlit(probs.toArray))))
}
