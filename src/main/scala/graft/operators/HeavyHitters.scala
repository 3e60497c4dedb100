package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims

import graft.functions.MisraGriesCandidates

/** EXACT heavy hitters without a full-cardinality shuffle — the two-pass
  * sketch-then-verify shape (the same contract as the dedup chains: a
  * bounded candidate stage that may over-report, closed by an exact
  * stage that never errs).
  *
  * Pass 1 folds the column into per-partition Misra-Gries summaries
  * ([[graft.functions.MisraGriesCandidates]]) — O(capacity) state per
  * partition, a few KB shuffled regardless of row count — whose merged
  * candidate set PROVABLY contains every item with frequency
  * > n/(capacity+1). Pass 2 exact-counts ONLY the candidate rows (an
  * `isin` literal prefilter that survives pushdown to the scan) and
  * applies the threshold, so the result is exactly "items with count ≥
  * ceil(theta·n)" — deterministic, layout-independent, oracle-checkable
  * against a plain GROUP BY … HAVING.
  *
  * vs `groupBy(col).count().filter(...)` at 100 TB: that plan shuffles
  * one row per DISTINCT key (billions for URLs/tokens/user-ids) to keep
  * the handful above threshold; this plan's first pass shuffles
  * `capacity` counters per partition and the second only the candidate
  * rows' partial counts.
  *
  * The candidate array is driver-held, bounded by `capacity` (k-row by
  * construction — the IVF-centroid justification).
  */
object HeavyHitters {

  /** Misra-Gries candidate aggregate as a [[Column]]: returns the sorted
    * candidate item array (a superset of items with freq > n/(cap+1)). */
  def mgCandidates(c: Column, capacity: Int): Column =
    Shims.column(MisraGriesCandidates(Shims.expression(c), capacity)
      .toAggregateExpression())

  /** Exact items of `df.col(colName)` with count ≥ ceil(theta·n), where n
    * is the non-null row count. `slack` > 1 sizes the sketch capacity at
    * `ceil(slack/theta)` so the guarantee `n/(capacity+1) < theta·n`
    * holds with margin (capacity ≥ 1/theta is the tight bound).
    * Output: (colName, cnt) — exact counts, threshold applied. */
  def exact(
      df: DataFrame, colName: String, theta: Double,
      slack: Double = 2.0): DataFrame = {
    require(theta > 0 && theta < 1, s"theta must be in (0,1), got $theta")
    require(slack >= 1.0, s"slack must be >= 1, got $slack")
    val capacity = math.max(math.ceil(slack / theta).toInt, 2)
    val head = df.agg(
      mgCandidates(col(colName), capacity).as("cand"),
      count(col(colName)).as("n")).head()
    val candidates = head.getSeq[Any](0)
    val n = head.getLong(1)
    df.filter(col(colName).isin(candidates: _*))
      .groupBy(col(colName))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= ceil(lit(theta) * lit(n)).cast("long"))
  }
}
