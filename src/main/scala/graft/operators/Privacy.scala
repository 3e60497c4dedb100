package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-audit operators over quasi-identifier (QI) projections — the
  * release-gating side of the PII story ([[graft.functions.TextFunctions]]
  * scans free text; this audits STRUCTURED columns before a dataset or a
  * training corpus's metadata sidecar ships).
  *
  * k-anonymity (Samarati & Sweeney 1998): every row must share its QI
  * combination with ≥ k−1 others, or the group is re-identifiable.
  * l-diversity (Machanavajjhala et al., ICDE 2006): a k-anonymous group
  * whose sensitive attribute is constant still leaks — require ≥ l
  * distinct sensitive values per group.
  *
  * Scale shape: both audits are ONE map-combined groupBy on the QI
  * columns — the partial aggregate collapses each mapper's rows to one
  * row per (mapper, QI group) before the shuffle, so shuffled volume is
  * bounded by |QI groups| × mappers, never row count. The exact distinct
  * count of the sensitive column rides the same aggregate (Spark plans
  * a two-phase distinct expand on the SAME key — no extra data-sized
  * shuffle). NULL QI values form their own visible group (an all-null QI
  * row is still a quasi-identifier in the release).
  */
object Privacy {

  /** The one audit relation all three twins share — batch-exact,
    * batch-capped, and the streaming window (which prepends the
    * event-time window to `keys`): (keys..., n, n_sensitive,
    * k_anonymous, l_diverse), parameterized by the distinct aggregate
    * (exact `countDistinct` vs the capped
    * [[graft.functions.DistinctUpTo]]). Keeping the shape in ONE place
    * is what the twins' flag-parity tests actually pin — a semantics
    * change lands everywhere or nowhere. */
  private[graft] def auditRelation(
      df: DataFrame, keys: Seq[Column], sensitiveAgg: Column,
      k: Int, l: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one grouping column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), sensitiveAgg.as("n_sensitive"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Per-QI-group audit: the QI columns plus
    * (n, n_sensitive, k_anonymous, l_diverse). `sensitive` is any
    * expression (typically a generalization bucket, e.g.
    * `floor(salary/10000)` — auditing the generalized release, not the
    * raw value). */
  def anonymityAudit(
      df: DataFrame, qiCols: Seq[String], sensitive: Column,
      k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    auditRelation(df, qiCols.map(col), countDistinct(sensitive), k, l)
  }

  /** [[anonymityAudit]] with the distinct count CAPPED at l — the
    * 100 TB (and streaming) form: the l-diversity test only asks "≥ l
    * distinct?", so [[graft.functions.DistinctUpTo]] keeps ≤ l longs of
    * state per group instead of the exact distinct's
    * cardinality-proportional state + two-phase expand. Flags are
    * IDENTICAL to the exact audit's (min(d, l) ≥ l ⟺ d ≥ l);
    * n_sensitive saturates at l by contract. Sensitive must be an
    * integral generalization bucket (the aggregate's contract). */
  def anonymityAuditCapped(
      df: DataFrame, qiCols: Seq[String], sensitive: Column,
      k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    auditRelation(df, qiCols.map(col),
      graft.functions.DistinctUpTo.column(sensitive, l), k, l)
  }

  /** The suppress-to-k RELEASE: rows whose QI group has ≥ k members —
    * the enforcement step behind [[anonymityAudit]]'s flags. Null QI
    * values group together (null-safe key equality), matching the
    * audit's "null QI is still a group" contract — a plain equi-join
    * would silently suppress every null-QI row regardless of group
    * size. Scale: one map-combined group-size aggregate semi-joined
    * back on the QI key — group-sized build side, co-partitioned with
    * the probe's shuffle. */
  def suppressToK(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val kept = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k)
      .select(qiCols.map(c => col(c).as(s"__k_$c")): _*)
    val cond = qiCols.map(c => df(c) <=> kept(s"__k_$c")).reduce(_ && _)
    df.join(kept, cond, "left_semi")
  }

  /** Release summary — ONE row: total rows, QI groups, rows living in
    * groups below k (the suppression set under suppress-to-k), and that
    * set's share as floor-ppm (exact integer arithmetic: Spark's partial
    * aggregation order can't move a half-ulp the oracle lands
    * differently — the q173/q174 lesson). */
  def suppressionSummary(
      df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__n") < k, col("__n")).otherwise(lit(0L)))
          .as("rows_below_k"))
      .withColumn("suppressed_ppm",
        expr("CAST(rows_below_k AS DECIMAL(38,0)) * 1000000 " +
          "DIV CAST(n_rows AS DECIMAL(38,0))").cast("long"))
  }
}
