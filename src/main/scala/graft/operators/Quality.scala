package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the validation gate a pipeline
  * runs at table boundaries (post-ingest, pre-publish).
  *
  * All scalar rules are evaluated in ONE aggregation pass (conditional
  * counts), so a 100-rule suite costs a single scan; uniqueness rules
  * each add one distinct-count aggregate in the same pass.
  */
object Quality {

  sealed trait Rule { def name: String }
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }
  final case class InRange(column: String, min: Double, max: Double)
      extends Rule {
    val name = s"in_range($column,[$min,$max])"
  }
  final case class MatchesRegex(column: String, pattern: String)
      extends Rule {
    val name = s"matches_regex($column)"
  }
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Rule {
    val name = s"accepted_values($column)"
  }
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique(${columns.mkString(",")})"
  }
  /** Referential integrity: every non-null `columns` tuple must exist in
    * `ref`'s `refColumns`. Unlike the scalar rules this needs a join, not
    * a conditional count — it runs as a LEFT ANTI join against the
    * de-duplicated reference keys (broadcast when the dim is small,
    * shuffle-hash otherwise; Catalyst picks), one extra job per FK rule. */
  final case class ForeignKey(
      columns: Seq[String], ref: DataFrame, refColumns: Seq[String],
      refName: String = "ref")
      extends Rule {
    require(columns.length == refColumns.length,
      "FK column lists must align")
    val name = s"foreign_key(${columns.mkString(",")}->$refName)"
  }

  final case class RuleResult(rule: String, violations: Long, passed: Boolean)

  /** Violation predicate for a scalar rule (true = row violates). */
  private def violation(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case MatchesRegex(c, p) => col(c).isNotNull && !col(c).rlike(p)
    case AcceptedValues(c, vs) =>
      col(c).isNotNull && !col(c).isin(vs: _*)
    case _: Unique | _: ForeignKey =>
      throw new IllegalArgumentException("join-based rule handled separately")
  }

  /** Orphan rows for one FK rule (non-null keys absent from the ref). */
  private def fkViolations(df: DataFrame, fk: ForeignKey): DataFrame = {
    val keyed = df.filter(fk.columns.map(col(_).isNotNull).reduce(_ && _))
      .select(fk.columns.map(col): _*)
    val refKeys = fk.ref
      .select(fk.refColumns.zip(fk.columns).map { case (rc, c) =>
        col(rc).as(c)
      }: _*).distinct()
    keyed.join(refKeys, fk.columns, "left_anti")
  }

  /** Ordered rules + their single-pass aggregate columns (FK rules are
    * join-based and excluded — callers handle them separately). */
  private def aggsFor(rules: Seq[Rule]): (Seq[Rule], Seq[Column]) = {
    val (uniques, scalars) = rules
      .filterNot(_.isInstanceOf[ForeignKey])
      .partition(_.isInstanceOf[Unique])
    val scalarAggs = scalars.map(r =>
      sum(when(violation(r), 1L).otherwise(0L)).as(r.name))
    val uniqueAggs = uniques.map { case u @ Unique(cols) =>
      // distinct over a STRUCT of the columns: countDistinct(cols…) would
      // silently drop rows where any column is null, hiding duplicates
      (count(lit(1)) -
        countDistinct(struct(cols.map(col): _*))).as(u.name)
    }
    (scalars ++ uniques, scalarAggs ++ uniqueAggs)
  }

  /** Run every rule; returns one [[RuleResult]] per rule. */
  def check(df: DataFrame, rules: Seq[Rule]): Seq[RuleResult] = {
    val (ordered, aggs) = aggsFor(rules)
    val scalarResults = if (aggs.isEmpty) Seq.empty else {
      val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
      ordered.map { r =>
        val v = row.getAs[Long](r.name)
        RuleResult(r.name, v, v == 0L)
      }
    }
    val fkResults = rules.collect { case fk: ForeignKey =>
      val v = fkViolations(df, fk).count()
      RuleResult(fk.name, v, v == 0L)
    }
    scalarResults ++ fkResults
  }

  /** Same single-pass check as a DataFrame (rule, violations, passed) —
    * the queryable/publishable form: the one aggregate row is unpivoted
    * into rule rows, no driver-side collect in the plan. */
  def checkAsFrame(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val (ordered, aggs) = aggsFor(rules)
    val fks = rules.collect { case fk: ForeignKey => fk }
    require(aggs.nonEmpty || fks.nonEmpty, "at least one rule required")
    val scalarFrame = if (aggs.isEmpty) None else {
      val pairs = ordered.map(r =>
        // backticks: rule names contain '.' ("[0.0,1.0]"), which a bare
        // col() would parse as struct-field access
        struct(lit(r.name).as("rule"), col(s"`${r.name}`").as("violations")))
      Some(df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(pairs: _*)).as("__r"))
        .select(col("__r.rule").as("rule"),
          col("__r.violations").as("violations")))
    }
    val fkFrames = fks.map(fk =>
      fkViolations(df, fk).agg(count(lit(1)).as("violations"))
        .select(lit(fk.name).as("rule"), col("violations")))
    (scalarFrame.toSeq ++ fkFrames).reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
  }

  /** Observed pipeline counters — metrics at ZERO extra scans: `observe`
    * attaches named aggregates to the frame itself, collected as a side
    * effect of whatever action the caller already runs. At 100 TB this is
    * the difference between "row counts for free" and a second full pass.
    * Read the values after an action with [[observedValues]]. */
  def withCounters(
      df: DataFrame, name: String,
      counters: Map[String, Column]): DataFrame = {
    require(counters.nonEmpty, "at least one counter required")
    val aggs = counters.map { case (n, c) => c.as(n) }.toSeq
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** Values of an observation after an action has executed the frame.
    * The action must run THIS frame's own QueryExecution — `collect`,
    * `foreach`, or `toLocalIterator`. NEITHER `count()` (derived
    * aggregate plan) NOR `write` (fresh command QueryExecution) populate
    * this frame's observation; for metrics on a write, register a
    * `QueryExecutionListener` (or use streaming progress, where each
    * micro-batch surfaces observed metrics — see EventStreamsSpec). */
  def observedValues(df: DataFrame, name: String): Map[String, Any] = {
    val row = df.queryExecution.observedMetrics.getOrElse(name,
      throw new NoSuchElementException(
        s"no observation '$name' — did an action run?"))
    row.schema.fieldNames.map(f => f -> row.getAs[Any](f)).toMap
  }

  /** Gate form: throws with a readable report when any rule fails. */
  def enforce(df: DataFrame, rules: Seq[Rule]): Unit = {
    val failed = check(df, rules).filter(!_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "data-quality gate failed: " + failed
          .map(f => s"${f.rule} (${f.violations} violations)")
          .mkString("; "))
  }
}
