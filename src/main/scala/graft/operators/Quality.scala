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

  final case class RuleResult(rule: String, violations: Long, passed: Boolean)

  /** Violation predicate for a scalar rule (true = row violates). */
  private def violation(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case MatchesRegex(c, p) => col(c).isNotNull && !col(c).rlike(p)
    case AcceptedValues(c, vs) =>
      col(c).isNotNull && !col(c).isin(vs: _*)
    case _: Unique =>
      throw new IllegalArgumentException("unique handled separately")
  }

  /** Run every rule; returns one [[RuleResult]] per rule. */
  def check(df: DataFrame, rules: Seq[Rule]): Seq[RuleResult] = {
    val (uniques, scalars) = rules.partition(_.isInstanceOf[Unique])
    val scalarAggs = scalars.map(r =>
      sum(when(violation(r), 1L).otherwise(0L)).as(r.name))
    val uniqueAggs = uniques.map { case u @ Unique(cols) =>
      // distinct over a STRUCT of the columns: countDistinct(cols…) would
      // silently drop rows where any column is null, hiding duplicates
      (count(lit(1)) -
        countDistinct(struct(cols.map(col): _*))).as(u.name)
    }
    val aggs = scalarAggs ++ uniqueAggs
    if (aggs.isEmpty) return Seq.empty
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    (scalars ++ uniques).map { r =>
      val v = row.getAs[Long](r.name)
      RuleResult(r.name, v, v == 0L)
    }
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
