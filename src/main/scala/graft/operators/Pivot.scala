package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot helpers.
  *
  * The reference's pivot is STATIC (8 hard-coded bookmakers → 24 columns,
  * SURVEY.md §2.3 N6) — that form is plain select expressions. This is the
  * DYNAMIC complement: when the pivot values aren't known ahead, discover
  * them in a first (cheap, distinct) pass and pivot in the second.
  * Passing the discovered list to `pivot(col, values)` matters at scale:
  * the one-arg `pivot(col)` does the same discovery implicitly but
  * without a cap or deterministic order.
  */
object Pivot {

  /** Two-pass dynamic pivot: distinct values (bounded by `maxValues`,
    * sorted for stable column order), then count per cell with 0-fill. */
  def dynamicCountPivot(
      df: DataFrame,
      groupCol: String,
      pivotCol: String,
      maxValues: Int = 100): DataFrame = {
    val values = df.select(col(pivotCol)).distinct()
      .orderBy(col(pivotCol))
      .limit(maxValues + 1)
      .collect().map(_.get(0)).toSeq
    require(values.size <= maxValues,
      s"$pivotCol has more than $maxValues distinct values; " +
        "dynamic pivot would explode the schema")
    val pivoted = df.groupBy(col(groupCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
    val filled: Seq[Column] = col(groupCol) +:
      values.map(v => coalesce(col(s"`$v`"), lit(0L)).as(v.toString))
    pivoted.select(filled: _*).orderBy(col(groupCol))
  }
}
