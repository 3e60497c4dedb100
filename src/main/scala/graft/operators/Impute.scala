package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Null-imputation operators for feature / time-series pipelines.
  *
  * [[forwardFill]] is last-observation-carried-forward (LOCF): one window
  * pass per key — ONE shuffle on the key + a sort within partitions, no
  * self-join and no range explosion. Scale shape is identical to any
  * windowed aggregate: a hot key is a hot partition (pre-split a dominant
  * entity upstream if needed), everything else distributes freely.
  */
object Impute {

  /** Carry the last non-null value of each column in `cols` forward along
    * `orderCols` within each `keys` group. Rows before the first
    * observation stay null (compose with `coalesce`/`na.fill` for a
    * leading default). `orderCols` must be a total order within each key
    * group or the carried value is nondeterministic. */
  def forwardFill(
      df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Mirror of [[forwardFill]]: carry the NEXT non-null value backward
    * (NOCB). Same single-shuffle window shape, frame reversed. */
  def backwardFill(
      df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }
}
