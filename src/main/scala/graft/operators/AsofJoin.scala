package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single right row
  * with the greatest `rightTs <= leftTs` within the same key group
  * (optionally within `tolerance`).
  *
  * Spark has no as-of join operator; the scale-correct composition is the
  * union + carry-forward-window trick rather than a range join:
  *
  *  1. union left (tagged 1) and right (tagged 0) rows on a common layout;
  *  2. one window per key ordered by (ts, tag): `last(payload, ignoreNulls)`
  *     over unbounded-preceding carries the most recent right payload
  *     forward onto each left row;
  *  3. keep left rows.
  *
  * Cost: ONE shuffle of (|L|+|R|) rows by key + a sort within partitions —
  * the same shape as a sort-merge join, with none of the range-explosion a
  * `l.ts >= r.ts` theta-join would produce. Skew behaves like any window
  * (one hot key = one hot partition; pre-split hot keys upstream if needed).
  *
  * Tie semantics: a right row at exactly `leftTs` matches (tag orders
  * right-before-left within equal ts). Among equal (key, ts) right rows the
  * last by `rightPayloadOrder` wins deterministically.
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val reserved = Seq("__ts", "__tag", "__rpay", "__match", "__m")
    require(!left.columns.exists(reserved.contains),
      s"left frame uses reserved column names: ${reserved.mkString(", ")}")
    val keyCols = keys.map(col)
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rpay",
        lit(null).cast(structType(right, rightPayload ++ Seq(rightTs))))
    val rTagged = right
      .select(keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__tag") :+
        struct((rightPayload :+ rightTs).map(col): _*).as("__rpay"): _*)
    // align schemas: left keeps all its columns; right contributes only
    // key/ts/payload (left columns null on right rows)
    val leftCols = left.columns.toSeq
    val rAligned = leftCols.foldLeft(rTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols ++ Seq("__ts", "__tag", "__rpay")).map(col): _*)
    val unioned = lTagged
      .select((leftCols ++ Seq("__ts", "__tag", "__rpay")).map(col): _*)
      .unionByName(rAligned)

    // final order key: the payload struct itself, so equal-(key,ts) right
    // rows resolve deterministically (max payload wins)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__tag"), col("__rpay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val withinTol = tolerance match {
      case Some(tol) =>
        when(col("__match").isNotNull &&
          (col("__ts") - col(s"__match.$rightTs")) <= tol, col("__match"))
      case None => col("__match")
    }
    val out = carried.withColumn("__m", withinTol)
    rightPayload.foldLeft(out) { (df, p) =>
      df.withColumn(s"asof_$p", col(s"__m.$p"))
    }.drop("__ts", "__tag", "__rpay", "__match", "__m")
  }

  /** Forward as-of join: for each left row, the single right row with the
    * SMALLEST `rightTs >= leftTs` per key — the mirror of [[asofBackward]],
    * implemented by negating the ts columns and reusing the same
    * union + carry-forward window (still ONE shuffle, no range join).
    * Numeric (epoch-tick) ts columns only, since negation must be exact.
    * A right row at exactly `leftTs` matches; `tolerance` bounds
    * `rightTs - leftTs`, expressed in the ts columns' own ticks
    * (epoch µs for [[EventTime.tsMicros]]-normalized columns). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(Seq(left.schema(leftTs), right.schema(rightTs)).forall(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]),
      "asofForward negates ts columns: numeric epoch-tick ts required")
    val ln = left.withColumn("__nlts", -col(leftTs))
    val rn = right.withColumn("__nrts", -col(rightTs))
    // tolerance transfers exactly: backward checks __ts - match.rightTs =
    // (-leftTs) - (-rightTs) = rightTs - leftTs <= tol, the forward gap.
    asofBackward(ln, rn, keys, "__nlts", "__nrts", rightPayload, tolerance)
      .drop("__nlts")
  }

  private def structType(
      df: DataFrame, fields: Seq[String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      fields.map(f => org.apache.spark.sql.types.StructField(
        f, df.schema(f).dataType, nullable = true)))
}
