package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder: turn an append-only change
  * log into validity-interval rows — the standard warehouse shape for
  * "what was this entity's attribute value at time t" (Kimball SCD2),
  * and the training-data shape for point-in-time-correct feature joins
  * (serve a model the attribute values that were true WHEN the example's
  * event happened, never later ones — leakage prevention; pairs with
  * [[AsofJoin]] on `valid_from`).
  *
  * Scale design: both windows (change compression, interval close) are
  * partitioned by the SAME entity key, so Catalyst plans ONE shuffle and
  * sorts once per partition — the whole build is a single exchange over
  * the log regardless of row count. No driver state, no collect.
  */
object Scd2 {

  /** Build SCD2 rows from a change log.
    *
    * Input: one row per observation `(key, ts, attrs…)`; `(key, ts)` is
    * assumed unique (a log with ties needs a tie-breaking sequence column
    * folded into `tsCol` upstream). Steps:
    *
    *  1. change compression — consecutive observations of the SAME
    *     attribute tuple collapse into their first row (`lag` over the
    *     key window; null-safe struct compare, so a null attribute is a
    *     value, not a wildcard);
    *  2. interval close — `valid_from` = the change's ts, `valid_to` =
    *     the NEXT change's ts (exclusive), null while current;
    *     `is_current` marks each key's open row.
    *
    * Output columns: keyCols ++ attrCols ++ (valid_from, valid_to,
    * is_current), with valid_from/valid_to typed as `tsCol`.
    */
  def fromChangeLog(
      log: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val attrs = struct(attrCols.map(col): _*)
    log
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols ++
        Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }

  /** Point-in-time lookup against an SCD2 table: the attribute row whose
    * `[valid_from, valid_to)` interval contains `atTs` for each key —
    * an equi-join on the key plus the interval predicate evaluated in
    * the same stage (shuffle on key only; intervals per key are few). */
  def asOf(
      scd2: DataFrame, probes: DataFrame, keyCols: Seq[String],
      atTsCol: String): DataFrame =
    probes.join(scd2, keyCols)
      .filter(col(atTsCol) >= col("valid_from") &&
        (col("valid_to").isNull || col(atTsCol) < col("valid_to")))
}
