package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each user's event stream into sessions at
  * inactivity gaps — the batch complement of the streaming
  * `flatMapGroupsWithState` sessionizer in
  * [[graft.streaming.EventStreams]] (same gap semantics, replayable over
  * history).
  *
  * Plan shape: ONE shuffle (hash partition by user) feeding two window
  * passes over the same ordering — `lag` to flag gap starts, running
  * `sum` to number sessions. No self-join, no global sort; each user's
  * timeline sessionizes independently, so the shape holds at any user
  * count (the per-user row count, not the corpus, bounds window state).
  */
object Sessionize {

  /** Adds `session_id` (0-based per user): a new session starts when the
    * gap from the previous event exceeds `gapTicks` (same unit as
    * `tsCol` — pass microseconds for microsecond timestamps).
    * `tieCols` disambiguate equal timestamps so numbering is
    * deterministic (same contract as [[Packing.assignPacks]]). */
  def assign(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gapTicks: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(gapTicks >= 0, s"gap must be >= 0 ticks, got $gapTicks")
    val order = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new",
      when(col(tsCol) - lag(col(tsCol), 1).over(w) > gapTicks, 1L)
        .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .drop("__new")
  }

  /** Per-session rollup: event count and [start, end] in tsCol ticks. */
  def sessionStats(
      assigned: DataFrame, userCol: String, tsCol: String): DataFrame =
    assigned.groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))
}
