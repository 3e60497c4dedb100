package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch preparation: assign documents to
  * fixed-capacity token packs.
  *
  * Deterministic streaming packing: documents are laid out in a stable
  * order and a document goes to the pack where its first token lands
  * (`pack = tokens_before DIV capacity`). A boundary-straddling document
  * overflows its pack by < 1 document — the standard tradeoff vs exact
  * bin packing (NP-hard, and order-destroying).
  *
  * Scale note: packing needs a prefix sum, which is a WINDOW over the
  * layout order. A single global window would serialize on one reducer,
  * so the API packs WITHIN a partition column (shard) — each shard's
  * prefix sum runs parallel, and pack ids are (shard, local pack). Pick a
  * shard key with enough cardinality (hash bucket of the id works).
  */
object Packing {

  /** Adds `pack_id` (long, per shard) + `tokens_before` within the shard.
    * Layout order inside a shard = `orderCol` ascending, with `tieCols`
    * appended to the window order: a ROWS frame over duplicate `orderCol`
    * values has engine-chosen peer order, so without a unique
    * (orderCol, tieCols) combination per shard, `tokens_before`/`pack_id`
    * would vary run to run. Callers with a unique orderCol (e.g. doc_id)
    * can omit tieCols. */
  def assignPacks(
      df: DataFrame,
      shardCol: String,
      orderCol: String,
      nTokensCol: String,
      capacity: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col(orderCol) +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tokens_before",
      sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .withColumn("pack_id", expr(s"tokens_before DIV $capacity"))
  }

  /** Per-pack fill report: docs, tokens, utilization of capacity. */
  def packReport(
      assigned: DataFrame, shardCol: String,
      nTokensCol: String, capacity: Long): DataFrame =
    assigned.groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(nTokensCol)).cast("bigint").as("n_tokens"))
      .withColumn("utilization",
        round(col("n_tokens").cast("double") / capacity, 4))
      .orderBy(col(shardCol), col("pack_id"))
}
