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

  /** Per-invocation observe-name suffix (two sweeps in one plan must
    * not collide on a CollectMetrics name). */
  private val sweepMetricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

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

  /** Max-sequence-length sweep: the capacity-planning curve behind
    * choosing `max_len` for a training run. For each candidate length L
    * (one-sequence-per-doc padding model — the pre-packing baseline
    * every capacity memo starts from), reports how many documents
    * truncate, the token mass lost to truncation, and the padding waste
    * of topping every kept sequence up to L:
    *
    *   n_truncated    = |{docs : n_tokens > L}|
    *   tokens_kept    = Σ min(n_tokens, L)
    *   trunc_loss_frac = 1 − tokens_kept / tokens_total
    *   pad_frac       = (n_docs·L − tokens_kept) / (n_docs·L)
    *
    * Scale contract: ONE corpus pass — each doc's (n_tokens) row
    * explodes into |candidates| rows (a bounded constant, the sweep
    * grid), and the aggregate map-side-combines to |candidates| rows
    * per partition before the one skinny shuffle. All sums are exact
    * longs (token counts); the fraction columns are floor'd parts-per-
    * million computed in exact integer arithmetic (DECIMAL(38,0)
    * product, integral DIV) and only then divided by 1e6 as doubles —
    * float ROUND on a ratio can land exactly on a .5 tie whose
    * half-up/half-even resolution differs between engines (measured:
    * 8078/32000 at 6 decimals), while the integer floor is
    * engine-independent. */
  def lengthSweep(
      df: DataFrame, nTokensCol: String,
      candidates: Seq[Long]): DataFrame = {
    require(candidates.nonEmpty && candidates.forall(_ > 0),
      "candidates must be positive lengths")
    // null token counts can't be sequenced: counting them in n_docs
    // while the sums skip them would inflate the padding denominator
    // as if they were zero-length docs — drop them VISIBLY instead
    // (the repo's no-silent-drops observe discipline)
    df.select(col(nTokensCol).cast("bigint").as("__nt"))
      .observe(s"graft.packing.sweep.${sweepMetricSeq.incrementAndGet()}",
        count(when(col("__nt").isNull, 1)).as("null_token_rows_dropped"))
      .filter(col("__nt").isNotNull)
      .withColumn("max_len",
        explode(array(candidates.distinct.sorted.map(lit): _*)))
      .groupBy(col("max_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("__nt") > col("max_len"), 1)).as("n_truncated"),
        sum(col("__nt")).as("tokens_total"),
        sum(least(col("__nt"), col("max_len"))).as("tokens_kept"))
      // n_docs·max_len multiplies in DECIMAL(38,0), never in int64 —
      // BIGINT n_docs × a large candidate length overflows int64 at
      // corpus scale (ANSI: runtime error) before any cast can save it
      // (ADVICE r14). tokens_total = 0 (an all-empty-token corpus) makes
      // trunc_loss undefined — emit NULL instead of an ANSI
      // DIVIDE_BY_ZERO; pad_frac's denominator n_docs·max_len is > 0 by
      // construction (groups are non-empty, candidates are positive).
      .select(col("max_len"), col("n_docs"), col("n_truncated"),
        col("tokens_total"), col("tokens_kept"),
        when(col("tokens_total") === 0, lit(null).cast("double"))
          .otherwise(
            expr("CAST(tokens_total - tokens_kept AS DECIMAL(38,0)) " +
              "* 1000000 DIV CAST(tokens_total AS DECIMAL(38,0))")
              .cast("double") / lit(1e6)).as("trunc_loss_frac"),
        (expr("(CAST(n_docs AS DECIMAL(38,0)) " +
          "* CAST(max_len AS DECIMAL(38,0)) " +
          "- CAST(tokens_kept AS DECIMAL(38,0))) * 1000000 " +
          "DIV (CAST(n_docs AS DECIMAL(38,0)) " +
          "* CAST(max_len AS DECIMAL(38,0)))")
          .cast("double") / lit(1e6)).as("pad_frac"))
      .orderBy(col("max_len"))
  }
}
