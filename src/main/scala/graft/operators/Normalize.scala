package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization of a per-document signal onto a curated
  * REFERENCE distribution — the CCNet move: per-source score scales
  * are incomparable (one crawl's "0.7" is another's "0.3"), so each
  * document is re-expressed as the reference-corpus value at its own
  * within-source rank position. After normalization a single global
  * threshold means the same thing for every source.
  *
  * All rank arithmetic is INTEGER (ranks, counts, floor division onto
  * a k-point grid) — no float percentiles — so the result is exactly
  * reproducible on any engine and independent of partition layout.
  *
  * Scale shape: the crawl side does one rank window PER SOURCE
  * (partitioned — scales out) plus a broadcast join against the k+1
  * grid rows. The reference side is ranked in a single partition by
  * design: the curated reference corpus (wiki-grade seed data) is
  * orders of magnitude smaller than the crawl — the caller's contract,
  * matching the bounded-collect convention of the IVF/mixing
  * operators. The grid, not the reference, is what the crawl joins.
  */
object Normalize {

  /** Map each row's `scoreCol` to the reference value at the same
    * quantile position, on a k-point grid.
    *
    * Grid: grid(i) = reference score at rank `1 + ((m-1)*i) div k`
    * (m = reference row count, ranks ordered by (score, id) for
    * determinism). A document with within-source rank r of n maps to
    * grid index `((r-1)*k) div (n-1)` (0 when n = 1), so the lowest
    * doc per source lands on grid(0), the highest on grid(k).
    * Output: input columns + `normalized`.
    */
  def quantileNormalize(
      cur: DataFrame,
      ref: DataFrame,
      idCol: String,
      scoreCol: String,
      sourceCol: String,
      k: Int = 10,
      maxRefRows: Long = 10000000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // Fail-fast contract enforcement, not just prose: the reference is
    // ranked in ONE partition, so a caller passing a crawl-sized frame
    // as `ref` would melt a single executor. The count() is the one
    // action the ref side pays; an empty reference would otherwise
    // silently drop every input row through the grid inner join.
    val m = ref.count()
    require(m > 0, "quantileNormalize: reference corpus is empty — " +
      "the grid join would silently drop every input row")
    require(m <= maxRefRows, s"quantileNormalize: reference has $m rows, " +
      s"over the single-partition ranking bound maxRefRows=$maxRefRows; " +
      "pass a curated (small) reference, or raise maxRefRows knowingly")
    // Bounded-by-contract reference: one ordered pass, m rows.
    val ranked = ref.select(col(scoreCol).as("__ref_score"),
        col(idCol).as("__ref_id"))
      .withColumn("__g", row_number().over(
        Window.orderBy(col("__ref_score"), col("__ref_id"))))
    // k+1 grid rows: i -> reference score at rank 1 + ((m-1)*i) div k.
    // Integer DIV throughout — float division could truncate across an
    // integer boundary and break cross-engine exactness.
    val grid = ranked.sparkSession.range(k + 1L)
      .select(col("id").as("__i"))
      .crossJoin(ranked)
      .filter(expr(s"__g = 1 + ((${m}L - 1) * __i) DIV $k"))
      .select(col("__i"), col("__ref_score").as("normalized"))

    // Per-source serial rank (the q187 window class): a hot source
    // ranks on one task. Fixable with the round-16 salted two-phase
    // rank ONLY if the order key is salt-bucketable — here the order is
    // (score, id), so the salt would be a score range, i.e. value-level
    // pre-bucketing, which is this operator's documented degrade path
    // already. Measure before reworking (the q182_hotcut rejection).
    val bySrc = Window.partitionBy(col(sourceCol))
    cur
      .withColumn("__r", row_number().over(
        bySrc.orderBy(col(scoreCol), col(idCol))))
      .withColumn("__n", count(lit(1)).over(bySrc))
      .withColumn("__i",
        when(col("__n") === 1, lit(0L))
          .otherwise(expr(s"((__r - 1) * CAST($k AS BIGINT)) DIV (__n - 1)")))
      .join(broadcast(grid), Seq("__i"))
      .drop("__i", "__r", "__n")
  }
}
