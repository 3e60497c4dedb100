package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Shims

/** Bloom-prefiltered joins — the shuffle-volume lever for selective joins
  * at 100 TB.
  *
  * A plain shuffle semi/inner join moves EVERY probe-side row through the
  * exchange, even when the build side's keys would discard 99% of them on
  * arrival. The fix (the same one Spark's own `InjectRuntimeFilter` rule
  * applies when statistics allow): aggregate the build side's keys into a
  * Bloom filter — megabytes for hundreds of millions of keys — ship it to
  * the probe side's map tasks, and drop non-matching rows BEFORE the
  * shuffle. False positives survive the prefilter but are removed by the
  * real join that follows, so results are exact; the bloom only buys plan
  * efficiency.
  *
  * Built on the engine's own codegen'd expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair behind
  * `InjectRuntimeFilter`), composed explicitly so the prefilter applies
  * regardless of statistics, join shape, or AQE decisions. No UDFs: both
  * sides stay inside whole-stage codegen.
  */
object BloomJoin {

  /** Optimal bit count for `n` expected items at false-positive rate
    * `fpp` (standard Bloom sizing: m = -n·ln p / ln²2). */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Defensive clamp that mirrors `BloomFilterAggregate`'s own internal
    * cap: Spark 4.1.2 lazily `Math.min`s both numBits and
    * estimatedNumItems against the session confs
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, default 64 Mi
    * bits), so an oversized request never fails analysis — it is silently
    * capped. Clamping here makes that behavior explicit at the call site
    * and keeps the sizing math (`optimalNumBits`) honest about the bits
    * the filter will actually get: past the cap the effective fpp rises,
    * but results stay exact because the real join removes every false
    * positive. */
  private def clampNumBits(df: DataFrame, numBits: Long): Long = {
    val maxBits = df.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864")
      .toLong
    math.max(1L, math.min(numBits, maxBits))
  }

  /** Aggregate `key` of every row in `df` into a serialized Bloom filter.
    * One distributed pass with partial aggregation (per-partition blooms
    * merged by OR); the result is driver-held and bounded by `numBits`
    * regardless of row count — the broadcast-safety contract. */
  def buildBloom(
      df: DataFrame, key: Column,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Shims.expression(key))),
      Literal(expectedItems), Literal(clampNumBits(df, numBits)))
    val c = Shims.column(agg.toAggregateExpression())
    df.select(c.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Membership probe against a built bloom — codegen'd, usable in any
    * filter. May return true for absent keys (rate set by sizing), never
    * false for present ones.
    *
    * Probes through [[graft.functions.BloomProbe]] (filter bytes held
    * outside the expression tree) instead of
    * `BloomFilterMightContain(Literal(bytes), …)`: the binary literal
    * printed the WHOLE serialized filter as hex into every plan dump —
    * 359 KiB of executed-plan text at the q97 operating point, the
    * same driver-side plan-size pathology as r12's q129 (SCALING.md
    * round 13). Semantics identical: same XxHash64-then-
    * mightContainLong probe Spark's own expression performs — including
    * the EMPTY-build-side case: `BloomFilterAggregate.eval` returns
    * null for zero input rows, and `BloomFilterMightContain` of a null
    * bloom is null (filter drops every row → correct empty join);
    * a null `bloom` here maps to the same null-boolean column. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    if (bloom == null) lit(null).cast("boolean")
    else Shims.column(graft.functions.BloomProbe(
      new XxHash64(Seq(Shims.expression(key))), bloom))

  /** EXACT semi-join with a Bloom prefilter on the probe side: `big`
    * rows whose key fails the bloom never enter the join's shuffle; the
    * surviving rows go through a real semi-join that removes the bloom's
    * false positives. Result ≡ `big SEMI JOIN small` row-for-row — the
    * bloom changes the shuffle volume, not the answer (asserted by
    * BloomJoinSpec via PlanMetrics). */
  def semiJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(small, col(smallKey),
      expectedItems, optimalNumBits(expectedItems, fpp))
    val pre = big.filter(mightContain(bloom, col(bigKey)))
    pre.join(small, pre(bigKey) === small(smallKey), "left_semi")
  }

  /** Inner-join variant: same prefilter, then the real inner join. */
  def innerJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(small, col(smallKey),
      expectedItems, optimalNumBits(expectedItems, fpp))
    val pre = big.filter(mightContain(bloom, col(bigKey)))
    pre.join(small, pre(bigKey) === small(smallKey))
  }
}
