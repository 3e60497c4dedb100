package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkTestBase {

  private lazy val li = spark.read.parquet(s"$sf001/lineitem.parquet")
  private lazy val urgent = spark.read.parquet(s"$sf001/orders.parquet")
    .filter(col("o_orderpriority") === "1-URGENT")

  test("bloom has no false negatives: every present key passes") {
    val bloom = BloomJoin.buildBloom(urgent, col("o_orderkey"),
      expectedItems = 10000L, numBits = BloomJoin.optimalNumBits(10000L, 0.03))
    val misses = urgent
      .filter(!BloomJoin.mightContain(bloom, col("o_orderkey")))
      .count()
    assert(misses == 0, s"$misses present keys failed the bloom")
  }

  test("probe keeps the serialized filter out of the plan text") {
    // A ~1M-key bloom serializes to ~100s of KiB; as a BinaryType
    // Literal Spark prints it as hex into every plan dump (the q97
    // pathology, 359 KiB of executed-plan text). BloomProbe holds the
    // bytes outside the printable tree — assert the plan stays small
    // no matter how big the filter is, and names the probe.
    val bloom = BloomJoin.buildBloom(urgent, col("o_orderkey"),
      expectedItems = 1000000L,
      numBits = BloomJoin.optimalNumBits(1000000L, 0.01))
    assert(bloom.length > 100 * 1024, s"filter only ${bloom.length}B")
    val df = li.filter(BloomJoin.mightContain(bloom, col("l_orderkey")))
    df.count() // force the FINAL (AQE-resolved) executed plan
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("bloom_probe("), plan.take(500))
    assert(plan.length < 20 * 1024,
      s"executed plan text is ${plan.length}B — filter leaked into it")
  }

  test("empty build side: probe is null-boolean, joins return empty") {
    // BloomFilterAggregate.eval returns NULL for zero input rows, so
    // buildBloom on an empty frame yields null. The probe must map that
    // to a null boolean (filter drops every row — the semantics of
    // Spark's own BloomFilterMightContain over a null bloom), not NPE.
    val none = urgent.filter(lit(false))
    val bloom = BloomJoin.buildBloom(none, col("o_orderkey"),
      expectedItems = 10L, numBits = 1024L)
    assert(bloom == null)
    assert(li.filter(BloomJoin.mightContain(bloom, col("l_orderkey")))
      .count() == 0)
    assert(BloomJoin.semiJoin(li, none,
      "l_orderkey", "o_orderkey", expectedItems = 10L).count() == 0)
    intercept[IllegalArgumentException] { // direct null-bytes construction
      graft.functions.BloomProbe(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), null)
    }
  }

  test("prefiltered semi-join is row-identical to the plain semi-join") {
    val viaBloom = BloomJoin.semiJoin(li, urgent,
      "l_orderkey", "o_orderkey", expectedItems = 10000L)
    val plain = li.join(urgent,
      li("l_orderkey") === urgent("o_orderkey"), "left_semi")
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(viaBloom).count() == 0)
  }

  test("bloom prefilter cuts the probe side's shuffle volume") {
    // force the shuffle-join shape (the 100 TB case: neither side
    // broadcastable) and compare records moved with and without the
    // bloom prefilter on the probe side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = li.join(urgent,
        li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      val mPlain = PlanMetrics.shuffleSummary(plain)
      val pre = BloomJoin.semiJoin(li, urgent,
        "l_orderkey", "o_orderkey", expectedItems = 10000L, fpp = 0.01)
      val mBloom = PlanMetrics.shuffleSummary(pre)
      // urgent is ~1/5 of orders, so ~4/5 of lineitem should be dropped
      // before the exchange (modulo the bloom's 1% false positives)
      assert(mBloom.shuffleRecords < mPlain.shuffleRecords / 2,
        s"bloom moved ${mBloom.shuffleRecords} records vs " +
          s"plain ${mPlain.shuffleRecords}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("inner variant matches the plain inner join") {
    val viaBloom = BloomJoin.innerJoin(
      li.select("l_orderkey", "l_quantity"), urgent,
      "l_orderkey", "o_orderkey", expectedItems = 10000L)
      .groupBy().agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).as("q"))
    val plain = li.select("l_orderkey", "l_quantity").join(urgent,
      col("l_orderkey") === urgent("o_orderkey"))
      .groupBy().agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).as("q"))
    assert(viaBloom.head() == plain.head())
  }

  test("numBits above the session ceiling clamps instead of failing") {
    // 50M expected items at fpp=0.03 sizes to ~365M bits — past
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits (64 Mi).
    // Spark 4.1.2's BloomFilterAggregate itself lazily Math.min's the
    // request against the conf (verified below), so the clamp in
    // BloomJoin is defensive documentation of that cap, not a crash
    // guard. Either way the effective fpp rises and the real join keeps
    // the result exact.
    assert(BloomJoin.optimalNumBits(50000000L, 0.03) > 67108864L)
    // RAW oversized request straight into the aggregate — no clamp —
    // must succeed and return a usable (capped) filter
    val rawAgg = new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
          org.apache.spark.sql.graftshim.Shims
            .expression(col("o_orderkey")))),
        org.apache.spark.sql.catalyst.expressions.Literal(50000000L),
        org.apache.spark.sql.catalyst.expressions.Literal(365000000L))
    val rawBytes = urgent
      .agg(org.apache.spark.sql.graftshim.Shims
        .column(rawAgg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    assert(rawBytes != null && rawBytes.nonEmpty &&
      rawBytes.length <= 67108864 / 8 + 1024) // capped, not 365M bits
    val viaBloom = BloomJoin.semiJoin(li, urgent,
      "l_orderkey", "o_orderkey", expectedItems = 50000000L, fpp = 0.03)
    val plain = li.join(urgent,
      li("l_orderkey") === urgent("o_orderkey"), "left_semi")
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.exceptAll(plain).count() == 0)
  }

  test("optimalNumBits follows the standard sizing curve") {
    // 1M items at 3% fpp needs ~7.3 bits/item; tighter fpp needs more
    val b3 = BloomJoin.optimalNumBits(1000000L, 0.03)
    assert(b3 > 7000000L && b3 < 7600000L, s"unexpected sizing: $b3")
    assert(BloomJoin.optimalNumBits(1000000L, 0.01) > b3)
    intercept[IllegalArgumentException] {
      BloomJoin.optimalNumBits(100L, 1.5)
    }
  }
}
