package graft

import org.apache.spark.sql.functions._
import graft.operators.PartialAgg

class PartialAggSpec extends SparkTestBase {

  private lazy val fact = spark.read.parquet(s"$sf001/orders.parquet")
    .withColumn("day", to_date(col("o_orderdate")))

  private def direct(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("month"), col("o_orderpriority"))
      .agg(count(col("o_totalprice")).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("sum"),
        min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))

  test("merge of daily states equals direct aggregation at month grain") {
    val daily = PartialAgg.states(fact, Seq("day", "o_orderpriority"),
      col("o_totalprice"))
    val monthly = PartialAgg.merge(
      daily.withColumn("month", trunc(col("day"), "month")),
      Seq("month", "o_orderpriority"))
    val expected = direct(fact.withColumn("month", trunc(col("day"), "month")))
    val got = monthly.collect()
      .map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3), r.get(4), r.get(5)))
      .toMap
    val want = expected.collect()
      .map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3), r.get(4), r.get(5)))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("incremental update: old states + delta states merge to the full answer") {
    val old = fact.filter(col("o_orderkey") % 7 =!= 0)
    val delta = fact.filter(col("o_orderkey") % 7 === 0)
    val incremental = PartialAgg.merge(
      PartialAgg.states(old, Seq("day", "o_orderpriority"), col("o_totalprice"))
        .unionByName(PartialAgg.states(delta, Seq("day", "o_orderpriority"),
          col("o_totalprice")))
        .withColumn("month", trunc(col("day"), "month")),
      Seq("month", "o_orderpriority"))
    val full = PartialAgg.merge(
      PartialAgg.states(fact, Seq("day", "o_orderpriority"),
        col("o_totalprice"))
        .withColumn("month", trunc(col("day"), "month")),
      Seq("month", "o_orderpriority"))
    val a = incremental.collect()
      .map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3), r.get(4), r.get(5)))
      .toMap
    val b = full.collect()
      .map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3), r.get(4), r.get(5)))
      .toMap
    assert(a == b)
    assert(delta.count() > 0 && old.count() > 0)
  }

  test("HLL distinct states: merged and direct estimates track exact") {
    // Datasketches unions may switch internal representation, so
    // merged == direct is NOT the contract; both within the sketch
    // error of exact is.
    val daily = PartialAgg.distinctStates(fact,
      Seq("day", "o_orderpriority"), col("o_custkey"))
    val merged = PartialAgg.mergeDistinct(daily, Seq("o_orderpriority"))
      .select(col("o_orderpriority"),
        PartialAgg.distinctEstimate(col("sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = fact.groupBy(col("o_orderpriority"))
      .agg(PartialAgg.distinctEstimate(
        hll_sketch_agg(col("o_custkey"), lit(12))).as("est"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    direct.foreach { case (k, (est, exact)) =>
      assert(math.abs(est - exact) <= exact * 0.06,
        s"direct estimate off for $k: $est vs $exact")
      assert(math.abs(merged(k) - exact) <= exact * 0.06,
        s"merged estimate off for $k: ${merged(k)} vs $exact")
    }
    assert(merged.nonEmpty)
  }

  test("HLL states update incrementally: old + delta merge tracks full") {
    val old = fact.filter(col("o_orderkey") % 5 =!= 0)
    val delta = fact.filter(col("o_orderkey") % 5 === 0)
    def states(df: org.apache.spark.sql.DataFrame) =
      PartialAgg.distinctStates(df, Seq("day", "o_orderpriority"),
        col("o_custkey"))
    val inc = PartialAgg.mergeDistinct(
      states(old).unionByName(states(delta)), Seq("o_orderpriority"))
      .select(col("o_orderpriority"),
        PartialAgg.distinctEstimate(col("sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = fact.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(inc(k) - ex) <= ex * 0.06,
        s"incremental estimate off for $k: ${inc(k)} vs $ex")
    }
  }

  test("merge composes: day -> month -> year equals day -> year") {
    val daily = PartialAgg.states(fact, Seq("day"), col("o_totalprice"))
    val viaMonth = PartialAgg.merge(
      PartialAgg.merge(
        daily.withColumn("month", trunc(col("day"), "month")), Seq("month"))
        .withColumn("year", trunc(col("month"), "year")),
      Seq("year"))
    val directYear = PartialAgg.merge(
      daily.withColumn("year", trunc(col("day"), "year")), Seq("year"))
    assert(viaMonth.collect().map(r =>
      r.get(0) -> (r.get(1), r.get(2), r.get(3), r.get(4))).toMap ==
      directYear.collect().map(r =>
        r.get(0) -> (r.get(1), r.get(2), r.get(3), r.get(4))).toMap)
  }
}
