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
