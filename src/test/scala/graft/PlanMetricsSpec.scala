package graft

import org.apache.spark.sql.functions._

class PlanMetricsSpec extends SparkTestBase {

  test("broadcast join moves fewer shuffle bytes than shuffle join") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val o = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))

    val broadcastJoin = li.join(broadcast(o),
      li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    val b = PlanMetrics.shuffleSummary(broadcastJoin)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffleJoin = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val s = PlanMetrics.shuffleSummary(shuffleJoin)
      // the broadcast plan shuffles only the tiny post-join aggregate;
      // the shuffle join moves both join inputs through exchanges
      assert(b.exchanges < s.exchanges)
      assert(s.shuffleRecords > b.shuffleRecords,
        s"shuffle join moved ${s.shuffleRecords} records, " +
          s"broadcast ${b.shuffleRecords}")
      assert(s.shuffleBytes > b.shuffleBytes)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE converts a runtime-small join side to broadcast") {
    // static stats see the full orders table (too big to broadcast under
    // a tiny threshold); the selective filter only becomes visible at
    // runtime, when AQE re-plans the sort-merge join into a broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    try {
      val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      val tiny = spark.read.parquet(s"$sf001/orders.parquet")
        .filter(col("o_totalprice") > 495000) // handful of rows
      val joined = li.join(tiny, li("l_orderkey") === tiny("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"expected AQE runtime broadcast in:\n$finalPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("map-only plans shuffle zero bytes") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
    val m = PlanMetrics.shuffleSummary(docs)
    assert(m.exchanges == 0 && m.shuffleBytes == 0L)
  }
}
