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

  test("a reused exchange is counted once, not once per consumer") {
    // self-join of an aggregate: both sides shuffle the SAME exchange,
    // which AQE wraps in ReusedExchangeExec for the second consumer —
    // the data moved once, so the summary must count it once
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      val agg = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val self = agg.as("a").join(agg.as("b"), Seq("l_orderkey"))
        .select(col("l_orderkey"), (col("a.q") + col("b.q")).as("qq"))
      val m = PlanMetrics.shuffleSummary(self)
      // occurrence count WITH duplicates (the naive walk): traverse the
      // executed plan counting every exchange reachable, reuse included
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
      var occurrences = 0
      var reused = 0
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case r: ReusedExchangeExec => reused += 1; walk(r.child)
        case sh: ShuffleExchangeLike =>
          occurrences += 1; sh.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      walk(self.queryExecution.executedPlan)
      assert(reused >= 1, "plan did not exercise exchange reuse")
      assert(m.exchanges < occurrences,
        s"summary counted ${m.exchanges}, naive walk saw $occurrences")
      // sanity: the single agg exchange moves about the groupBy's input —
      // well under double (the naive double-count would be exactly 2x)
      val once = PlanMetrics.shuffleSummary(agg)
      assert(m.shuffleRecords < 2 * once.shuffleRecords,
        s"reused exchange double-counted: ${m.shuffleRecords} vs " +
          s"single-agg ${once.shuffleRecords}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("map-only plans shuffle zero bytes") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
    val m = PlanMetrics.shuffleSummary(docs)
    assert(m.exchanges == 0 && m.shuffleBytes == 0L)
  }
}
