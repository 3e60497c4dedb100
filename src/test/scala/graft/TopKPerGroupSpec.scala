package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopKPerGroup, TopKPerGroupExec}

class TopKPerGroupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val orders =
    spark.read.parquet(s"$sf001/orders.parquet").cache()

  private def windowTruth(k: Int): Set[(Long, Long)] = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("heap-based top-k matches the window formulation") {
    for (k <- Seq(1, 3, 7)) {
      val got = TopKPerGroup.perKey(orders,
        Seq("o_custkey"), "o_totalprice", "o_orderkey", k)
        .select("o_custkey", "o_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == windowTruth(k), s"k=$k")
    }
  }

  test("physical plan uses TopKPerGroupExec and no sort before it") {
    val df = TopKPerGroup.perKey(orders,
      Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))
    assert(!plan.contains("Sort"), s"unexpected sort in:\n$plan")
  }

  test("null order values are dropped; small groups pass through") {
    val df = Seq(
      ("a", Some(1.0), 1L), ("a", None, 2L), ("b", Some(5.0), 3L)
    ).toDF("k", "v", "id")
    val got = TopKPerGroup.perKey(df, Seq("k"), "v", "id", 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
