package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // one hot key (90% of rows) + a tail
  private lazy val skewed = spark.range(10000)
    .select(
      when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id")))
        .as("k"),
      (col("id") % 7).cast("double").as("v"))

  test("salted aggregate equals the unsalted aggregate") {
    val plain = skewed.groupBy("k")
      .agg(sum(col("v").cast("decimal(28,6)")).cast("double").as("sum_v"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", numSalts = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    assert(salted == plain)
  }

  test("salted join equals the plain inner join") {
    val right = Seq(("hot", "H"), ("k5", "T5"), ("missing", "X"))
      .toDF("k", "label")
    val plain = skewed.join(right, "k").groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, right, "k", numSalts = 8)
      .groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("keyHistogram surfaces the hot key first") {
    val top = Skew.keyHistogram(skewed, Seq("k"), topN = 3).collect()
    assert(top.head.getString(0) == "hot")
    assert(top.head.getDouble(2) > 0.8)
  }
}
