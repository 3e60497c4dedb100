package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMinSketchOps

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  test("estimates are >= exact, and exact when width has no collisions") {
    val rows = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = rows.toDF("k")
    val probes = Seq("alpha", "beta", "gamma").toDF("k")
    val out = CountMinSketchOps
      .estimateCounts(df, "k", probes, "k", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 keys in a 4096-wide row: collisions are (astronomically) unlikely
    assert(out == Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L))
  }

  test("never underestimates, even with forced collisions (width=2)") {
    val rng = new scala.util.Random(5)
    val rows = Seq.fill(300)(s"w${rng.nextInt(20)}")
    val df = rows.toDF("k")
    val exact = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val probes = exact.keys.toSeq.toDF("k")
    val est = CountMinSketchOps
      .estimateCounts(df, "k", probes, "k", depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) => assert(est(k) >= n, s"underestimated $k") }
    // with width=2 and 20 keys, collisions are certain -> some over-count
    assert(exact.exists { case (k, n) => est(k) > n })
  }

  test("streaming sketch equals the batch sketch (state-store round trip)") {
    // The aggregate must survive micro-batch incremental update: state
    // serialize/deserialize between batches plus partial merges. Feed
    // the same rows in three micro-batches and compare the final
    // complete-mode sketch to the one-shot batch sketch.
    val rows = (0 until 90).map(i => s"tok${i % 11}")
    val batchSketch = rows.toDF("k")
      .agg(CountMinSketchOps.cmsAggregate(col("k"), 3, 64).as("sk"))
      .head().getSeq[Long](0)
    implicit val sqlCtx = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = mem.toDF().toDF("k")
      .agg(CountMinSketchOps.cmsAggregate(col("k"), 3, 64).as("sk"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    rows.grouped(30).foreach { chunk =>
      mem.addData(chunk)
      q.processAllAvailable()
    }
    val streamed = spark.table("cms_stream").head().getSeq[Long](0)
    q.stop()
    assert(streamed == batchSketch)
  }

  test("sketch is bit-identical under any partitioning (merge order)") {
    val d = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
    def sketch(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CountMinSketchOps.cmsAggregate(col("token"), 4, 256).as("sk"))
        .head().getSeq[Long](0)
    val a = sketch(d)
    val b = sketch(d.repartition(13))
    val c = sketch(d.coalesce(1))
    assert(a == b && b == c)
    // total mass per row of the table = total occurrences
    val n = d.count()
    (0 until 4).foreach { i =>
      assert(a.slice(i * 256, (i + 1) * 256).sum == n)
    }
  }
}
