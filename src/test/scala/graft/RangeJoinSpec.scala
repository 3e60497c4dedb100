package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketized interval join equals the theta join exactly") {
    val points = spark.range(0, 1000)
      .select(col("id").as("pid"), (col("id") * 7 % 500).as("x"))
    val intervals = Seq(
      (1L, 0L, 49L),     // within one 100-bucket
      (2L, 90L, 210L),   // spans three buckets
      (3L, 495L, 505L),  // straddles a bucket edge, tail out of range
      (4L, 600L, 700L),  // no points land here (x < 500)
      (5L, 10L, 10L)     // degenerate single-value interval
    ).toDF("iid", "lo", "hi")
    val bucketed = RangeJoin.pointInInterval(points, intervals,
      "x", "lo", "hi", c => floor(c / 100))
    val theta = points.join(intervals,
      col("x") >= col("lo") && col("x") <= col("hi"))
    assert(bucketed.count() == theta.count())
    assert(bucketed.select("pid", "iid")
      .exceptAll(theta.select("pid", "iid")).count() == 0)
    assert(theta.select("pid", "iid")
      .exceptAll(bucketed.select("pid", "iid")).count() == 0)
    // a multi-bucket interval must not duplicate matches
    assert(bucketed.select("pid", "iid").distinct().count() ==
      bucketed.count())
  }

  test("the plan is an equi-join, not a nested loop") {
    val points = spark.range(0, 100).select(col("id").as("x"))
    val intervals = spark.range(0, 10)
      .select(col("id").as("iid"), (col("id") * 10).as("lo"),
        (col("id") * 10 + 5).as("hi"))
    val joined = RangeJoin.pointInInterval(points, intervals,
      "x", "lo", "hi", c => floor(c / 10))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    // and the theta formulation DOES nested-loop (the shape we avoid)
    val theta = points.join(intervals,
      col("x") >= col("lo") && col("x") <= col("hi"))
    theta.collect()
    val thetaPlan = theta.queryExecution.executedPlan.toString
    assert(thetaPlan.contains("BroadcastNestedLoopJoin") ||
      thetaPlan.contains("CartesianProduct"))
  }

  test("negative-valued domains bucket correctly") {
    val points = Seq((1L, -105L), (2L, -5L), (3L, 5L)).toDF("pid", "x")
    val intervals = Seq((10L, -110L, -100L), (20L, -10L, 10L))
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals,
      "x", "lo", "hi", c => floor(c / 100))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out == Set((1L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("intervalOverlap equals brute force, exactly-once per pair") {
    val rng = new scala.util.Random(23)
    val left = (0 until 120).map { i =>
      val lo = rng.nextInt(1000).toLong
      (i.toLong, lo, lo + rng.nextInt(60))
    }
    val right = (0 until 150).map { i =>
      val lo = rng.nextInt(1000).toLong
      (i.toLong, lo, lo + rng.nextInt(200)) // wider: multi-bucket spans
    }
    val lDf = left.toDF("lid", "llo", "lhi")
    val rDf = right.toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(lDf, rDf,
        "llo", "lhi", "rlo", "rhi", c => floor(c / 50))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = for {
      (li, llo, lhi) <- left
      (ri, rlo, rhi) <- right
      if llo <= rhi && rlo <= lhi
    } yield (li, ri)
    // multiset equality: exactly once per overlapping pair, no bucket
    // duplicates survive the first-overlapping-bucket guard
    assert(got.sorted == want.sorted)
    assert(got.distinct.length == got.length)
    assert(got.nonEmpty)
  }

  test("intervalOverlap plans as an equi-join, not a nested loop") {
    val lDf = (0L to 50L).map(i => (i, i * 10, i * 10 + 25))
      .toDF("lid", "llo", "lhi")
    val rDf = (0L to 50L).map(i => (i, i * 7, i * 7 + 40))
      .toDF("rid", "rlo", "rhi")
    val j = RangeJoin.intervalOverlap(lDf, rDf,
      "llo", "lhi", "rlo", "rhi", c => floor(c / 32))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
