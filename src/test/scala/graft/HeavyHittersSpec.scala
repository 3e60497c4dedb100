package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish skew: item i appears 2^(10-i) times, i in 0..9, plus a tail
    * of 2000 singletons — heavy head, long tail, spread over partitions. */
  private def skewed = {
    val head = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"hh_$i"))
    val tail = (0 until 2000).map(i => s"tail_$i")
    spark.createDataset(head ++ tail).toDF("item")
      .repartition(8) // hash-spread so per-partition summaries must merge
  }

  test("exact() equals the plain groupBy-count-filter, deterministically") {
    val theta = 0.05
    val got = HeavyHitters.exact(skewed, "item", theta)
      .orderBy($"item").collect().map(r => (r.getString(0), r.getLong(1)))
    val n = skewed.count()
    val want = skewed.groupBy($"item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= math.ceil(theta * n).toLong)
      .orderBy($"item").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want), s"${got.toSeq} vs ${want.toSeq}")
    assert(got.nonEmpty) // the head must actually clear the threshold
    // a second run returns the identical result (layout-independent)
    val again = HeavyHitters.exact(skewed, "item", theta)
      .orderBy($"item").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(again.sameElements(got))
  }

  test("MG guarantee: candidates cover every item above n/(capacity+1)") {
    // capacity 15 over ~4000 rows: the sketch is FORCED to decrement
    // (2010 distinct values), yet every true heavy hitter must survive
    val capacity = 15
    val row = skewed.agg(
      HeavyHitters.mgCandidates($"item", capacity).as("cand"),
      count($"item").as("n")).head()
    val cand = row.getSeq[String](0).toSet
    val n = row.getLong(1)
    val mustHave = skewed.groupBy($"item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > n.toDouble / (capacity + 1))
      .collect().map(_.getString(0)).toSet
    assert(mustHave.nonEmpty)
    assert(mustHave.subsetOf(cand),
      s"missing guaranteed hitters: ${mustHave.diff(cand)}")
    assert(cand.size <= capacity, s"summary exceeded capacity: ${cand.size}")
  }

  test("long keys and null handling") {
    val df = (Seq.fill(50)(7L) ++ (0L until 100L) ++ Seq.fill(30)(7L))
      .toDF("k")
      .union(Seq[Option[Long]](None, None).toDF("k")) // nulls ignored
    val got = HeavyHitters.exact(df, "k", 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // n = 180 non-null; only key 7 (81 occurrences incl. its range hit)
    // clears ceil(0.2 * 180) = 36
    assert(got.toSeq == Seq((7L, 81L)))
  }

  test("first pass shuffles bounded summaries, not distinct keys") {
    // the sketch aggregate's exchange moves one partial per partition —
    // independent of the 2010 distinct items flowing in. Built without
    // the repartition(8) of `skewed`: that exchange would dominate the
    // plan's shuffle-record count and hide the aggregate's.
    val head = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"hh_$i"))
    val tail = (0 until 2000).map(i => s"tail_$i")
    val df = spark.createDataset(head ++ tail).toDF("item")
    val agg = df.agg(
      HeavyHitters.mgCandidates($"item", 16).as("cand"), count($"item"))
    val m = PlanMetrics.shuffleSummary(agg)
    assert(m.shuffleRecords <= 16,
      s"sketch pass shuffled ${m.shuffleRecords} records")
  }
}
