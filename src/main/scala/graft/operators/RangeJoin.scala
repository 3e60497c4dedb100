package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without a nested loop.
  *
  * Spark plans a pure inequality join — `point BETWEEN lo AND hi` — as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * broadcasts): every probe row is compared against every interval, which
  * is the textbook 100 TB scale-killer. The standard fix (the range-join
  * bucketing Databricks exposes as a hint, and the binning step of every
  * interval-join paper) is to discretize: map each point to the
  * fixed-width bucket it falls in, explode each interval to every bucket
  * it overlaps, equi-join on the bucket id, and apply the exact BETWEEN
  * predicate to the (tiny) per-bucket candidate set in the same stage.
  * The join becomes an ordinary shuffle-on-key hash join — partitionable,
  * AQE-skew-splittable, broadcastable when the interval side is small.
  *
  * Bucket width tunes replication vs selectivity: an interval produces
  * `width(interval)/bucketWidth + 1` bucket rows, a bucket collects
  * `bucketWidth`-worth of points, so set `bucketWidth` near the typical
  * interval width (replication stays O(1) per interval and candidates
  * stay local).
  */
object RangeJoin {

  /** Inner join of `facts` rows (at `pointCol`) to `intervals` rows whose
    * `[loCol, hiCol]` (inclusive) contains the point. `bucket` maps a
    * point/endpoint column to its integral bucket id and must be
    * monotonic (e.g. `c => floor(c / 100)`, or week numbers for dates).
    * Each matching (fact, interval) pair emits exactly once: a point
    * lives in one bucket, so exploding only the interval side cannot
    * duplicate a match. Column names must be disjoint across the two
    * inputs (rename before joining, as with any join). */
  def pointInInterval(
      facts: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucket: Column => Column): DataFrame = {
    val fb = facts.withColumn("__bk", bucket(col(pointCol)).cast("long"))
    val ib = intervals.withColumn("__bk",
      explode(sequence(bucket(col(loCol)).cast("long"),
        bucket(col(hiCol)).cast("long"))))
    fb.join(ib, Seq("__bk"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bk")
  }

  /** Interval-OVERLAP join (range × range): left `[lLo, lHi]` rows to
    * right `[rLo, rHi]` rows with a non-empty inclusive intersection —
    * the time-interval overlap primitive (sessions × promo windows,
    * visits × incidents). Same bucketization as [[pointInInterval]],
    * with BOTH sides exploded to their overlapped buckets; a pair that
    * co-occurs in several buckets is emitted exactly once via the
    * FIRST-OVERLAPPING-BUCKET guard — the joined bucket must equal
    * `bucket(greatest(lLo, rLo))`, which for an overlapping pair lies
    * inside both sides' bucket ranges and is unique. No `distinct`, no
    * nested loop; an ordinary shuffle-on-key equi-join, AQE-manageable.
    * Column names must be disjoint across the inputs. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bucket: Column => Column): DataFrame = {
    val lb = left.withColumn("__bk",
      explode(sequence(bucket(col(lLo)).cast("long"),
        bucket(col(lHi)).cast("long"))))
    val rb = right.withColumn("__bk",
      explode(sequence(bucket(col(rLo)).cast("long"),
        bucket(col(rHi)).cast("long"))))
    lb.join(rb, Seq("__bk"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bk") ===
        bucket(greatest(col(lLo), col(rLo))).cast("long"))
      .drop("__bk")
  }
}
