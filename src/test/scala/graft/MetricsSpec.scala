package graft

import org.apache.spark.sql.functions._
import graft.operators.Metrics

class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("AUC = 1.0 for perfect separation, 0.0 for inverted") {
    val df = Seq((0.9, 1L), (0.8, 1L), (0.7, 1L), (0.3, 0L), (0.2, 0L))
      .toDF("score", "y")
    val r = Metrics.aucRoc(df, col("score"), col("y")).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0)
    val inv = Metrics.aucRoc(df, -col("score"), col("y")).head()
    assert(inv.getDouble(2) == 0.0)
  }

  test("AUC = 0.5 when every score ties") {
    val df = Seq((1.0, 1L), (1.0, 0L), (1.0, 1L), (1.0, 0L)).toDF("s", "y")
    assert(Metrics.aucRoc(df, col("s"), col("y")).head().getDouble(2) == 0.5)
  }

  test("AUC matches the hand-computed rank-sum on a mixed case") {
    // scores: pos at 0.9, 0.5(tied with a neg), 0.1; neg at 0.7, 0.5, 0.3
    // pairs (pos, neg): (0.9 beats 0.7, 0.5, 0.3)=3; (0.5 beats 0.3)=1 +
    // tie with 0.5 = 0.5; (0.1 beats none)=0  => U = 4.5, AUC = 4.5/9
    val df = Seq((0.9, 1L), (0.5, 1L), (0.1, 1L),
      (0.7, 0L), (0.5, 0L), (0.3, 0L)).toDF("s", "y")
    val r = Metrics.aucRoc(df, col("s"), col("y")).head()
    assert(r.getDouble(2) == math.rint(4.5 / 9.0 * 1e6) / 1e6)
  }

  test("per-group AUC matches whole-frame AUC computed per slice") {
    val events = spark.read.parquet(s"$sf001/events.parquet")
    val lab = when(col("event_type").isin("click", "purchase"), 1L)
      .otherwise(0L)
    val grouped = Metrics.aucByGroup(events,
        pmod(col("user_id"), lit(4L)), col("value"), lab)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    (0L until 4L).foreach { c =>
      val solo = Metrics.aucRoc(
        events.filter(pmod(col("user_id"), lit(4L)) === c),
        col("value"), lab).head().getDouble(2)
      assert(grouped(c) == solo, s"cohort $c")
    }
  }

  test("calibration bins: counts partition the frame, rates bounded") {
    val events = spark.read.parquet(s"$sf001/events.parquet")
    val lab = when(col("event_type").isin("click", "purchase"), 1L)
      .otherwise(0L)
    val bins = Metrics.calibrationBins(events, col("value"), lab, bins = 10)
      .collect()
    assert(bins.map(_.getLong(1)).sum == events.count())
    assert(bins.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(bins.map(_.getLong(0)).toSet.subsetOf((0L to 9L).toSet))
    // a perfectly separable label this is not: rates stay interior
    assert(bins.map(_.getDouble(3)).distinct.length > 1)
  }

  test("rolling z-score flags a planted spike, skips warm-up and flats") {
    val rows = // key A: flat baseline then one spike; key B: constant
      (1 to 8).map(i => ("A", i.toLong, if (i == 7) 100.0 else 10.0 + i * 0.1)) ++
        (1 to 6).map(i => ("B", i.toLong, 5.0))
    val df = rows.toDF("k", "seq", "v")
    val out = Metrics.rollingZscore(df, col("k"), Seq(col("seq")), col("v"),
      windowSize = 5, zThreshold = 2.0)
      .select(col("k"), col("seq")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.contains(("A", 7L)))            // the spike
    assert(!out.exists(_._1 == "B"))           // constant key: std = 0
    assert(!out.exists { case (_, s) => s < 5 }) // no partial windows
  }

  test("AUC is invariant to shard count (parallel prefix = serial prefix)") {
    val events = spark.read.parquet(s"$sf001/events.parquet")
    val lab = when(col("event_type").isin("click", "purchase"), 1L)
      .otherwise(0L)
    val one = Metrics.aucRoc(events, col("value"), lab, numShards = 1)
      .head().getDouble(2)
    val many = Metrics.aucRoc(events, col("value"), lab, numShards = 32)
      .head().getDouble(2)
    assert(one == many)
    assert(one > 0.0 && one < 1.0)
  }
}
