package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed evaluation metrics for model-assisted data curation — the
  * read side of quality-classifier filtering: before a score column gates
  * a 100 TB corpus, measure how well it separates the classes.
  */
object Metrics {

  /** ROC AUC by the Mann–Whitney U statistic, ties handled exactly
    * (tied scores contribute half): AUC = U / (nPos·nNeg) with
    * U = Σ_g pos_g · (negBelow_g + neg_g/2) over distinct-score groups g.
    *
    * Everything stays in integer arithmetic (U is accumulated doubled:
    * 2·negBelow + neg) until one final double division, so the result is
    * exact and independent of partial-aggregation order.
    *
    * Scale design: the prefix count of negatives below each score needs a
    * GLOBAL ordering, which a bare window would serialize on one reducer.
    * Instead the distinct-score groups are range-sharded by DETERMINISTIC
    * value boundaries (approxQuantile on the scores — the explicit form
    * of what Spark's range partitioner samples), the prefix sum runs
    * per-shard in parallel, and each shard adds a precomputed offset =
    * total negatives of all lower shards (a `numShards`-row window —
    * trivially small). Two passes over the grouped scores, zero global
    * sorts.
    *
    * `label` must evaluate to 1 (positive) or 0 (negative) per row.
    * Output: one row (n_pos, n_neg, auc). With an empty class the
    * denominator is 0 and auc is NaN/±∞ (Spark double division) —
    * check n_pos/n_neg before trusting it.
    */
  def aucRoc(
      df: DataFrame, score: Column, label: Column,
      numShards: Int = 32): DataFrame = {
    val g = df.select(score.cast("double").as("__s"),
        label.cast("long").as("__y"))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__pos"),
        (count(lit(1)) - sum(col("__y"))).as("__neg"))
    // Deterministic monotone shard id from value boundaries. The
    // boundaries collect is numShards-1 doubles — driver-tiny, same
    // class of collect as an IVF centroid pull.
    val bounds =
      if (numShards <= 1) Array.empty[Double]
      else g.stat.approxQuantile("__s",
        (1 until numShards).map(_.toDouble / numShards).toArray, 0.001)
        .distinct.sorted
    val shard = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__s") > b, 1).otherwise(0)
    }
    val sharded = g.withColumn("__shard", shard)
    val wLocal = Window.partitionBy(col("__shard")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sharded.withColumn("__below_local",
      coalesce(sum(col("__neg")).over(wLocal), lit(0L)))
    val wOff = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("__shard"))
      .agg(sum(col("__neg")).as("__negtot"))
      .withColumn("__offset", coalesce(sum(col("__negtot")).over(wOff), lit(0L)))
      .select(col("__shard"), col("__offset"))
    local.join(broadcast(offsets), Seq("__shard"))
      .withColumn("__below", col("__below_local") + col("__offset"))
      .agg(
        sum(col("__pos") * (lit(2L) * col("__below") + col("__neg")))
          .as("__u2"),
        sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        round(col("__u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Per-group ROC AUC — [[aucRoc]]'s math with the prefix count as a
    * per-group window over distinct scores: groups parallelize naturally
    * (the window partitions on the group key), so no value-sharding is
    * needed unless a single group dominates the corpus — in that shape,
    * run [[aucRoc]] per heavy group instead. For a group missing a
    * class the denominator is 0 and auc is NaN/±∞ — filter on
    * n_pos/n_neg before trusting a group's value. */
  def aucByGroup(
      df: DataFrame, group: Column, score: Column,
      label: Column): DataFrame = {
    val g = df.select(group.as("grp"), score.cast("double").as("__s"),
        label.cast("long").as("__y"))
      .groupBy(col("grp"), col("__s"))
      .agg(sum(col("__y")).as("__pos"),
        (count(lit(1)) - sum(col("__y"))).as("__neg"))
    val w = Window.partitionBy(col("grp")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__below", coalesce(sum(col("__neg")).over(w), lit(0L)))
      .groupBy(col("grp"))
      .agg(
        sum(col("__pos") * (lit(2L) * col("__below") + col("__neg")))
          .as("__u2"),
        sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        round(col("__u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Rolling z-score anomaly flags: each row's value against the sample
    * mean/std of the PREVIOUS `windowSize` rows of its key (ordered by
    * `order` columns, which must form a unique key within a partition —
    * a ROWS frame over peer rows has engine-chosen order otherwise).
    * The row under test is EXCLUDED from its own baseline: included, a
    * lone spike inflates the window's std enough to cap its own score
    * at (n−1)/√n (< 2 for n=5), so no single outlier could ever fire.
    * Mean and E[x²] ride exact-DECIMAL windowed sums, variance uses the
    * n/(n−1) sample correction with a max(·,0) guard (exact-arithmetic
    * variance can round to −ε), and only FULL baselines emit — the
    * first windowSize rows of a key have none. `std > 0` participates
    * in the flag predicate so constant baselines never reach the
    * NaN-comparison trap (engines disagree on NaN ordering). One window
    * pass per key — parallel across keys, no global sort. */
  def rollingZscore(
      df: DataFrame, partitionBy: Column, order: Seq[Column],
      value: Column, windowSize: Int = 5,
      zThreshold: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(partitionBy).orderBy(order: _*)
      .rowsBetween(-windowSize, -1)
    val n = windowSize.toDouble
    val corr = windowSize / (windowSize - 1.0)
    val sumd = sum(value.cast("decimal(18,6)")).over(w).cast("double")
    val sqd = sum((value * value).cast("decimal(28,12)")).over(w)
      .cast("double")
    val mean = sumd / lit(n)
    val ex2 = sqd / lit(n)
    val variance = (ex2 - mean * mean) * lit(corr)
    val std = sqrt(greatest(variance, lit(0.0)))
    df.withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__mean", mean)
      .withColumn("__std", std)
      .withColumn("z", (value - col("__mean")) / col("__std"))
      .filter(col("__cnt") === windowSize && col("__std") > 0.0 &&
        abs(col("z")) >= zThreshold)
      .drop("__cnt")
  }

  /** Reliability (calibration) bins: fixed-width buckets over the score's
    * observed [min, max], per-bin count / positive rate / exact-DECIMAL
    * mean score. The min/max pair is one tiny aggregate broadcast back
    * (scalar-subquery shape); bin edges are therefore data-derived but
    * deterministic. A perfectly calibrated score has pos_rate tracking
    * mean_score per bin. */
  def calibrationBins(
      df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    val s = df.select(score.cast("double").as("__s"),
      label.cast("long").as("__y"))
    val mm = s.agg(min(col("__s")).as("__mn"), max(col("__s")).as("__mx"))
    val binned = s.crossJoin(broadcast(mm))
      .withColumn("bin",
        least(floor((col("__s") - col("__mn")) /
          (col("__mx") - col("__mn")) * bins).cast("long"),
          lit((bins - 1).toLong)))
    binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        round(sum(col("__y")).cast("double") / count(lit(1)), 6)
          .as("pos_rate"),
        round(sum(col("__s").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_score"))
  }
}
