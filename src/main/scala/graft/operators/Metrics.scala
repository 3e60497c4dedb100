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
    * Null and NaN scores are DROPPED — a rank metric cannot place an
    * unordered value, and NaN would otherwise land in different
    * positions under different shard counts (the shard predicate sends
    * it low, a descending sort ranks it high).
    * Output: one row (n_pos, n_neg, auc). With an empty class the
    * denominator is 0 and auc is NaN/±∞ (Spark double division) —
    * check n_pos/n_neg before trusting it.
    */
  def aucRoc(
      df: DataFrame, score: Column, label: Column,
      numShards: Int = 32): DataFrame = {
    val g = distinctScoreGroups(df, score, label)
    val cum = shardedCumulative(g, Seq("__neg"), numShards,
      descending = false, includeCurrent = false)
    cum
      .agg(
        sum(col("__pos") * (lit(2L) * col("__cum___neg") + col("__neg")))
          .as("__u2"),
        sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        round(col("__u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Distinct-score (pos, neg) groups with null/NaN scores dropped —
    * the shared front of [[aucRoc]] and [[averagePrecision]]. The drop
    * is deliberate (see the callers' contracts) but NOT silent: a
    * paired observe metric (`graft.metrics.rank.N` /
    * `null_nan_score_rows_dropped`) reports the count per run — the
    * same no-silent-drops contract classificationReport,
    * agreementStats, and the samplers carry (ADVICE r13). */
  private def distinctScoreGroups(
      df: DataFrame, score: Column, label: Column): DataFrame = {
    ObservedLog.ensure(df.sparkSession)
    df.select(score.cast("double").as("__s"),
        label.cast("long").as("__y"))
      .observe(s"graft.metrics.rank.${metricSeq.incrementAndGet()}",
        sum(when(col("__s").isNull || isnan(col("__s")), 1L)
          .otherwise(0L)).as("null_nan_score_rows_dropped"))
      .filter(col("__s").isNotNull && !isnan(col("__s")))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__pos"),
        (count(lit(1)) - sum(col("__y"))).as("__neg"))
  }

  /** Sharded cumulative sums over the distinct-score group frame: the
    * parallel replacement for a global-ordering window. Groups are
    * range-sharded by DETERMINISTIC value boundaries (approxQuantile —
    * the explicit form of what Spark's range partitioner samples; the
    * boundaries collect is numShards−1 doubles, driver-tiny), each
    * shard runs its prefix window in parallel, and a numShards-row
    * offset table (broadcast back) adds the totals of all
    * preceding shards. For each column c in `cols`, adds
    * `__cum_<c>`: the cumulative sum in score order — ascending and
    * EXCLUDING the current group (strictly-below, aucRoc's shape) or
    * descending and INCLUDING it (from-the-top, averagePrecision's).
    * Exact long arithmetic throughout — shard count cannot move any
    * cumulative value (the invariance MetricsSpec pins for both
    * callers). */
  private def shardedCumulative(
      g: DataFrame, cols: Seq[String], numShards: Int,
      descending: Boolean, includeCurrent: Boolean): DataFrame = {
    val bounds =
      if (numShards <= 1) Array.empty[Double]
      else g.stat.approxQuantile("__s",
        (1 until numShards).map(_.toDouble / numShards).toArray, 0.001)
        .distinct.sorted
    val shard = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__s") > b, 1).otherwise(0)
    }
    val sharded = g.withColumn("__shard", shard)
    val ordS = if (descending) col("__s").desc else col("__s").asc
    val ordShard =
      if (descending) col("__shard").desc else col("__shard").asc
    val hi = if (includeCurrent) 0L else -1L
    val wLocal = Window.partitionBy(col("__shard")).orderBy(ordS)
      .rowsBetween(Window.unboundedPreceding, hi)
    val wOff = Window.orderBy(ordShard)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = cols.foldLeft(sharded) { (d, c) =>
      d.withColumn(s"__cum_$c",
        coalesce(sum(col(c)).over(wLocal), lit(0L)))
    }
    val totAggs = cols.map(c => sum(col(c)).as(s"__t_$c"))
    val offsets0 = sharded.groupBy(col("__shard"))
      .agg(totAggs.head, totAggs.tail: _*)
    val offsets = cols.foldLeft(offsets0) { (d, c) =>
        d.withColumn(s"__o_$c",
          coalesce(sum(col(s"__t_$c")).over(wOff), lit(0L)))
      }
      .select(col("__shard") +: cols.map(c => col(s"__o_$c")): _*)
    cols.foldLeft(
        withLocal.join(broadcast(offsets), Seq("__shard"))) { (d, c) =>
      d.withColumn(s"__cum_$c", col(s"__cum_$c") + col(s"__o_$c"))
        .drop(s"__o_$c")
    }
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

  /** Average precision (area under the precision-recall curve by the
    * step/threshold definition — sklearn's `average_precision_score`):
    * AP = Σ_t (R_t − R_{t−1})·P_t over DISTINCT-score thresholds
    * descending, which reduces to
    * (1/P) Σ_groups pos_g · ctp_g / (ctp_g + cfp_g) with ctp/cfp the
    * cumulative positive/negative counts from the top — tie-robust by
    * construction (a tied block is one threshold). The PR-side
    * companion to [[aucRoc]]: on heavily imbalanced corpora (every
    * quality-filter gate) ROC-AUC saturates while AP keeps resolving.
    *
    * Scale design mirrors [[aucRoc]]: distinct-score groups are
    * range-sharded by deterministic value boundaries, the
    * cumulative-from-top runs per-shard in parallel, each shard adds
    * the totals of all HIGHER shards (a numShards-row broadcast) — two
    * passes over grouped scores, zero global sorts. Per-group terms
    * are exact long rationals evaluated in double, DECIMAL(38,10)-
    * quantized and decimal-summed (order- and shard-independent,
    * SQL-replayable). Null/NaN scores are dropped as in [[aucRoc]]
    * (an unordered value has no rank; NaN would also break shard
    * invariance). Output one row: (n_pos, n_neg,
    * average_precision 6 dp); AP is NULL when there are no positives.
    */
  def averagePrecision(
      df: DataFrame, score: Column, label: Column,
      numShards: Int = 32): DataFrame = {
    val g = distinctScoreGroups(df, score, label)
    val cum = shardedCumulative(g, Seq("__pos", "__neg"), numShards,
      descending = true, includeCurrent = true)
    cum
      .agg(
        sum((col("__pos").cast("double") *
          col("__cum___pos").cast("double") /
          (col("__cum___pos") + col("__cum___neg")).cast("double"))
          .cast("decimal(38,10)")).as("__ap"),
        coalesce(sum(col("__pos")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__neg")), lit(0L)).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        round(when(col("n_pos") > 0,
          col("__ap").cast("double") / col("n_pos").cast("double")), 6)
          .as("average_precision"))
  }

  /** Expected Calibration Error (Naeini et al. AAAI'15; Guo et al.
    * ICML'17): ECE = Σ_b (n_b/N)·|pos_rate_b − mean_score_b| over the
    * SAME equal-width bins as [[calibrationBins]] — the one-number
    * acceptance gate next to the full reliability curve, plus
    * `max_gap`, the worst single bin's |confidence − accuracy| (a
    * small ECE can hide one badly-miscalibrated score region; read
    * both). Built ON the curve's 6-dp bin outputs, so the scalar is
    * exactly the published curve's summary and bit-replayable in SQL;
    * per-bin terms n·gap quantize to DECIMAL(38,10) (gap ≤ 1 keeps
    * them ≤ n) and decimal-sum, the final /N is double. Output one
    * row: (n_rows, n_bins_used, ece, max_gap); empty input →
    * (0, 0, NULL, NULL). Same scale shape as calibrationBins — the
    * extra aggregate runs over ≤ `bins` rows.
    */
  def expectedCalibrationError(
      df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    val b = calibrationBins(df, score, label, bins)
    val gap = abs(col("pos_rate") - col("mean_score"))
    val agged = b.agg(
      coalesce(sum(col("n")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_bins_used"),
      sum((col("n").cast("double") * gap).cast("decimal(38,10)"))
        .as("__w"),
      max(gap).as("__mg"))
    val empty = col("n_rows") === 0L
    agged.select(
      col("n_rows"), col("n_bins_used"),
      round(when(empty, lit(null)).otherwise(
        col("__w").cast("double") / col("n_rows").cast("double")), 6)
        .as("ece"),
      round(when(empty, lit(null)).otherwise(col("__mg")), 6)
        .as("max_gap"))
  }

  /** Per-invocation suffix for observe() metric names (Spark rejects two
    * CollectMetrics nodes sharing a name in one plan). */
  private val metricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Multiclass classification report: per-class
    * (label, support, predicted, tp, precision, recall, f1) for a
    * predicted-label column against gold labels — the acceptance gate
    * on a LABELER change (language-ID model, quality classifier,
    * topic router) before its output partitions a 100 TB corpus.
    * One row per label present on EITHER side (a class the model never
    * predicts still shows its recall 0; a hallucinated label shows
    * precision with support 0).
    *
    * Conventions (sklearn's classification_report semantics, NULL where
    * it prints 0-by-zero_division):
    *  - precision = tp/predicted, NULL when the label is never
    *    predicted (0/0 — nothing asserted);
    *  - recall = tp/support, NULL when the label has no gold rows;
    *  - f1 = harmonic mean, 0.0 when p + r = 0 with both defined,
    *    NULL when either side is NULL.
    * Every ratio is ONE division of two exact longs — bit-identical
    * across engines and aggregation orders; outputs rounded 6 dp.
    *
    * Scale shape: one map-side-combined (gold, pred) contingency
    * shuffle over the items; per-class totals and the tp diagonal
    * aggregate CONTINGENCY rows (≤ distinct label pairs), joined on
    * the label — never broadcast-assumed, never item-sized again.
    *
    * Null contract: rows with a null on either side are dropped and
    * counted by a `graft.metrics.classification_report.*` observe
    * metric (`null_label_rows_dropped`) — a null prediction is an
    * abstention, which precision/recall over asserted labels must not
    * see; gate abstention RATE separately.
    */
  def classificationReport(
      df: DataFrame, goldCol: String, predCol: String): DataFrame = {
    ObservedLog.ensure(df.sparkSession)
    val labeled = df
      .observe(
        s"graft.metrics.classification_report.${metricSeq.incrementAndGet()}",
        sum(when(col(goldCol).isNull || col(predCol).isNull, 1L)
          .otherwise(0L)).as("null_label_rows_dropped"))
      .filter(col(goldCol).isNotNull && col(predCol).isNotNull)
    val ct = labeled
      .groupBy(col(goldCol).as("__g"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
    // tp folds into the gold-side aggregate as a conditional sum — a
    // separate ct.filter(__g === __p) branch looks natural but the
    // grouping-key predicate gets pushed BELOW the contingency
    // aggregate, splitting the exchange and re-SCANNING the items for
    // the diagonal (PlanAudit caught q164 at 2 scans); this shape keeps
    // all consumers on the one reused exchange and drops a join.
    val goldSide = ct.groupBy(col("__g").as("label"))
      .agg(sum(col("__n")).as("support"),
        sum(when(col("__g") === col("__p"), col("__n")).otherwise(0L))
          .as("__tp"))
    val predTot = ct.groupBy(col("__p").as("label"))
      .agg(sum(col("__n")).as("predicted"))
    val joined = goldSide
      .join(predTot, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"),
        coalesce(col("__tp"), lit(0L)).as("tp"))
    val p = when(col("predicted") > 0,
      col("tp").cast("double") / col("predicted").cast("double"))
    val r = when(col("support") > 0,
      col("tp").cast("double") / col("support").cast("double"))
    joined
      .withColumn("__prec", p)
      .withColumn("__rec", r)
      .select(col("label"), col("support"), col("predicted"), col("tp"),
        round(col("__prec"), 6).as("precision"),
        round(col("__rec"), 6).as("recall"),
        round(
          when(col("__prec").isNull || col("__rec").isNull, lit(null))
            .when(col("__prec") + col("__rec") > 0,
              lit(2.0) * col("__prec") * col("__rec") /
                (col("__prec") + col("__rec")))
            .otherwise(lit(0.0)).cast("double"), 6).as("f1"))
  }

  /** Chance-corrected whole-labeler agreement in ONE row:
    * (n_rows, accuracy, expected_accuracy, cohen_kappa, mcc).
    *  - Cohen's kappa (Cohen 1960): (po − pe)/(1 − pe) with
    *    pe = Σ_label gold_l·pred_l / N² — raw accuracy corrected for the
    *    agreement two independent labelers with these marginals would
    *    reach by luck. NULL when pe = 1 (BOTH sides constant — chance
    *    explains everything, the statistic asserts nothing).
    *  - Multiclass MCC (Gorodkin 2004's R_K, = the familiar binary
    *    Matthews coefficient at 2 labels):
    *    (c·N − Σ t_l·q_l) / √((N² − Σ q_l²)(N² − Σ t_l²)); NULL when
    *    either factor is 0 (a constant side — correlation undefined).
    * Exactness: every count product accumulates as DECIMAL(38,0)
    * (N ~ 10¹² makes N² overflow any int64); only the final ratios and
    * the √ drop to double, and the two denominator factors multiply in
    * double (their exact product can reach 10⁴⁸ — past decimal; the
    * ~1e-16 relative error is immaterial for a [-1, 1] statistic).
    *
    * Scale shape: the one item-sized contingency shuffle, then a
    * label-keyed shuffle of 2×cells SKINNY marginal rows (a union of
    * the two projections — no gold-totals⋈pred-totals self-join), then
    * 1-row aggregates. Null contract as [[classificationReport]]
    * (dropped + observe-counted, `graft.metrics.agreement_stats.*`).
    * Empty input → (0, NULL × 4).
    */
  def agreementStats(
      df: DataFrame, goldCol: String, predCol: String): DataFrame = {
    ObservedLog.ensure(df.sparkSession)
    val labeled = df
      .observe(
        s"graft.metrics.agreement_stats.${metricSeq.incrementAndGet()}",
        sum(when(col(goldCol).isNull || col(predCol).isNull, 1L)
          .otherwise(0L)).as("null_label_rows_dropped"))
      .filter(col(goldCol).isNotNull && col(predCol).isNotNull)
    val ct = labeled
      .groupBy(col(goldCol).as("__g"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
    // align gold/pred totals per label WITHOUT a self-join: union two
    // skinny projections of the cells, re-aggregate on the label
    val marg = ct
      .select(col("__g").as("__l"), col("__n").as("__t"),
        lit(0L).as("__q"))
      .unionAll(ct.select(col("__p").as("__l"), lit(0L).as("__t"),
        col("__n").as("__q")))
      .groupBy(col("__l"))
      .agg(sum(col("__t")).as("__t"), sum(col("__q")).as("__q"))
    def prod(x: Column, y: Column): Column =
      (x.cast("decimal(19,0)") * y.cast("decimal(19,0)"))
        .cast("decimal(38,0)")
    val sums = marg.agg(
      coalesce(sum(prod(col("__t"), col("__q"))),
        lit(0).cast("decimal(38,0)")).as("__ptq"),
      coalesce(sum(prod(col("__t"), col("__t"))),
        lit(0).cast("decimal(38,0)")).as("__ptt"),
      coalesce(sum(prod(col("__q"), col("__q"))),
        lit(0).cast("decimal(38,0)")).as("__pqq"))
    val diag = ct.agg(
      coalesce(sum(col("__n")), lit(0L)).as("__N"),
      coalesce(sum(when(col("__g") === col("__p"), col("__n"))
        .otherwise(0L)), lit(0L)).as("__c"))
    val s = diag.crossJoin(sums)
      .select(col("__N"), col("__c"),
        prod(col("__N"), col("__N")).as("__nn"),
        col("__ptq"), col("__ptt"), col("__pqq"))
    val po = col("__c").cast("double") / col("__N").cast("double")
    val pe = col("__ptq").cast("double") / col("__nn").cast("double")
    val fT = (col("__nn") - col("__ptt")).cast("double")
    val fQ = (col("__nn") - col("__pqq")).cast("double")
    val empty = col("__N") === 0L
    s.withColumn("__po", when(empty, lit(null)).otherwise(po))
      .withColumn("__pe", when(empty, lit(null)).otherwise(pe))
      .select(
        col("__N").as("n_rows"),
        round(col("__po"), 6).as("accuracy"),
        round(col("__pe"), 6).as("expected_accuracy"),
        round(
          when(empty || col("__pe") === 1.0, lit(null))
            .otherwise((col("__po") - col("__pe")) /
              (lit(1.0) - col("__pe"))), 6).as("cohen_kappa"),
        round(
          when(empty || fT === 0.0 || fQ === 0.0, lit(null))
            .otherwise(
              (prod(col("__c"), col("__N")) - col("__ptq"))
                .cast("double") / sqrt(fT * fQ)), 6).as("mcc"))
  }
}
