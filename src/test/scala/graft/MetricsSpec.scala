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

  test("classificationReport: hand-checked confusion, one row per " +
      "label on EITHER side") {
    // gold: a,a,a,b,b,c ; pred: a,a,b,b,b,d
    //  a: support 3, predicted 2, tp 2 -> p 1.0,      r 0.666667
    //  b: support 2, predicted 3, tp 2 -> p 0.666667, r 1.0
    //  c: support 1, predicted 0, tp 0 -> p NULL (never asserted), r 0.0
    //  d: support 0, predicted 1, tp 0 -> p 0.0, r NULL (no gold rows)
    val d = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "d")).toDF("g", "p")
    val rows = Metrics.classificationReport(d, "g", "p")
      .orderBy("label").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b", "c", "d"))
    def row(l: String) = rows.find(_.getString(0) == l).get
    val a = row("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((3L, 2L, 2L)))
    assert(a.getDouble(4) === 1.0 && a.getDouble(5) === 0.666667)
    assert(a.getDouble(6) === 0.8) // 2*1*(2/3)/(1+2/3)
    val b = row("b")
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) === ((2L, 3L, 2L)))
    assert(b.getDouble(4) === 0.666667 && b.getDouble(5) === 1.0)
    assert(b.getDouble(6) === 0.8) // 2*(2/3)*1/(2/3+1)
    val c = row("c")
    assert(c.isNullAt(4), "precision 0/0 must be NULL")
    assert(c.getDouble(5) === 0.0)
    assert(c.isNullAt(6), "f1 NULL when precision is NULL")
    val dd = row("d")
    assert(dd.getDouble(4) === 0.0)
    assert(dd.isNullAt(5), "recall 0/0 must be NULL")
    assert(dd.isNullAt(6))
  }

  test("classificationReport: total miss (both sides present, tp 0) " +
      "gives f1 0.0, not NULL; null rows dropped and counted") {
    // collect every delivery: q164 runs this operator concurrently
    // from QueriesSpec on the shared session with its own (0-dropped)
    // metric — a single last-writer slot would flake
    val dropped = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft.metrics.classification_report"))
            dropped.add(
              row.getLong(row.fieldIndex("null_label_rows_dropped")))
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // label x: gold twice, predicted twice, never correctly
      val d = Seq((Some("x"), Some("y")), (Some("x"), Some("y")),
        (Some("y"), Some("x")), (Some("y"), Some("x")),
        (None, Some("x")), (Some("x"), None)).toDF("g", "p")
      val rows = Metrics.classificationReport(d, "g", "p")
        .orderBy("label").collect()
      val x = rows.find(_.getString(0) == "x").get
      assert(x.getLong(1) === 2L && x.getLong(2) === 2L &&
        x.getLong(3) === 0L)
      assert(x.getDouble(4) === 0.0 && x.getDouble(5) === 0.0 &&
        x.getDouble(6) === 0.0, "p + r = 0 with both defined -> f1 0.0")
      val deadline = System.currentTimeMillis + 20000
      while (!dropped.contains(2L) && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(dropped.contains(2L), s"observe metric reported $dropped")
    } finally spark.listenerManager.unregister(listener)
  }

  test("classificationReport: empty input returns no rows; perfect " +
      "prediction is all-1.0") {
    assert(Metrics.classificationReport(
      Seq.empty[(String, String)].toDF("g", "p"), "g", "p")
      .collect().isEmpty)
    val perfect = Seq(("a", "a"), ("b", "b"), ("b", "b")).toDF("g", "p")
    val rows = Metrics.classificationReport(perfect, "g", "p").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0 &&
        r.getDouble(6) === 1.0)
    }
  }

  test("classificationReport plan: every consumer rides ONE contingency " +
      "exchange — items are scanned once") {
    // the tp diagonal as a ct.filter(__g === __p) branch gets its
    // grouping-key predicate pushed BELOW the aggregate, splitting the
    // exchange and re-scanning the corpus; the conditional-sum shape
    // keeps one scan (PlanAudit caught the 2-scan regression at q164)
    val d = Seq(("a", "a"), ("a", "b"), ("b", "b")).toDF("g", "p")
    val out = Metrics.classificationReport(d, "g", "p")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "LocalTableScan".r.findAllMatchIn(plan).length
    assert(scans == 1,
      s"expected ONE item scan, found $scans:\n" + plan.take(3000))
    assert(plan.contains("ReusedExchange"), plan.take(3000))
  }

  test("averagePrecision: sklearn step definition on hand-checked " +
      "fixtures, tie-robust, shard-invariant") {
    // y=[1,0,1] by score desc: AP = (1 + 2/3)/2 = 5/6
    val d = Seq((3.0, 1L), (2.0, 0L), (1.0, 1L)).toDF("s", "y")
    val r = Metrics.averagePrecision(d, col("s"), col("y")).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === BigDecimal(5.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // tied block is ONE threshold: scores [2,2] labels [1,0] -> 0.5
    val tied = Seq((2.0, 1L), (2.0, 0L)).toDF("s", "y")
    assert(Metrics.averagePrecision(tied, col("s"), col("y"))
      .head().getDouble(2) === 0.5)
    // perfect ranking 1.0; no positives -> NULL
    val perfect = Seq((3.0, 1L), (2.0, 1L), (1.0, 0L)).toDF("s", "y")
    assert(Metrics.averagePrecision(perfect, col("s"), col("y"))
      .head().getDouble(2) === 1.0)
    val nopos = Seq((1.0, 0L), (2.0, 0L)).toDF("s", "y")
    assert(Metrics.averagePrecision(nopos, col("s"), col("y"))
      .head().isNullAt(2))
    // parallel prefix == serial prefix (the aucRoc invariance)
    val events = spark.read.parquet(s"$sf001/events.parquet")
    val lab = when(col("event_type").isin("click", "purchase"), 1L)
      .otherwise(0L)
    val one = Metrics.averagePrecision(events, col("value"), lab,
      numShards = 1).head().getDouble(2)
    val many = Metrics.averagePrecision(events, col("value"), lab,
      numShards = 32).head().getDouble(2)
    assert(one === many)
    assert(one > 0.0 && one < 1.0)
  }

  test("rank metrics drop NaN/null scores — shard-invariant even with " +
      "unorderable values present") {
    // NaN sorts above every double under desc but the shard predicate
    // sends it low: without the drop, shard count would change the
    // answer. Both rank metrics share the guarded group front.
    val d = Seq((Double.NaN, 1L), (3.0, 1L), (2.0, 0L), (1.0, 1L))
      .toDF("s", "y")
      .union(Seq((Option.empty[Double], Option(0L))).toDF("s", "y"))
    val clean = Seq((3.0, 1L), (2.0, 0L), (1.0, 1L)).toDF("s", "y")
    Seq(1, 8).foreach { shards =>
      val ap = Metrics.averagePrecision(d, col("s"), col("y"), shards)
        .head()
      val apClean = Metrics.averagePrecision(
        clean, col("s"), col("y"), shards).head()
      assert(ap.getLong(0) === 2L && ap.getLong(1) === 1L,
        "NaN/null rows must not count toward either class")
      assert(ap.getDouble(2) === apClean.getDouble(2), s"AP at $shards")
      val auc = Metrics.aucRoc(d, col("s"), col("y"), shards).head()
      val aucClean = Metrics.aucRoc(
        clean, col("s"), col("y"), shards).head()
      assert(auc.getDouble(2) === aucClean.getDouble(2),
        s"AUC at $shards")
    }
  }

  test("expectedCalibrationError: hand-checked two-bin gaps, " +
      "well-calibrated bins score 0, empty input all-NULL") {
    // bins=2 over range [0,1]: bin0 = {0.1,0.2,0.3} pos 1/3, mean 0.2
    // -> gap 0.133333; bin1 = {0.9,0.8,0.7} pos 2/3, mean 0.8 -> gap
    // 0.133333; ece = max_gap = 0.133333
    val d = Seq((0.1, 0L), (0.2, 0L), (0.3, 1L), (0.9, 1L), (0.8, 1L),
      (0.7, 0L)).toDF("s", "y")
    val r = Metrics.expectedCalibrationError(d, col("s"), col("y"),
      bins = 2).collect().head
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.133333 && r.getDouble(3) === 0.133333)
    // per-bin mean score == positive rate -> zero everywhere
    val cal = Seq((0.0, 0L), (0.5, 0L), (0.5, 1L), (1.0, 1L))
      .toDF("s", "y")
    val rc = Metrics.expectedCalibrationError(cal, col("s"), col("y"),
      bins = 2).collect().head
    assert(rc.getDouble(2) === 0.0 && rc.getDouble(3) === 0.0)
    val re = Metrics.expectedCalibrationError(
      Seq.empty[(Double, Long)].toDF("s", "y"), col("s"), col("y"))
      .collect().head
    assert(re.getLong(0) === 0L && re.getLong(1) === 0L)
    assert(re.isNullAt(2) && re.isNullAt(3))
  }

  test("agreementStats: hand-checked binary confusion — kappa and MCC " +
      "against the textbook closed forms") {
    // tp=4 fn=1 fp=1 tn=2: accuracy 6/8, pe = (5*5+3*3)/64 = 0.53125,
    // kappa = (0.75-0.53125)/0.46875 = 7/15; binary MCC
    // (tp*tn - fp*fn)/sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn)) = 7/15 too
    // (symmetric marginals make them coincide)
    val rows = Seq.fill(4)(("pos", "pos")) ++ Seq(("pos", "neg")) ++
      Seq(("neg", "pos")) ++ Seq.fill(2)(("neg", "neg"))
    val r = Metrics.agreementStats(rows.toDF("g", "p"), "g", "p")
      .collect().head
    assert(r.getLong(0) === 8L)
    assert(r.getDouble(1) === 0.75)
    assert(r.getDouble(2) === 0.53125)
    val want = BigDecimal(7.0 / 15.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === want)
    assert(r.getDouble(4) === want)
  }

  test("agreementStats: perfect 1.0 / inverted -1.0 / constant-side " +
      "NULLs follow the documented conventions") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("b", "b")).toDF("g", "p")
    val rp = Metrics.agreementStats(perfect, "g", "p").collect().head
    assert(rp.getDouble(1) === 1.0 && rp.getDouble(3) === 1.0 &&
      rp.getDouble(4) === 1.0)
    // inverted binary, balanced: kappa = MCC = -1
    val inv = (Seq.fill(4)(("x", "y")) ++ Seq.fill(4)(("y", "x")))
      .toDF("g", "p")
    val ri = Metrics.agreementStats(inv, "g", "p").collect().head
    assert(ri.getDouble(1) === 0.0 && ri.getDouble(3) === -1.0 &&
      ri.getDouble(4) === -1.0)
    // constant PREDICTION, varied gold: chance explains all its
    // agreement -> kappa exactly 0; correlation undefined -> MCC NULL
    val const = Seq(("a", "a"), ("b", "a"), ("b", "a")).toDF("g", "p")
    val rc = Metrics.agreementStats(const, "g", "p").collect().head
    assert(rc.getDouble(3) === 0.0)
    assert(rc.isNullAt(4), "constant side must yield NULL mcc")
    // BOTH sides constant (same label): pe = 1 -> kappa NULL, MCC NULL,
    // accuracy still 1.0
    val both = Seq(("a", "a"), ("a", "a")).toDF("g", "p")
    val rb = Metrics.agreementStats(both, "g", "p").collect().head
    assert(rb.getDouble(1) === 1.0)
    assert(rb.isNullAt(3) && rb.isNullAt(4))
  }

  test("agreementStats: empty input -> (0, NULL x4); multiclass MCC " +
      "matches the Gorodkin R_K closed form") {
    val re = Metrics.agreementStats(
      Seq.empty[(String, String)].toDF("g", "p"), "g", "p")
      .collect().head
    assert(re.getLong(0) === 0L)
    (1 to 4).foreach(i => assert(re.isNullAt(i), s"col $i"))
    // 3-class: gold a,a,b,b,c,c; pred a,b,b,c,c,c
    // correct=4, N=6, t=(2,2,2), q=(1,2,3)
    // ptq=2+4+6=12, ptt=12, pqq=1+4+9=14
    // mcc = (24-12)/sqrt((36-12)(36-14)) = 12/sqrt(528)
    val d = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"),
      ("c", "c"), ("c", "c")).toDF("g", "p")
    val r = Metrics.agreementStats(d, "g", "p").collect().head
    val want = BigDecimal(12.0 / math.sqrt(24.0 * 22.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === want)
    // kappa from the same double steps the operator takes:
    // po = 4/6, pe = 12/36
    val wantK = BigDecimal(
      (4.0 / 6.0 - 12.0 / 36.0) / (1.0 - 12.0 / 36.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === wantK)
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
