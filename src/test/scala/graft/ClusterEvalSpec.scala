package graft

import graft.operators.ClusterEval
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ClusterEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Row =
    df.collect() match {
      case Array(r) => r
      case rs => fail(s"expected ONE row, got ${rs.length}")
    }

  test("agreement: hand-checked contingency (the Hubert-Arabie example " +
      "shape)") {
    // A = [1,1,1,2,2,2], B = [1,1,2,2,3,3]; contingency
    // (a1,b1)=2 (a1,b2)=1 (a2,b2)=1 (a2,b3)=2.
    // pab = 2, pa = 6, pb = 3, T = 15.
    // precision 2/3, recall 2/6, f1 4/9,
    // ari = (2 - 18/15) / (4.5 - 18/15) = 0.8/3.3.
    val d = Seq((1, "x"), (1, "x"), (1, "y"), (2, "y"), (2, "z"),
      (2, "z")).toDF("a", "b")
    val r = one(ClusterEval.agreement(d, "a", "b"))
    assert(r.getLong(0) === 6L)
    assert(r.getDouble(1) === 0.666667)
    assert(r.getDouble(2) === 0.333333)
    assert(r.getDouble(3) === 0.444444)
    assert(r.getDouble(4) === BigDecimal(0.8 / 3.3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("agreement: identical partitions score 1.0 everywhere, " +
      "independent of label VALUES") {
    // b is a relabeling of a (different type, different values) — pair
    // structure identical, so every metric is exactly 1
    val d = Seq((1, "p"), (1, "p"), (2, "q"), (2, "q"), (3, "r"))
      .toDF("a", "b")
    val r = one(ClusterEval.agreement(d, "a", "b"))
    assert(r.getLong(0) === 5L)
    assert(r.getDouble(1) === 1.0 && r.getDouble(2) === 1.0 &&
      r.getDouble(3) === 1.0 && r.getDouble(4) === 1.0)
  }

  test("agreement: all-singleton prediction -> precision NULL (0/0), " +
      "recall 0, f1 NULL, ari 0") {
    // B predicts NO pair; of A's pairs it recovers none. ARI: pab=0,
    // expected=0 (pb=0), maxIndex=pa/2>0 -> exactly 0, the
    // "no better than an empty prediction" point on the chance scale.
    val d = Seq((1, 10), (1, 11), (2, 12), (2, 13)).toDF("a", "b")
    val r = one(ClusterEval.agreement(d, "a", "b"))
    assert(r.isNullAt(1), "precision must be NULL when B has no pairs")
    assert(r.getDouble(2) === 0.0)
    assert(r.isNullAt(3), "f1 must be NULL when precision is NULL")
    assert(r.getDouble(4) === 0.0)
  }

  test("agreement: trivial-limit partitions (both singletons / both " +
      "one-cluster) -> ari 1.0 by convention") {
    // both all-singletons: maxIndex == expectedIndex == 0 — the
    // partitions are necessarily identical; scikit-learn convention 1.0
    val singletons = Seq((1, 10), (2, 11), (3, 12)).toDF("a", "b")
    val rs = one(ClusterEval.agreement(singletons, "a", "b"))
    assert(rs.isNullAt(1) && rs.isNullAt(2) && rs.isNullAt(3))
    assert(rs.getDouble(4) === 1.0)
    // both one-cluster: pa = pb = pab = T, denominator 0, same limit
    val oneCluster = Seq((7, "k"), (7, "k"), (7, "k")).toDF("a", "b")
    val rc = one(ClusterEval.agreement(oneCluster, "a", "b"))
    assert(rc.getDouble(1) === 1.0 && rc.getDouble(2) === 1.0 &&
      rc.getDouble(3) === 1.0 && rc.getDouble(4) === 1.0)
  }

  test("agreement: anti-correlated partitions go NEGATIVE (worse than " +
      "chance), f1 0.0 with both sides defined") {
    // A = [1,2,1,2], B = [1,1,2,2]: zero agreed pairs but both sides
    // predict pairs -> p = r = f1 = 0.0 (not NULL);
    // ari = (0 - 2*2/6) / (2 - 2*2/6) = -0.5
    val d = Seq((1, "x"), (2, "x"), (1, "y"), (2, "y")).toDF("a", "b")
    val r = one(ClusterEval.agreement(d, "a", "b"))
    assert(r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0 &&
      r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === -0.5)
  }

  test("agreement: null labels on EITHER side are excluded and counted " +
      "by the observe metric") {
    // collect every delivery: suites share one session and q161 runs
    // agreement concurrently from QueriesSpec with its own (0-dropped)
    // metric — a single last-writer slot would flake
    val dropped = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft.cluster_eval.agreement"))
            dropped.add(
              row.getLong(row.fieldIndex("null_label_rows_dropped")))
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val d = Seq((Some(1), Some("x")), (Some(1), Some("x")),
        (None, Some("x")), (Some(2), None), (None, None))
        .toDF("a", "b")
      val r = one(ClusterEval.agreement(d, "a", "b"))
      // survivors: two (1,"x") rows — identical partitions of 2 items
      assert(r.getLong(0) === 2L)
      assert(r.getDouble(4) === 1.0)
      val deadline = System.currentTimeMillis + 20000
      while (!dropped.contains(3L) && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(dropped.contains(3L), s"observe metric reported $dropped")
    } finally spark.listenerManager.unregister(listener)
  }

  test("agreement: empty input -> canonical (0, NULL, NULL, NULL, NULL) " +
      "row") {
    val d = Seq.empty[(Int, String)].toDF("a", "b")
    val r = one(ClusterEval.agreement(d, "a", "b"))
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) &&
      r.isNullAt(4))
  }

  test("pairsOf: exact C(n,2) far past int64 and 2^53 — the decimal " +
      "path the 100 TB pair counts ride") {
    // a 10^12-item corpus has ~5·10^23 pairs: past BIGINT (9.2·10^18)
    // and past double's 53-bit mantissa. pairsOf must stay bit-exact
    // there; compare against BigInt arithmetic at the extremes.
    val ns = Seq(0L, 1L, 2L, 3L, 4_294_967_296L /* 2^32 */,
      1_000_000_000_000L, Long.MaxValue - 1, Long.MaxValue)
    val got = ns.toDF("n")
      .select(col("n"), ClusterEval.pairsOf(col("n")).as("p"))
      .collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).toBigInteger).toMap
    ns.foreach { n =>
      val want = (BigInt(n) * BigInt(n - 1) / 2).bigInteger
      assert(got(n) === want, s"C($n,2)")
    }
  }

  // ---- informationAgreement --------------------------------------------

  /** Mini-reference replicating the operator's quantization contract:
    * each p·ln(p) term rounded to 1e-10 (HALF_UP), exact-decimal sums,
    * double ratios, 6-dp outputs. */
  private def infoReference(items: Seq[(Int, String)])
      : (Double, Double, Double, Double, Double, Double, Double) = {
    def q10(x: Double): BigDecimal =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val n = items.size.toDouble
    val ct = items.groupBy(identity).view.mapValues(_.size).toMap
    val na = items.groupBy(_._1).view.mapValues(_.size).toMap
    val nb = items.groupBy(_._2).view.mapValues(_.size).toMap
    val ha = -na.values.map(c => q10(c / n * math.log(c / n))).sum.toDouble
    val hb = -nb.values.map(c => q10(c / n * math.log(c / n))).sum.toDouble
    val hj = -ct.values.map(c => q10(c / n * math.log(c / n))).sum.toDouble
    val mi = math.max(0.0, ha + hb - hj) // H(A) + H(B) − H(A,B)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hom = if (ha == 0.0) 1.0 else math.min(mi / ha, 1.0)
    val com = if (hb == 0.0) 1.0 else math.min(mi / hb, 1.0)
    val nmi =
      if (ha == 0.0 && hb == 0.0) 1.0
      else if (mi == 0.0) 0.0
      else math.min(mi / ((ha + hb) / 2.0), 1.0)
    val v = if (hom + com == 0.0) 0.0 else 2.0 * hom * com / (hom + com)
    (r6(ha), r6(hb), r6(mi), r6(nmi), r6(hom), r6(com), r6(v))
  }

  test("informationAgreement: hand-checked entropies/MI on the shared " +
      "fixture; homogeneity is exactly MI/H(A)") {
    // A = [1,1,1,2,2,2], B = [1,1,2,2,3,3]: H(A)=ln2, H(B)=ln3,
    // MI = (2/3)ln2 -> homogeneity EXACTLY 2/3; V == arithmetic-NMI
    // (the Rosenberg-Hirschberg identity)
    val items = Seq((1, "x"), (1, "x"), (1, "y"), (2, "y"), (2, "z"),
      (2, "z"))
    val r = one(ClusterEval.informationAgreement(
      items.toDF("a", "b"), "a", "b"))
    val (ha, hb, mi, nmi, hom, com, v) = infoReference(items)
    assert(r.getLong(0) === 6L)
    assert(r.getDouble(1) === ha && ha === 0.693147)
    assert(r.getDouble(2) === hb && hb === 1.098612)
    assert(r.getDouble(3) === mi && mi === 0.462098)
    assert(r.getDouble(4) === nmi)
    assert(r.getDouble(5) === hom && hom === 0.666667)
    assert(r.getDouble(6) === com)
    assert(r.getDouble(7) === v)
    assert(math.abs(r.getDouble(4) - r.getDouble(7)) <= 1e-6,
      "arithmetic NMI and V-measure are the same statistic")
  }

  test("informationAgreement: identical partitions -> everything 1.0, " +
      "MI == H") {
    val d = Seq((1, "p"), (1, "p"), (2, "q"), (3, "r")).toDF("a", "b")
    val r = one(ClusterEval.informationAgreement(d, "a", "b"))
    assert(r.getDouble(1) === r.getDouble(2))
    assert(r.getDouble(3) === r.getDouble(1), "MI == H for identical")
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0 &&
      r.getDouble(6) === 1.0 && r.getDouble(7) === 1.0)
  }

  test("informationAgreement: trivial and half-trivial limits follow " +
      "the sklearn conventions") {
    // both single-cluster: H=0 both sides -> NMI 1.0, hom/com/v 1.0
    val both = Seq((7, "k"), (7, "k")).toDF("a", "b")
    val rb = one(ClusterEval.informationAgreement(both, "a", "b"))
    assert(rb.getDouble(1) === 0.0 && rb.getDouble(2) === 0.0)
    assert(rb.getDouble(4) === 1.0 && rb.getDouble(7) === 1.0)
    // A single-cluster, B not: MI 0 -> NMI 0.0; homogeneity 1.0
    // (H(A)=0 — nothing to violate), completeness 0, V 0
    val half = Seq((7, "x"), (7, "y")).toDF("a", "b")
    val rh = one(ClusterEval.informationAgreement(half, "a", "b"))
    assert(rh.getDouble(1) === 0.0 && rh.getDouble(2) > 0.0)
    assert(rh.getDouble(3) === 0.0 && rh.getDouble(4) === 0.0)
    assert(rh.getDouble(5) === 1.0 && rh.getDouble(6) === 0.0 &&
      rh.getDouble(7) === 0.0)
  }

  test("informationAgreement: independent partitions -> MI exactly 0, " +
      "NMI/hom/com/v all 0") {
    // A = [1,2,1,2], B = [1,1,2,2]: every cell n_ab=1 carries
    // ln(4/(2*2)) = ln 1 = 0
    val d = Seq((1, "x"), (2, "x"), (1, "y"), (2, "y")).toDF("a", "b")
    val r = one(ClusterEval.informationAgreement(d, "a", "b"))
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0)
    assert(r.getDouble(5) === 0.0 && r.getDouble(6) === 0.0 &&
      r.getDouble(7) === 0.0)
  }

  test("informationAgreement: empty input and null-label drops follow " +
      "the agreement contract") {
    val empty = Seq.empty[(Int, String)].toDF("a", "b")
    val re = one(ClusterEval.informationAgreement(empty, "a", "b"))
    assert(re.getLong(0) === 0L)
    (1 to 7).foreach(i => assert(re.isNullAt(i), s"col $i"))
    // de-flaked like the agreement test: q163 delivers its own metric
    // concurrently from QueriesSpec
    val dropped = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft.cluster_eval.info"))
            dropped.add(
              row.getLong(row.fieldIndex("null_label_rows_dropped")))
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val d = Seq((Some(1), Some("x")), (None, Some("x")),
        (Some(1), None)).toDF("a", "b")
      val r = one(ClusterEval.informationAgreement(d, "a", "b"))
      assert(r.getLong(0) === 1L)
      val deadline = System.currentTimeMillis + 20000
      while (!dropped.contains(2L) && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(dropped.contains(2L), s"observe metric reported $dropped")
    } finally spark.listenerManager.unregister(listener)
  }

  test("informationAgreement: seeded random partitions match the " +
      "quantized mini-reference bit-for-bit") {
    val rnd = new scala.util.Random(20260815L)
    val items = Seq.tabulate(500)(i =>
      (rnd.nextInt(7), s"c${rnd.nextInt(11)}"))
    val r = one(ClusterEval.informationAgreement(
      items.toDF("a", "b"), "a", "b"))
    val (ha, hb, mi, nmi, hom, com, v) = infoReference(items)
    assert(r.getDouble(1) === ha && r.getDouble(2) === hb &&
      r.getDouble(3) === mi && r.getDouble(4) === nmi &&
      r.getDouble(5) === hom && r.getDouble(6) === com &&
      r.getDouble(7) === v)
  }

  // ---- bCubed ------------------------------------------------------------

  /** Mini-reference with the operator's exact quantization: per-cell
    * n²/marginal rounded to 1e-10, decimal sums, double ratios. */
  private def b3Reference(items: Seq[(Int, String)])
      : (Double, Double, Double) = {
    def q10(x: Double): BigDecimal =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val n = items.size.toDouble
    val ct = items.groupBy(identity).view.mapValues(_.size).toMap
    val na = items.groupBy(_._1).view.mapValues(_.size).toMap
    val nb = items.groupBy(_._2).view.mapValues(_.size).toMap
    val ps = ct.map { case ((_, b), c) =>
      q10(c.toDouble * c.toDouble / nb(b)) }.sum.toDouble / n
    val rs = ct.map { case ((a, _), c) =>
      q10(c.toDouble * c.toDouble / na(a)) }.sum.toDouble / n
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r6(ps), r6(rs), r6(2.0 * ps * rs / (ps + rs)))
  }

  test("bCubed: hand-checked per-item averages on the shared fixture") {
    // A = [1,1,1,2,2,2], B = [1,1,2,2,3,3]:
    // B3P = (4/2 + 1/2 + 1/2 + 4/2)/6 = 5/6, B3R = (10/3)/6 = 5/9,
    // F1 = 2/3 exactly
    val items = Seq((1, "x"), (1, "x"), (1, "y"), (2, "y"), (2, "z"),
      (2, "z"))
    val r = one(ClusterEval.bCubed(items.toDF("a", "b"), "a", "b"))
    val (p, rc, f1) = b3Reference(items)
    assert(r.getLong(0) === 6L)
    assert(r.getDouble(1) === p && p === 0.833333)
    assert(r.getDouble(2) === rc && rc === 0.555556)
    assert(r.getDouble(3) === f1 && f1 === 0.666667)
  }

  test("bCubed is total at the limits pair/info metrics special-case: " +
      "singleton and one-cluster predictions get real numbers") {
    // identical partitions: all 1.0
    val same = Seq((1, "p"), (1, "p"), (2, "q")).toDF("a", "b")
    val rs = one(ClusterEval.bCubed(same, "a", "b"))
    assert(rs.getDouble(1) === 1.0 && rs.getDouble(2) === 1.0 &&
      rs.getDouble(3) === 1.0)
    // all-singleton prediction: PERFECT precision, recall 1/|class|
    val single = Seq((1, "s1"), (1, "s2")).toDF("a", "b")
    val r1 = one(ClusterEval.bCubed(single, "a", "b"))
    assert(r1.getDouble(1) === 1.0)
    assert(r1.getDouble(2) === 0.5)
    assert(r1.getDouble(3) === 0.666667)
    // one-cluster prediction over two classes: the mirror image
    val lump = Seq((1, "k"), (2, "k")).toDF("a", "b")
    val r2 = one(ClusterEval.bCubed(lump, "a", "b"))
    assert(r2.getDouble(1) === 0.5 && r2.getDouble(2) === 1.0)
  }

  test("bCubed: empty -> (0, NULL x3); null labels dropped; seeded " +
      "random partitions match the quantized mini-reference") {
    val re = one(ClusterEval.bCubed(
      Seq.empty[(Int, String)].toDF("a", "b"), "a", "b"))
    assert(re.getLong(0) === 0L)
    (1 to 3).foreach(i => assert(re.isNullAt(i), s"col $i"))
    val withNulls = Seq((Some(1), Some("x")), (None, Some("x")),
      (Some(1), None)).toDF("a", "b")
    assert(one(ClusterEval.bCubed(withNulls, "a", "b"))
      .getLong(0) === 1L)
    val rnd = new scala.util.Random(20260815L)
    val items = Seq.tabulate(400)(_ =>
      (rnd.nextInt(6), s"c${rnd.nextInt(9)}"))
    val r = one(ClusterEval.bCubed(items.toDF("a", "b"), "a", "b"))
    val (p, rc, f1) = b3Reference(items)
    assert(r.getDouble(1) === p && r.getDouble(2) === rc &&
      r.getDouble(3) === f1)
  }

  test("agreement plan: metrics derive from the contingency table — " +
      "no join or exchange carries item-sized rows twice") {
    // one wide shuffle (groupBy a,b over items); the three metric
    // aggregates ship contingency rows only. Guard: no SortMergeJoin /
    // CartesianProduct over the ITEM frame — the only joins are
    // 1-row-by-1-row scalar cross joins.
    val d = Seq((1, "x"), (1, "y"), (2, "y")).toDF("a", "b")
    val out = ClusterEval.agreement(d, "a", "b")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }
}
