package graft

import org.apache.spark.sql.functions._
import graft.operators.Drift

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private val edges = Seq(10.0, 20.0, 40.0)

  test("binIndex: below first edge is 0, edges are left-closed") {
    val df = Seq(5.0, 10.0, 19.9, 20.0, 39.9, 40.0, 1e9).toDF("v")
      .select(Drift.binIndex(col("v"), edges).as("b"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 1, 1, 2, 2, 3, 3))
  }

  test("identical snapshots: psi and tvd are exactly zero") {
    val a = Seq(1.0, 12.0, 25.0, 50.0, 50.0).toDF("v")
    val rows = Drift.psi(a, a, "v", edges).collect()
    assert(rows.length == edges.size + 1)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("psi_term")) == 0.0)
      assert(r.getDouble(r.fieldIndex("psi_total")) == 0.0)
      assert(r.getDouble(r.fieldIndex("tvd")) == 0.0)
    }
  }

  test("bin counts partition both frames; empty bins stay finite") {
    val ref = Seq(1.0, 2.0, 3.0, 15.0).toDF("v")     // nothing >= 20
    val cur = Seq(25.0, 45.0, 45.0).toDF("v")        // nothing < 20
    val rows = Drift.psi(ref, cur, "v", edges).collect()
    assert(rows.map(_.getLong(1)).sum == 4L)
    assert(rows.map(_.getLong(2)).sum == 3L)
    rows.foreach { r =>
      val t = r.getDouble(r.fieldIndex("psi_term"))
      assert(!t.isNaN && !t.isInfinite)
    }
    // total mass shift: psi strictly positive, tvd in (0, 1]
    val psi = rows.head.getDouble(rows.head.fieldIndex("psi_total"))
    val tvd = rows.head.getDouble(rows.head.fieldIndex("tvd"))
    assert(psi > 0.0)
    assert(tvd > 0.0 && tvd <= 1.0)
  }

  test("psi is symmetric under swapping ref and cur") {
    val ref = Seq(1.0, 2.0, 15.0, 15.0, 25.0).toDF("v")
    val cur = Seq(15.0, 25.0, 45.0).toDF("v")
    val ab = Drift.psi(ref, cur, "v", edges)
      .select("psi_total").head().getDouble(0)
    val ba = Drift.psi(cur, ref, "v", edges)
      .select("psi_total").head().getDouble(0)
    // each term (p-q)ln(p/q) is symmetric; totals agree to the round-6
    assert(math.abs(ab - ba) <= 1e-6)
  }

  test("psiSeries with one group reproduces psi's whole-frame totals") {
    val ref = Seq(1.0, 2.0, 15.0, 15.0, 25.0).toDF("v")
    val cur = Seq(15.0, 25.0, 45.0).toDF("v")
    val once = Drift.psi(ref, cur, "v", edges).head()
    val series = Drift.psiSeries(ref,
      cur.withColumn("g", lit(7L)), "v", "g", edges).head()
    assert(series.getLong(series.fieldIndex("grp")) == 7L)
    assert(series.getLong(series.fieldIndex("n_cur")) == 3L)
    assert(series.getDouble(series.fieldIndex("psi")) ==
      once.getDouble(once.fieldIndex("psi_total")))
    assert(series.getDouble(series.fieldIndex("tvd")) ==
      once.getDouble(once.fieldIndex("tvd")))
  }

  test("psiSeries: per-group rows are independent of other groups") {
    val ref = Seq(1.0, 12.0, 25.0, 50.0).toDF("v")
    val curA = Seq((1L, 1.0), (1L, 12.0), (1L, 25.0), (1L, 50.0))
    val curB = Seq((2L, 45.0), (2L, 45.0), (2L, 45.0))
    val both = Drift.psiSeries(ref,
      (curA ++ curB).toDF("g", "v"), "v", "g", edges)
      .collect().map(r => r.getLong(0) -> r).toMap
    val alone = Drift.psiSeries(ref,
      curB.toDF("g", "v"), "v", "g", edges).head()
    // identical-to-ref group drifts zero; skewed group matches its solo run
    assert(both(1L).getDouble(both(1L).fieldIndex("psi")) == 0.0)
    assert(both(2L).getDouble(both(2L).fieldIndex("psi")) ==
      alone.getDouble(alone.fieldIndex("psi")))
    assert(both(2L).getDouble(both(2L).fieldIndex("tvd")) ==
      alone.getDouble(alone.fieldIndex("tvd")))
  }

  test("drift on real events: type-split frames produce a finite profile") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
    val rows = Drift.psi(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"),
      "value", Seq(5, 10, 20, 40, 80, 160, 320)).collect()
    assert(rows.length == 8)
    val psi = rows.head.getDouble(rows.head.fieldIndex("psi_total"))
    assert(psi >= 0.0 && psi < 1.0) // same synthetic generator: low drift
  }

  private def tok(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("src", "token")
  }

  test("unigramDivergence: a lone source IS the global -> zero drift") {
    val out = Drift.unigramDivergence(
      tok("s1" -> "a", "s1" -> "a", "s1" -> "b"), "src", "token", 1)
      .collect().head
    assert(out.getAs[Long]("n_tokens") === 3L)
    // vocabSize=1 keeps only 'a'; 'b' lands in <oov> (1 of 3 tokens)
    assert(out.getAs[Double]("oov_frac") === 0.333333)
    assert(out.getAs[Double]("kl_vs_global") === 0.0)
    assert(out.getAs[Double]("js_vs_global") === 0.0)
  }

  test("unigramDivergence: identical distributions both read zero") {
    val out = Drift.unigramDivergence(
      tok("s1" -> "a", "s1" -> "b", "s2" -> "a", "s2" -> "b"),
      "src", "token", 10)
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("s1", "s2").foreach { s =>
      assert(out(s).getAs[Double]("kl_vs_global") === 0.0)
      assert(out(s).getAs[Double]("js_vs_global") === 0.0)
    }
  }

  test("unigramDivergence matches the formula on a skewed fixture") {
    // s1 = [a,a], s2 = [a,b]; global: a 3/4, b 1/4
    val out = Drift.unigramDivergence(
      tok("s1" -> "a", "s1" -> "a", "s2" -> "a", "s2" -> "b"),
      "src", "token", 10)
      .collect().map(r => r.getString(0) -> r).toMap
    def kl(p: Seq[Double], q: Seq[Double]): Double =
      p.zip(q).collect { case (pi, qi) if pi > 0 =>
        pi * math.log(pi / qi) }.sum
    def js(p: Seq[Double], q: Seq[Double]): Double = {
      val m = p.zip(q).map { case (a, b) => (a + b) / 2 }
      (kl(p, m) + kl(q, m)) / 2
    }
    val q = Seq(0.75, 0.25)
    assert(math.abs(out("s1").getAs[Double]("kl_vs_global") -
      kl(Seq(1.0, 0.0), q)) < 1e-5)
    assert(math.abs(out("s1").getAs[Double]("js_vs_global") -
      js(Seq(1.0, 0.0), q)) < 1e-5)
    assert(math.abs(out("s2").getAs[Double]("kl_vs_global") -
      kl(Seq(0.5, 0.5), q)) < 1e-5)
    assert(math.abs(out("s2").getAs[Double]("js_vs_global") -
      js(Seq(0.5, 0.5), q)) < 1e-5)
    // both sources carry drift against the blended global
    assert(out("s1").getAs[Double]("js_vs_global") > 0.0)
    assert(out("s2").getAs[Double]("js_vs_global") > 0.0)
  }

  test("referenceProfile: vocab cut, smoothing, and mass sum to 1") {
    import spark.implicits._
    val ref = Seq("a", "a", "a", "b", "b", "c").toDF("token")
    val (vocab, refQ) = Drift.referenceProfile(ref, "token", 2)
    assert(vocab === Seq("a", "b")) // top-2 by (count desc, token)
    // q = (n+1)/(total+k+1): a=(3+1)/9, b=(2+1)/9, oov=(1+1)/9
    assert(refQ === Seq(4.0 / 9, 3.0 / 9, 2.0 / 9))
    assert(math.abs(refQ.sum - 1.0) < 1e-12)
  }

  test("divergenceVsReference: hand-replayed divergences, oov floor-ppm") {
    import spark.implicits._
    val ref = Seq("a", "a", "a", "b", "b", "c").toDF("token")
    val (vocab, refQ) = Drift.referenceProfile(ref, "token", 2)
    // group g1 = [a,a,b] (all in vocab), g2 = [z,z,a] (2/3 oov)
    val cur = Seq("g1" -> "a", "g1" -> "a", "g1" -> "b",
      "g2" -> "z", "g2" -> "z", "g2" -> "a").toDF("grp", "token")
    val out = Drift.divergenceVsReference(cur, "grp", "token", vocab, refQ)
      .collect().map(r => r.getString(0) -> r).toMap
    def q10(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def expected(p: Seq[Double]): (Double, Double) = {
      val kl = p.zip(refQ).collect { case (pi, qi) if pi > 0 =>
        q12(pi * q10(math.log(pi / qi))) }.sum
      val jsp = p.zip(refQ).collect { case (pi, qi) if pi > 0 =>
        q12(pi * q10(math.log(pi / ((pi + qi) / 2)))) }.sum
      val jsq = p.zip(refQ).map { case (pi, qi) =>
        q12(qi * q10(math.log(qi / ((pi + qi) / 2)))) }.sum
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r6(kl.toDouble), r6((jsp + jsq).toDouble / 2.0))
    }
    val (kl1, js1) = expected(Seq(2.0 / 3, 1.0 / 3, 0.0))
    assert(out("g1").getAs[Long]("n_tokens") === 3L)
    assert(out("g1").getAs[Double]("oov_frac") === 0.0)
    assert(out("g1").getAs[Double]("kl_vs_ref") === kl1)
    assert(out("g1").getAs[Double]("js_vs_ref") === js1)
    val (kl2, js2) = expected(Seq(1.0 / 3, 0.0, 2.0 / 3))
    // floor-ppm of 2/3
    assert(out("g2").getAs[Double]("oov_frac") === 0.666666)
    assert(out("g2").getAs[Double]("kl_vs_ref") === kl2)
    assert(out("g2").getAs[Double]("js_vs_ref") === js2)
  }

  test("divergenceVsReference is partitioning-invariant (merge path)") {
    import spark.implicits._
    val tok = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token"))
    val ref = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("lang") === "en")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
    val (vocab, refQ) = Drift.referenceProfile(ref, "token", 50)
    def run(df: org.apache.spark.sql.DataFrame) =
      Drift.divergenceVsReference(df, "source", "token", vocab, refQ)
        .orderBy("source").collect().toSeq
    assert(run(tok.repartition(1)) === run(tok.repartition(7)))
  }

  test("unigramDivergence: js is bounded by ln 2 on disjoint vocab") {
    val out = Drift.unigramDivergence(
      tok("s1" -> "a", "s1" -> "a", "s2" -> "b", "s2" -> "b"),
      "src", "token", 10)
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("s1", "s2").foreach { s =>
      val v = out(s).getAs[Double]("js_vs_global")
      assert(v > 0.0 && v <= math.log(2.0) + 1e-9)
    }
    // symmetric fixture -> symmetric divergences
    assert(out("s1").getAs[Double]("js_vs_global") ===
      out("s2").getAs[Double]("js_vs_global"))
  }

  test("null-twin parity (NullGroupParity helper): psiSeries measures " +
      "a null group exactly like its named twin") {
    // the durable convention behind the round-17 manual sweep: clone
    // group 2 as a null group beside an UNRELATED group 3 and demand
    // identical drift numbers. Pre-fix, the null group's counts
    // null-rejected out of the (groups x bins) frame and the row came
    // back as a WRONG uniform profile.
    val ref = Seq(1.0, 12.0, 25.0, 50.0).toDF("v")
    val base = Seq((2L, 45.0), (2L, 45.0), (2L, 8.0),
      (3L, 15.0), (3L, 22.0)).toDF("g", "v")
    NullGroupParity.assertParity(
      base, "g", 2L,
      df => Drift.psiSeries(ref, df, "v", "g", edges),
      sig = half => half.select("psi", "tvd", "n_cur")
        .collect().map(_.toString).toSeq,
      resultGroupCol = Some("grp")) // psiSeries renames the group col
  }

  test("psiSeries: a NULL group is measured, not zeroed (null-safe " +
      "count join-back)") {
    // the null group's rows are a copy of group 2's; before the
    // round-17 null-safe join its counts null-rejected out of the
    // (groups x bins) frame and the row came back as a WRONG uniform
    // profile (n_cur 0 in every bin)
    val ref = Seq(1.0, 12.0, 25.0, 50.0).toDF("v")
    val cur = Seq((Some(2L), 45.0), (Some(2L), 45.0), (Some(2L), 45.0),
      (None, 45.0), (None, 45.0), (None, 45.0)).toDF("g", "v")
    val rows = Drift.psiSeries(ref, cur, "v", "g", edges).collect()
    assert(rows.length == 2)
    val byGrp = rows.map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r).toMap
    val nullRow = byGrp(None)
    val twoRow = byGrp(Some(2L))
    assert(nullRow.getLong(nullRow.fieldIndex("n_cur")) == 3L)
    // identical underlying rows -> identical drift as the named group
    assert(nullRow.getDouble(nullRow.fieldIndex("psi")) ==
      twoRow.getDouble(twoRow.fieldIndex("psi")))
    assert(nullRow.getDouble(nullRow.fieldIndex("tvd")) ==
      twoRow.getDouble(twoRow.fieldIndex("tvd")))
  }
}
