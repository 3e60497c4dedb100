package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.RaterAgreement

/** Hand-computed fixtures for the multi-rater agreement metrics.
  * Fleiss: P-bar and P_e are exact fractions on the fixture, so the
  * expected kappa is an exact decimal (22/40 = 0.55). Krippendorff:
  * the variable-panel fixture's alpha folds to 1 - 6*2/20 = 0.4. */
class RaterAgreementSpec extends SparkTestBase {

  private def ratings(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("item", "cat")
  }

  test("fleiss kappa on a hand-computed 3x3 fixture") {
    // A: x,x,x  B: x,x,y  C: y,y,y  -> m=3, N=3
    // P-bar = (23-9)/(3*3*2) = 7/9; P_e = (25+16)/81 = 41/81
    // kappa = (63/81-41/81)/(40/81) = 22/40 = 0.55
    val df = ratings(
      "A" -> "x", "A" -> "x", "A" -> "x",
      "B" -> "x", "B" -> "x", "B" -> "y",
      "C" -> "y", "C" -> "y", "C" -> "y")
    val r = RaterAgreement.fleissKappa(df, "item", "cat").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_items") === 3L)
    assert(row.getAs[Long]("n_items_dropped") === 0L)
    assert(row.getAs[Long]("n_raters") === 3L)
    assert(row.getAs[Long]("n_categories") === 2L)
    assert(row.getAs[Double]("p_bar") === 0.777778)
    assert(row.getAs[Double]("p_e") === 0.506173)
    assert(row.getAs[Double]("fleiss_kappa") === 0.55)
  }

  test("fleiss drops off-modal items and reports the count") {
    val df = ratings(
      "A" -> "x", "A" -> "x", "A" -> "x",
      "B" -> "x", "B" -> "x", "B" -> "y",
      "C" -> "y", "C" -> "y", "C" -> "y",
      "D" -> "x", "D" -> "y") // m=2, off the modal 3 -> dropped
    val row = RaterAgreement.fleissKappa(df, "item", "cat").collect().head
    assert(row.getAs[Long]("n_items") === 3L)
    assert(row.getAs[Long]("n_items_dropped") === 1L)
    assert(row.getAs[Long]("n_raters") === 3L)
    // kappa unchanged by the dropped item
    assert(row.getAs[Double]("fleiss_kappa") === 0.55)
  }

  test("fleiss modal tie breaks to the larger panel") {
    val df = ratings(
      "A" -> "x", "A" -> "x",          // m=2
      "B" -> "x", "B" -> "y", "B" -> "y") // m=3
    val row = RaterAgreement.fleissKappa(df, "item", "cat").collect().head
    assert(row.getAs[Long]("n_raters") === 3L)
    assert(row.getAs[Long]("n_items") === 1L)
    assert(row.getAs[Long]("n_items_dropped") === 1L)
  }

  test("fleiss perfect agreement, one category -> p_e = 1, kappa null") {
    val df = ratings(
      "A" -> "x", "A" -> "x",
      "B" -> "x", "B" -> "x")
    val row = RaterAgreement.fleissKappa(df, "item", "cat").collect().head
    assert(row.getAs[Double]("p_bar") === 1.0)
    assert(row.getAs[Double]("p_e") === 1.0)
    assert(row.isNullAt(row.fieldIndex("fleiss_kappa")))
  }

  test("fleiss single-rating panel (m=1) -> null p_bar and kappa, " +
      "no divide-by-zero") {
    // ADVICE r14: every item rated exactly once makes P-bar's
    // denominator N·m·(m−1) zero — under ANSI mode that threw
    // DIVIDE_BY_ZERO at runtime. The degenerate panel now yields a
    // NULL p_bar/kappa row (per-item agreement needs ≥ 2 ratings),
    // mirroring the guarded p_e = 1 case; p_e itself stays defined.
    val df = ratings("A" -> "x", "B" -> "y", "C" -> "x")
    val row = RaterAgreement.fleissKappa(df, "item", "cat").collect().head
    assert(row.getAs[Long]("n_items") === 3L)
    assert(row.getAs[Long]("n_raters") === 1L)
    assert(row.isNullAt(row.fieldIndex("p_bar")))
    assert(row.isNullAt(row.fieldIndex("fleiss_kappa")))
    // P_e = (2² + 1²) / 3² = 5/9
    assert(row.getAs[Double]("p_e") === 0.555556)
  }

  test("fleiss null rows are dropped, not grouped") {
    val df = ratings(
      "A" -> "x", "A" -> "x",
      "B" -> "x", "B" -> "y")
      .union(ratings("C" -> "x").withColumn("cat",
        lit(null).cast("string")))
    val row = RaterAgreement.fleissKappa(df, "item", "cat").collect().head
    // C's lone null-category rating never forms an item
    assert(row.getAs[Long]("n_items") === 2L)
    assert(row.getAs[Long]("n_raters") === 2L)
  }

  test("krippendorff alpha on a variable-panel fixture") {
    // A: x,x (m=2)  B: x,x (m=2)  C: y (m=1, excluded)  D: x,y,y (m=3)
    // do_n = 0 + 0 + (9-5)/2 = 2; n = 7
    // margins x=5, y=2 -> de_n = 49 - 29 = 20
    // alpha = 1 - 6*2/20 = 0.4; d_o = 2/7; d_e = 20/42
    val df = ratings(
      "A" -> "x", "A" -> "x",
      "B" -> "x", "B" -> "x",
      "C" -> "y",
      "D" -> "x", "D" -> "y", "D" -> "y")
    val r = RaterAgreement.krippendorffAlpha(df, "item", "cat").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_items") === 3L)
    assert(row.getAs[Long]("n_ratings") === 7L)
    assert(row.getAs[Double]("d_o") === 0.285714)
    assert(row.getAs[Double]("d_e") === 0.47619)
    assert(row.getAs[Double]("krippendorff_alpha") === 0.4)
  }

  test("krippendorff: unanimity -> alpha 1; single category -> null") {
    val unanimous = ratings(
      "A" -> "x", "A" -> "x",
      "B" -> "y", "B" -> "y")
    val r1 = RaterAgreement.krippendorffAlpha(unanimous, "item", "cat")
      .collect().head
    assert(r1.getAs[Double]("krippendorff_alpha") === 1.0)
    // every rating the same category: de_n = n^2 - n^2 = 0 -> undefined
    val degenerate = ratings(
      "A" -> "x", "A" -> "x",
      "B" -> "x", "B" -> "x")
    val r2 = RaterAgreement.krippendorffAlpha(degenerate, "item", "cat")
      .collect().head
    assert(r2.isNullAt(r2.fieldIndex("krippendorff_alpha")))
  }

  test("fleiss equals the oracle arithmetic on real data (lineitem)") {
    // cross-check the distributed fold against a driver-side replay of
    // the same integer sums on the sf0.001 contingency
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_orderkey").as("item"), col("l_returnflag").as("cat"))
    val got = RaterAgreement.fleissKappa(li, "item", "cat").collect().head

    val ct = li.groupBy("item", "cat").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byItem = ct.groupBy(_._1).toSeq.map { case (_, rs) =>
      (rs.map(_._3).sum, rs.map(x => x._3 * x._3).sum)
    }
    val modalM = byItem.groupBy(_._1).toSeq
      .maxBy { case (m, xs) => (xs.size, m) }._1
    val kept = byItem.filter(_._1 == modalM)
    val keptItems = ct.groupBy(_._1)
      .filter { case (_, rs) => rs.map(_._3).sum == modalM }
    val nItems = kept.size.toLong
    val totSq = kept.map(_._2).sum
    val nj = keptItems.values.flatten.groupBy(_._2)
      .map { case (_, rs) => rs.map(_._3).sum }
    val nm = nItems * modalM
    val pBar = (totSq - nm).toDouble / (nm * (modalM - 1)).toDouble
    val pE = nj.map(x => BigInt(x) * BigInt(x)).sum.toDouble /
      (BigInt(nm) * BigInt(nm)).toDouble
    val kappa = (pBar - pE) / (1.0 - pE)
    assert(got.getAs[Long]("n_items") === nItems)
    assert(got.getAs[Long]("n_raters") === modalM)
    assert(math.abs(got.getAs[Double]("fleiss_kappa") - kappa) < 1e-6)
  }
}
