package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** k-anonymity / l-diversity audit: hand fixtures pin the group math,
  * the null contracts (null QI = visible group; null sensitive values
  * don't count toward diversity), and the floor-ppm suppression share. */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    // group (a, 1): 3 rows, 2 distinct sensitive values
    ("a", 1, 10L), ("a", 1, 10L), ("a", 1, 20L),
    // group (a, 2): 1 row — below any k ≥ 2
    ("a", 2, 10L),
    // group (b, 1): 2 rows, sensitive constant — k-anonymous at 2, not
    // 2-diverse
    ("b", 1, 30L), ("b", 1, 30L),
    // null QI: its own visible group
    (null.asInstanceOf[String], 1, 40L)
  ).toDF("seg", "region", "salary")

  test("per-group audit: counts, distinct sensitive, both flags") {
    val out = Privacy.anonymityAudit(rows, Seq("seg", "region"),
        col("salary"), k = 2, l = 2)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(out(("a", 1)) === ((3L, 2L, true, true)))
    assert(out(("a", 2)) === ((1L, 1L, false, false)))
    assert(out(("b", 1)) === ((2L, 1L, true, false))) // constant sensitive
    assert(out(("<null>", 1)) === ((1L, 1L, false, false)))
    assert(out.size === 4)
  }

  test("null sensitive values don't count toward diversity") {
    val df = Seq(("g", Some(1L)), ("g", None), ("g", None))
      .toDF("qi", "sens")
    val r = Privacy.anonymityAudit(df, Seq("qi"), col("sens"), 3, 2)
      .collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("n_sensitive") === 1L) // the two nulls ignored
    assert(r.getAs[Boolean]("k_anonymous"))
    assert(!r.getAs[Boolean]("l_diverse"))
  }

  test("suppression summary: floor-ppm of rows in groups below k") {
    val out = Privacy.suppressionSummary(rows, Seq("seg", "region"), k = 2)
      .collect().head
    assert(out.getAs[Long]("n_rows") === 7L)
    assert(out.getAs[Long]("n_groups") === 4L)
    // groups below 2: (a,2) with 1 row + (null,1) with 1 row
    assert(out.getAs[Long]("rows_below_k") === 2L)
    assert(out.getAs[Long]("suppressed_ppm") === 285714L) // floor(2e6/7)
  }

  test("suppressToK releases only rows of groups >= k, null QI grouped") {
    val df = Seq(
      ("a", 1, 10L), ("a", 1, 11L),                  // size 2: released
      ("a", 2, 12L),                                 // size 1: suppressed
      (null.asInstanceOf[String], 3, 13L),           // null QI size 2:
      (null.asInstanceOf[String], 3, 14L)            //   released
    ).toDF("seg", "region", "salary")
    val out = Privacy.suppressToK(df, Seq("seg", "region"), k = 2)
      .collect().map(_.getLong(2)).toSet
    // a plain equi-join would have dropped the null-QI group despite
    // its size — the null-safe key keeps it
    assert(out === Set(10L, 11L, 13L, 14L))
    // released rows keep the full schema untouched
    assert(Privacy.suppressToK(df, Seq("seg", "region"), 2).columns.toSeq
      === df.columns.toSeq)
  }

  test("anonymityAuditCapped: flags identical to the exact audit, " +
      "n_sensitive saturates at l, state-bounded under any layout") {
    val rng = new scala.util.Random(41)
    val df = (0 until 400).map { _ =>
      (s"g${rng.nextInt(12)}", rng.nextInt(3), rng.nextInt(9).toLong)
    }.toDF("seg", "region", "salary")
    for (l <- Seq(1, 3, 8)) {
      val exact = Privacy.anonymityAudit(df, Seq("seg", "region"),
          col("salary"), k = 10, l = l)
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
        .toMap
      val capped = Privacy.anonymityAuditCapped(df.repartition(17),
          Seq("seg", "region"), col("salary"), k = 10, l = l)
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
        .toMap
      assert(capped.keySet === exact.keySet)
      exact.foreach { case (g, (n, d, ka, ld)) =>
        val (cn, cd, cka, cld) = capped(g)
        assert(cn === n, s"$g n")
        assert(cd === math.min(d, l.toLong), s"$g saturation at l=$l")
        assert(cka === ka && cld === ld, s"$g flags at l=$l")
      }
    }
  }

  test("capped distinct ignores nulls like countDistinct") {
    val df = Seq(("g", Some(1L)), ("g", None), ("g", Some(2L)), ("g", None))
      .toDF("qi", "sens")
    val r = Privacy.anonymityAuditCapped(df, Seq("qi"), col("sens"), 1, 5)
      .collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_sensitive") === 2L)
  }

  test("null-twin parity (NullGroupParity helper): suppressToK releases " +
      "a null-QI group exactly like its named twin") {
    // the round-19 convention rollout (VERDICT r18 #3): the ad-hoc
    // null-QI case above stays, and the durable twin pins the whole
    // contract — group "a" cloned with seg nulled (idCol = None: the
    // release keeps all rows of a qualifying group, so the full id
    // set must match row-for-row). A plain equi-join in suppressToK
    // would release the named twin and silently suppress the null one.
    val base = Seq(
      ("a", 10L), ("a", 11L), ("a", 12L), // size 3 >= k: released
      ("b", 20L)                          // size 1 < k: suppressed
    ).toDF("seg", "salary")
    NullGroupParity.assertParity(
      base, "seg", "a",
      df => Privacy.suppressToK(df, Seq("seg"), k = 2),
      sig = half => half.select("salary").collect()
        .map(_.getLong(0).toString).toSeq)
  }

  test("k=1 never suppresses; audit is repartition-invariant") {
    val s = Privacy.suppressionSummary(rows, Seq("seg"), k = 1)
      .collect().head
    assert(s.getAs[Long]("rows_below_k") === 0L)
    assert(s.getAs[Long]("suppressed_ppm") === 0L)
    val a = Privacy.anonymityAudit(rows, Seq("seg", "region"),
      col("salary"), 2, 2).collect().toSet
    val b = Privacy.anonymityAudit(rows.repartition(7), Seq("seg", "region"),
      col("salary"), 2, 2).collect().toSet
    assert(a === b)
  }
}
