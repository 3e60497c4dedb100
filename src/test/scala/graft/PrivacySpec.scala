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
