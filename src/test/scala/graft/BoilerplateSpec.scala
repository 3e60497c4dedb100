package graft

import graft.operators.Boilerplate
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  // site A: shared header+footer, distinct bodies; site B: small, only
  // 1 of 2 docs shares the header → under minDocs/minFrac, kept
  private val docs = Seq(
    (1L, "a", "HEAD\nbody one\nFOOT"),
    (2L, "a", "HEAD\nbody two\nFOOT"),
    (3L, "a", "HEAD\nbody three\nFOOT"),
    (4L, "a", "HEAD\nbody four\nFOOT"),
    (5L, "b", "HEAD\nother body\nEND"),
    (6L, "b", "solo line")
  ).toDF("doc_id", "source", "text")

  test("template lines drop, bodies stay, order preserved") {
    val out = Boilerplate
      .removeBoilerplate(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // site a: HEAD and FOOT in 4/4 docs → boilerplate
    assert(out(1L) === (("body one", 3L, 1L)))
    assert(out(2L) === (("body two", 3L, 1L)))
    // site b: HEAD appears in 1/2 docs (< minDocs=2) → kept
    assert(out(5L) === (("HEAD\nother body\nEND", 3L, 3L)))
    assert(out(6L) === (("solo line", 1L, 1L)))
  }

  test("a fully-boilerplate document survives as an empty row") {
    val d = Seq(
      (1L, "a", "SAME\nSAME2"),
      (2L, "a", "SAME\nSAME2"),
      (3L, "a", "SAME\nunique")).toDF("doc_id", "source", "text")
    val out = Boilerplate.removeBoilerplate(d, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(4)))).toMap
    // SAME in 3/3, SAME2 in 2/3 ≥ 50% → doc 1 and 2 fully emptied
    assert(out(1L) === (("", 0L)))
    assert(out(2L) === (("", 0L)))
    assert(out(3L) === (("unique", 1L)))
    assert(out.size === 3) // no document row is lost
  }

  test("duplicate kept lines within one doc keep all occurrences") {
    val d = Seq(
      (1L, "a", "x\ny\nx"),
      (2L, "a", "z")).toDF("doc_id", "source", "text")
    val out = Boilerplate.removeBoilerplate(d, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) === "x\ny\nx")
  }

  test("thresholds: minFrac gates relative, minDocs gates absolute") {
    val d = Seq(
      (1L, "a", "L\nu1"), (2L, "a", "L\nu2"), (3L, "a", "u3"),
      (4L, "a", "u4"), (5L, "a", "u5")).toDF("doc_id", "source", "text")
    // L in 2/5 docs = 40% < 50% → kept under default
    val kept = Boilerplate.removeBoilerplate(d, "doc_id", "text", "source")
      .filter(col("doc_id") === 1).head().getString(2)
    assert(kept === "L\nu1")
    // lower minFrac to 0.4 → dropped
    val dropped = Boilerplate.removeBoilerplate(d, "doc_id", "text",
      "source", minFrac = 0.4)
      .filter(col("doc_id") === 1).head().getString(2)
    assert(dropped === "u1")
  }

  test("lineFrequencies is the audit view behind the threshold") {
    val lf = Boilerplate.lineFrequencies(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(lf(("a", "HEAD")) === ((4L, 4L)))
    assert(lf(("b", "HEAD")) === ((1L, 2L)))
    assert(lf(("a", "body one")) === ((1L, 4L)))
  }

  test("the anti join is a BROADCAST hash join, never sort-merge " +
      "(VERDICT r17 #2 pin — the q139 `<=>` demotion)") {
    // the q139 shape on real documents: the template side is tiny by
    // definition, and the join keys on a constructed NON-NULL group
    // surrogate so the planner keeps the broadcast — a raw `<=>`
    // condition here demoted the anti join to SortMergeJoin and
    // shuffled the whole corpus-lines explode (+2 exchanges, +40 %
    // shuffled rows on q139, PlanAudit round 17)
    val d2 = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("source"),
        concat(lit("NAV "), col("source"), lit("\n"), col("text"),
          lit("\nCOPYRIGHT "), col("source")).as("text2"))
    val out = Boilerplate.removeBoilerplate(d2, "doc_id", "text2", "source")
    out.collect()
    val finalPlan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val anti = finalPlan.linesIterator
      .filter(_.contains("LeftAnti")).mkString("\n")
    assert(anti.nonEmpty, s"no anti join in plan:\n$finalPlan")
    assert(anti.contains("BroadcastHashJoin"),
      s"anti join not broadcast:\n$anti\n--- full plan:\n$finalPlan")
    assert(!anti.contains("SortMergeJoin"),
      s"anti join demoted to SortMergeJoin:\n$anti")
  }

  test("null-twin parity (NullGroupParity helper): a null group is " +
      "scrubbed exactly like its named twin") {
    // the durable convention behind the round-17 manual sweep: clone
    // group "a" as a null group (doc ids shifted — the rebuild keys on
    // the id alone) and demand identical per-doc output payloads.
    // Pre-fix, the null twin's docs came back UNSCRUBBED.
    val base = Seq(
      (1L, "a", "HEAD\nbody one\nFOOT"),
      (2L, "a", "HEAD\nbody two\nFOOT"),
      (3L, "a", "HEAD\nbody three\nFOOT")
    ).toDF("doc_id", "source", "text")
    NullGroupParity.assertParity(
      base, "source", "a",
      df => Boilerplate.removeBoilerplate(df, "doc_id", "text", "source"),
      sig = half => half.select("text_clean", "n_lines", "n_kept")
        .collect().map(_.toString).toSeq,
      idCol = Some("doc_id"))
  }

  test("a NULL group is scrubbed among itself; null-id rows are " +
      "excluded, not emitted empty (round-17 null-join sweep)") {
    val d = Seq(
      (Some(10L), None, "NHEAD\nnull body one\nNFOOT"),
      (Some(11L), None, "NHEAD\nnull body two\nNFOOT"),
      (Some(12L), Some("a"), "NHEAD\nnamed body\nNFOOT"),
      (None, Some("a"), "ghost\nlines")
    ).toDF("doc_id", "source", "text")
    val out = Boilerplate.removeBoilerplate(
        d, "doc_id", "text", "source", minDocs = 2, minFrac = 0.5)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)))
        -> r.getString(2)).toMap
    // the two null-group docs share NHEAD/NFOOT -> stripped WITHIN the
    // null group (the plain anti-join passed them through unscrubbed)
    assert(out(Some(10L)) === "null body one")
    assert(out(Some(11L)) === "null body two")
    // group "a" has one doc: its NHEAD/NFOOT are under minDocs there
    // (the null group's counts must not bleed into named groups)
    assert(out(Some(12L)) === "NHEAD\nnamed body\nNFOOT")
    // null-id row is excluded entirely, not returned as empty text
    assert(!out.contains(None))
    assert(out.size === 3)
    // the audit view carries the null group's rows
    val lfNull = Boilerplate
      .lineFrequencies(d, "doc_id", "text", "source")
      .filter(col("source").isNull && col("line") === "NHEAD")
      .collect()
    assert(lfNull.length === 1)
    assert(lfNull.head.getLong(2) === 2L) // n_docs_with_line
    assert(lfNull.head.getLong(3) === 2L) // n_docs_in_group
  }
}
