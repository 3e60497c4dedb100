package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def log = Seq(
    // user 1: A -> A (no change) -> B -> A
    (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "A"),
    // user 2: single observation
    (2L, 15L, "C"),
    // user 3: null is a VALUE (null -> A -> null are two changes)
    (3L, 10L, null), (3L, 20L, "A"), (3L, 30L, null))
    .toDF("uid", "ts", "attr")

  test("change compression + interval close") {
    val scd = Scd2.fromChangeLog(log, Seq("uid"), Seq("attr"), "ts")
      .orderBy($"uid", $"valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(4)))
    assert(scd.toSeq == Seq(
      (1L, "A", 10L, 30L, false), // the 20L duplicate collapsed
      (1L, "B", 30L, 40L, false),
      (1L, "A", 40L, -1L, true),  // re-appearing value opens a NEW interval
      (2L, "C", 15L, -1L, true),
      (3L, null, 10L, 20L, false),
      (3L, "A", 20L, 30L, false),
      (3L, null, 30L, -1L, true)))
  }

  test("exactly one current row per key; intervals tile without gaps") {
    val scd = Scd2.fromChangeLog(log, Seq("uid"), Seq("attr"), "ts")
    assert(scd.filter($"is_current").groupBy($"uid").count()
      .filter($"count" =!= 1).count() == 0)
    // each non-current row's valid_to equals the next row's valid_from
    val gaps = scd
      .withColumn("__next", lead($"valid_from", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"uid").orderBy($"valid_from")))
      .filter($"valid_to".isNotNull && $"valid_to" =!= $"__next")
    assert(gaps.count() == 0)
  }

  test("single shuffle: both windows share the key partitioning") {
    val scd = Scd2.fromChangeLog(log, Seq("uid"), Seq("attr"), "ts")
    val exchanges = scd.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges")
  }

  test("asOf point-in-time lookup honors [from, to) and the open row") {
    val scd = Scd2.fromChangeLog(log, Seq("uid"), Seq("attr"), "ts")
    val probes = Seq((1L, 10L), (1L, 29L), (1L, 30L), (1L, 99L), (2L, 14L))
      .toDF("uid", "at")
    val got = Scd2.asOf(scd, probes, Seq("uid"), "at")
      .select($"uid", $"at", $"attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    // (2, 14) precedes user 2's history -> no row
    assert(got == Set(
      (1L, 10L, "A"), (1L, 29L, "A"), (1L, 30L, "B"), (1L, 99L, "A")))
  }
}
