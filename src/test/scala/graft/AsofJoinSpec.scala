package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  // left: (id, key, ts); right: (key, ts, payload)
  private lazy val left = Seq(
    (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 50L),
    (4L, "b", 500L), (5L, "c", 10L)
  ).toDF("id", "k", "ts")
  private lazy val right = Seq(
    ("a", 90L, "a@90"), ("a", 150L, "a@150"), ("a", 100L, "a@100"),
    ("b", 500L, "b@500")
  ).toDF("k", "rts", "p")

  private def run(tol: Option[Long] = None) =
    AsofJoin.asofBackward(left, right, Seq("k"), "ts", "rts",
      Seq("p"), tol)
      .select(col("id"), col("asof_p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

  test("backward as-of picks greatest right ts <= left ts") {
    val m = run()
    assert(m(1L).contains("a@100")) // tie at 100: right-at-ts matches
    assert(m(2L).contains("a@150"))
    assert(m(3L).isEmpty) // nothing at or before 50
    assert(m(4L).contains("b@500"))
    assert(m(5L).isEmpty) // key with no right rows
  }

  test("tolerance bounds the lookback") {
    val m = run(tol = Some(10L))
    assert(m(1L).contains("a@100")) // distance 0 <= 10
    assert(m(2L).isEmpty) // 200-150=50 > 10
  }

  test("forward as-of picks smallest right ts >= left ts") {
    val m = AsofJoin.asofForward(left, right, Seq("k"), "ts", "rts",
      Seq("p"))
      .select(col("id"), col("asof_p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(m(1L).contains("a@100")) // tie at 100: right-at-ts matches
    assert(m(2L).isEmpty) // nothing at or after 200
    assert(m(3L).contains("a@90")) // next right after 50
    assert(m(4L).contains("b@500"))
    assert(m(5L).isEmpty)
  }

  test("forward tolerance bounds the lookahead") {
    val m = AsofJoin.asofForward(left, right, Seq("k"), "ts", "rts",
      Seq("p"), tolerance = Some(30L))
      .select(col("id"), col("asof_p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(m(1L).contains("a@100")) // gap 0 <= 30
    assert(m(3L).isEmpty) // 90-50=40 > 30
  }

  test("left row count is preserved (no range explosion)") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "rts",
      Seq("p"))
    assert(out.count() == left.count())
    assert(out.columns.contains("asof_p"))
  }
}
