package graft

import graft.operators.Pivot

class PivotSpec extends SparkTestBase {
  import spark.implicits._

  test("dynamic pivot discovers values and zero-fills") {
    val df = Seq(
      (1L, "click"), (1L, "click"), (1L, "view"),
      (2L, "purchase")
    ).toDF("uid", "kind")
    val out = Pivot.dynamicCountPivot(df, "uid", "kind")
    assert(out.columns.toSeq == Seq("uid", "click", "purchase", "view"))
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) == ((2L, 0L, 1L)))
    assert(rows(2L) == ((0L, 1L, 0L)))
  }

  test("dynamic pivot refuses schema explosion") {
    val wide = spark.range(500)
      .selectExpr("id % 5 AS g", "CAST(id AS STRING) AS v")
    intercept[IllegalArgumentException] {
      Pivot.dynamicCountPivot(wide, "g", "v", maxValues = 100)
    }
  }

  test("matches the static events pivot on testdata") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("user_id % 10 AS umod", "event_type")
    val dyn = Pivot.dynamicCountPivot(ev, "umod", "event_type")
    assert(dyn.columns.sorted.toSeq ==
      Seq("click", "error", "purchase", "signup", "umod", "view"))
    val total = (1 until dyn.columns.length)
      .map(i => dyn.collect().map(_.getLong(i)).sum).sum
    assert(total == ev.count())
  }
}
