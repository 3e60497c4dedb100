package graft

import org.apache.spark.sql.functions._
import graft.operators.{Impute, Sampling}
import graft.functions.{VectorFunctions => VF}

class ImputeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val series = Seq(
    // (key, order, value) — nulls to fill
    ("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, None),
    ("a", 4L, Some(40.0)), ("a", 5L, None),
    ("b", 1L, None), ("b", 2L, Some(2.0))
  ).toDF("k", "o", "v")

  test("forwardFill carries last non-null forward; leading stays null") {
    val m = Impute.forwardFill(series, Seq("k"), Seq("o"), Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(m(("a", 2L)).contains(10.0) && m(("a", 3L)).contains(10.0))
    assert(m(("a", 4L)).contains(40.0) && m(("a", 5L)).contains(40.0))
    assert(m(("b", 1L)).isEmpty) // before first observation
    assert(m(("b", 2L)).contains(2.0))
  }

  test("backwardFill mirrors forwardFill; trailing stays null") {
    val m = Impute.backwardFill(series, Seq("k"), Seq("o"), Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(m(("a", 2L)).contains(40.0) && m(("a", 3L)).contains(40.0))
    assert(m(("a", 5L)).isEmpty) // after last observation
    assert(m(("b", 1L)).contains(2.0))
  }

  test("fill is layout-independent (repartition invariance)") {
    val base = Impute.forwardFill(series, Seq("k"), Seq("o"), Seq("v"))
      .orderBy("k", "o").collect().toSeq
    val shuffled = Impute.forwardFill(
      series.repartition(7, col("o")), Seq("k"), Seq("o"), Seq("v"))
      .orderBy("k", "o").collect().toSeq
    assert(base == shuffled)
  }

  test("deterministicShuffle order is layout- and run-independent") {
    val df = spark.range(100).toDF("id")
    val a = Sampling.deterministicShuffle(df, "id", "s1")
      .select("id").collect().map(_.getLong(0)).toSeq
    val b = Sampling.deterministicShuffle(
      df.repartition(13), "id", "s1")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b) // same seed -> same total order, any layout
    val c = Sampling.deterministicShuffle(df, "id", "s2")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a != c) // different seed -> different epoch order
    assert(a.sorted == c.sorted) // …but the same multiset of rows
  }

  test("int8 quantization: |error| <= scale/2 and values within [-127,127]") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.003f, 127.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero: scale falls back to 1
      (3L, Array(-0.25f, 0.25f, 0.125f, -0.125f))
    ).toDF("id", "v")
    val out = vecs
      .withColumn("scale", VF.int8Scale(col("v")))
      .withColumn("q", VF.quantizeInt8(col("v"), col("scale")))
      .withColumn("err", VF.dequantMaxErr(col("v"), col("scale")))
      .select("id", "scale", "q", "err")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Long](2), r.getDouble(3)))).toMap
    out.foreach { case (_, (scale, q, err)) =>
      assert(err <= scale / 2 + 1e-12)
      assert(q.forall(x => x >= -127 && x <= 127))
    }
    assert(out(2L)._1 == 1.0) // zero-vector scale guard
    assert(out(2L)._2.forall(_ == 0L))
    // the extreme element hits exactly +-127
    assert(out(1L)._2.contains(127L))
  }
}
