package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopKPerGroup, TopKPerGroupExec}

class TopKPerGroupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val orders =
    spark.read.parquet(s"$sf001/orders.parquet").cache()

  private def windowTruth(k: Int): Set[(Long, Long)] = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("heap-based top-k matches the window formulation") {
    for (k <- Seq(1, 3, 7)) {
      val got = TopKPerGroup.perKey(orders,
        Seq("o_custkey"), "o_totalprice", "o_orderkey", k)
        .select("o_custkey", "o_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == windowTruth(k), s"k=$k")
    }
  }

  test("physical plan uses TopKPerGroupExec and no sort before it") {
    val df = TopKPerGroup.perKey(orders,
      Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))
    assert(!plan.contains("Sort"), s"unexpected sort in:\n$plan")
  }

  test("null order values are dropped; small groups pass through") {
    val df = Seq(
      ("a", Some(1.0), 1L), ("a", None, 2L), ("b", Some(5.0), 3L)
    ).toDF("k", "v", "id")
    val got = TopKPerGroup.perKey(df, Seq("k"), "v", "id", 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("null tie values are KEPT and rank first (asc nulls-first)") {
    // null ties used to be dropped; the exec now orders them first, so
    // nullable id columns ride the native long path with no sentinel
    val df = Seq(
      ("a", 3.0, Some(1L)), ("a", 2.0, None), ("a", 1.0, Some(3L))
    ).toDF("k", "v", "id")
    val got = TopKPerGroup.perKey(df, Seq("k"), "v", "id", 2)
      .select("v").collect().map(_.getDouble(0)).toSet
    assert(got == Set(3.0, 2.0))
    // among EQUAL order values, the null-tie row wins the cut
    val tied = Seq(
      ("a", 1.0, Some(5L)), ("a", 1.0, None), ("a", 1.0, Some(1L))
    ).toDF("k", "v", "id")
    val kept = TopKPerGroup.perKey(tied, Seq("k"), "v", "id", 2)
      .select("id").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(kept == Set(None, Some(1L)))
  }

  test("long orders past 2^53 rank at full precision") {
    // consecutive longs near Long.MaxValue collapse to the SAME double;
    // the integral path must still rank them exactly
    val big = Long.MaxValue
    val rows = (0 until 6).map(i => ("g", big - i, i.toLong))
    val df = rows.toDF("k", "v", "id")
    val got = TopKPerGroup.perKey(df, Seq("k"), "v", "id", 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 2L), s"got $got")
  }

  test("long-order ranking matches the window formulation (property)") {
    val rng = new scala.util.Random(5)
    val rows = (0 until 400).map { i =>
      val grp = s"g${rng.nextInt(8)}"
      // mix huge and tiny magnitudes incl. negatives
      val v = rng.nextLong()
      (grp, v, i.toLong)
    }
    val df = rows.toDF("k", "v", "id")
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).select("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = TopKPerGroup.perKey(df, Seq("k"), "v", "id", 4)
      .select("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("double-order ranking with negatives/zeros matches the window") {
    val rng = new scala.util.Random(9)
    val rows = (0 until 300).map { i =>
      val v = rng.nextInt(5) match {
        case 0 => -rng.nextDouble() * 100
        case 1 => 0.0
        case 2 => -0.0
        case _ => rng.nextDouble() * 100
      }
      (s"g${rng.nextInt(6)}", v, i.toLong)
    }
    val df = rows.toDF("k", "v", "id")
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = TopKPerGroup.perKey(df, Seq("k"), "v", "id", 3)
      .select("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("fractional tie column is rejected at plan time") {
    val df = Seq(("a", 1.0, 2.0)).toDF("k", "v", "t")
    val e = intercept[IllegalArgumentException] {
      TopKPerGroup.perKey(df, Seq("k"), "v", "t", 2)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("string-tie ranking matches the window formulation (property)") {
    // heavy order-value collisions so the string tie actually decides;
    // enough rows per partition that UTF8String row-buffer reuse would
    // corrupt un-copied ties
    val rng = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      (s"g${rng.nextInt(5)}", rng.nextInt(4).toDouble,
        f"id${rng.nextInt(100000)}%06d-$i")
    }
    val df = rows.toDF("k", "v", "t").repartition(3)
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("t"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).select("k", "t")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val got = TopKPerGroup.perKey(df, Seq("k"), "v", "t", 4)
      .select("k", "t")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want)
  }

  test("string ties break on byte order, null first") {
    val df = Seq(
      ("a", 1.0, Some("bb")), ("a", 1.0, Some("aa")),
      ("a", 1.0, None), ("a", 1.0, Some("ab"))
    ).toDF("k", "v", "t")
    val got = TopKPerGroup.perKey(df, Seq("k"), "v", "t", 2)
      .select("t").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getString(0))).toSet
    assert(got == Set(None, Some("aa")))
  }

  test("case-only column collisions are AMBIGUOUS, not first-wins") {
    val df = Seq((1L, 2.0, 3.0, 10L)).toDF("k", "score", "Score", "t")
    val e = intercept[IllegalArgumentException] {
      TopKPerGroup.perKey(df, Seq("k"), "score", "t", 1)
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("exec propagates its child's partitioning — a same-key consumer " +
      "adds no second exchange") {
    // The exec filters rows within partitions, so the hash exchange
    // that satisfied its required distribution also satisfies any
    // downstream operator clustering on the same key (rank windows,
    // per-key aggregates, a second cut). Without the
    // outputPartitioning override the default UnknownPartitioning made
    // EnsureRequirements re-shuffle the <=k survivors of EVERY cut —
    // a pure-waste exchange in rankingEval, capPerGroup-then-agg, and
    // the mrlRerank double-cut.
    val cut = TopKPerGroup.perKey(
      orders.select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice")),
      Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
    val agg = cut.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(plan.contains("TopKPerGroup"), plan.take(2000))
    assert(exchanges == 1,
      s"expected ONE hash exchange (feeding the cut), found $exchanges " +
        "— the exec stopped propagating outputPartitioning:\n" +
        plan.take(3000))
  }
}
