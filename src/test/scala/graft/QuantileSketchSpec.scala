package graft

import graft.functions.KllBuffer
import graft.operators.PartialAgg
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("under capacity: states -> merge -> quantiles is EXACT and equals " +
      "a direct full-data sketch") {
    val rows = (1 to 3000).map(i => ((i % 7).toString, i.toDouble))
    val df = rows.toDF("g", "v").withColumn("shard", col("v") % 13)
    // fine grain: (g, shard) states; coarse: merge up to g
    val st = PartialAgg.quantileStates(df, Seq("g", "shard"), col("v"),
      k = 4096)
    val merged = PartialAgg.mergeQuantiles(st, Seq("g"))
      .select(col("g"), PartialAgg.quantileEstimate(col("qsketch"),
        Seq(0.1, 0.5, 0.9)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val direct = PartialAgg.quantileStates(df, Seq("g"), col("v"), k = 4096)
      .select(col("g"), PartialAgg.quantileEstimate(col("qsketch"),
        Seq(0.1, 0.5, 0.9)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // exact percentile_disc reference
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val expect = Seq(0.1, 0.5, 0.9).map { q =>
        sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)
      }
      assert(merged(g) == expect, s"merged group $g")
      assert(direct(g) == expect, s"direct group $g")
    }
  }

  test("beyond capacity: compaction engages, rank error stays small") {
    val n = 100000
    val buf = new KllBuffer(256, 0L)
    // adversarially ordered: descending, so level-0 is never pre-sorted
    (n to 1 by -1).foreach(i => buf.insert(i.toDouble))
    val probs = Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = buf.quantiles(probs)
    probs.zip(got).foreach { case (q, v) =>
      val trueRank = q * n
      val gotRank = v // values ARE their rank in this fixture
      val err = math.abs(gotRank - trueRank) / n
      assert(err <= 0.01, s"q=$q err=$err (got $v)")
    }
    // sketch is actually bounded: far fewer stored items than n
    val stored = buf.levels.map(_.size).sum
    assert(stored < 6000, s"stored $stored")
  }

  test("merge of compacted sketches keeps the bound") {
    val shards = (0 until 10).map { s =>
      val b = new KllBuffer(256, 0L)
      (0 until 10000).foreach(i => b.insert((i * 10 + s).toDouble))
      b
    }
    val all = new KllBuffer(256, 0L)
    shards.foreach(all.mergeIn)
    assert(all.n == 100000L)
    val probs = Array(0.1, 0.5, 0.9)
    val got = all.quantiles(probs)
    probs.zip(got).foreach { case (q, v) =>
      val err = math.abs(v / 99999.0 - q) // values uniform on [0, 99999]
      assert(err <= 0.02, s"q=$q err=$err (got $v)")
    }
  }

  test("serialize/deserialize round-trips exactly") {
    val b = new KllBuffer(64, 0L)
    (1 to 1000).foreach(i => b.insert(math.sin(i) * 100))
    val back = KllBuffer.deserialize(b.serialize())
    assert(back.n == b.n)
    assert(back.levels.map(_.toSeq) == b.levels.map(_.toSeq))
    assert(back.parity.toSeq == b.parity.toSeq)
    assert(back.quantiles(Array(0.3, 0.7)).toSeq ==
      b.quantiles(Array(0.3, 0.7)).toSeq)
  }

  test("streaming sketch quantiles equal the batch sketch " +
      "(state-store round trip)") {
    // Micro-batch incremental update: buffer serialize/deserialize
    // between batches plus partial merges. Under capacity nothing
    // compacts, so the streamed summary is the same multiset as the
    // one-shot batch — quantiles must match EXACTLY (the byte layouts
    // may differ: level-0 order is arrival order).
    val rows = (1 to 900).map(i => ((i * 7919) % 900).toDouble)
    val probs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    def sketchCol = org.apache.spark.sql.graftshim.Shims.column(
      graft.functions.QuantileSketchAgg(
        org.apache.spark.sql.graftshim.Shims.expression(col("v")),
        k = 4096).toAggregateExpression())
    val batch = rows.toDF("v").agg(sketchCol.as("sk"))
      .select(PartialAgg.quantileEstimate(col("sk"), probs).as("qs"))
      .head().getSeq[Double](0)
    implicit val sqlCtx = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Double]
    val q = mem.toDF().toDF("v").agg(sketchCol.as("sk"))
      .writeStream.format("memory").queryName("qsketch_stream")
      .outputMode("complete").start()
    rows.grouped(300).foreach { chunk =>
      mem.addData(chunk)
      q.processAllAvailable()
    }
    val streamed = spark.table("qsketch_stream")
      .select(PartialAgg.quantileEstimate(col("sk"), probs).as("qs"))
      .head().getSeq[Double](0)
    q.stop()
    assert(streamed == batch)
  }

  test("sketch aggregates are SQL-callable after registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    (1 to 100).map(i => (i % 4, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("qsk_input")
    val r = spark.sql(
      """SELECT g, sketch_quantiles(sk, array(0.5D))[0] AS med FROM (
        |  SELECT g, quantile_sketch_union(s) AS sk FROM (
        |    SELECT g, v % 10 AS shard, quantile_sketch_agg(v, 64) AS s
        |    FROM qsk_input GROUP BY g, v % 10
        |  ) GROUP BY g
        |)""".stripMargin)
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    // group g holds {g, g+4, ..., <=100}: 25 values, disc median = 13th
    (0 to 3).foreach { g =>
      val vals = (1 to 100).filter(_ % 4 == g).map(_.toDouble).sorted
      assert(r(g) == vals(math.ceil(0.5 * vals.size).toInt - 1), s"g=$g")
    }
  }

  test("empty and null handling: empty group yields null quantiles") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("a", Some(2.0)))
      .toDF("g", "v")
    val out = PartialAgg.quantileStates(df, Seq("g"), col("v"))
      .select(col("g"),
        PartialAgg.quantileEstimate(col("qsketch"), Seq(0.5)).as("qs"))
      .collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1))))
      .toMap
    assert(out("a").contains(Seq(1.0)))
    assert(out("b").isEmpty) // only-null group -> empty sketch -> null
  }
}
