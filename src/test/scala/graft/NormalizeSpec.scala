package graft

import org.apache.spark.sql.functions._
import graft.operators.Normalize

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("randomized reference-model parity: integer rank arithmetic " +
      "exact across m, k, ties, nulls and source shapes") {
    // A plain-Scala replay of the contract (round 19, after the grid
    // join rework): rank the reference by (score, id); grid(i) = ref
    // score at rank 1 + ((m-1)*i) div k; each doc with within-source
    // rank r of n (ordered (score, id), nulls FIRST — Spark's
    // ascending default) maps to grid(((r-1)*k) div (n-1)), 0 when
    // n = 1. Seeded random shapes sweep m below/at/above k, tie-heavy
    // scores and null scores; any divergence in the integer
    // arithmetic (or a grid row lost to the broadcast-join rework)
    // fails with the exact (id -> value) diff.
    val rng = new scala.util.Random(4219)
    for (trial <- 1 to 8) {
      val m = Seq(1, 2, 3, 17, 100)(rng.nextInt(5))
      val k = Seq(1, 2, 7, 10, 25)(rng.nextInt(5))
      val nSrc = 1 + rng.nextInt(4)
      val nDoc = 1 + rng.nextInt(200)
      val ref = (1 to m).map(i => (i.toLong, rng.nextInt(20).toLong))
      val docs = (1 to nDoc).map { i =>
        val score: Option[Long] =
          if (rng.nextInt(10) == 0) None else Some(rng.nextInt(15).toLong)
        (i.toLong, score, s"s${rng.nextInt(nSrc)}")
      }
      // reference model
      val ranked = ref.sortBy(r => (r._2, r._1)).map(_._2)
      val grid = (0 to k).map(i =>
        ranked(((BigInt(m - 1) * i) / k).toInt)).toIndexedSeq
      val expect = docs.groupBy(_._3).flatMap { case (_, ds) =>
        val n = ds.size
        val ordered = ds.sortBy(d => (d._2.isDefined, d._2.getOrElse(0L),
          d._1))
        ordered.zipWithIndex.map { case (d, idx) =>
          val i = if (n == 1) 0 else idx * k / (n - 1)
          d._1 -> grid(i)
        }
      }
      val got = Normalize.quantileNormalize(
          docs.toDF("id", "score", "src"), ref.toDF("id", "score"),
          "id", "score", "src", k = k)
        .select(col("id"), col("normalized")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect,
        s"trial $trial (m=$m k=$k sources=$nSrc docs=$nDoc): " +
          s"diff=${(got.toSet diff expect.toSet).take(5)} / " +
          s"${(expect.toSet diff got.toSet).take(5)}")
    }
  }

  test("grid endpoints: per-source min maps to ref min, max to ref max") {
    val ref = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0), (4L, 400.0),
      (5L, 500.0)).toDF("id", "score")
    val cur = Seq((10L, 7.0, "a"), (11L, 9.0, "a"), (12L, 11.0, "a"),
      (20L, 1000.0, "b"), (21L, 2000.0, "b")).toDF("id", "score", "src")
    val out = Normalize.quantileNormalize(cur, ref, "id", "score", "src")
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        r.getDouble(r.fieldIndex("normalized"))).toMap
    // source a: ranks 1..3 of 3 -> grid 0, 5, 10 -> ref ranks 1, 3, 5
    assert(out(10L) == 100.0 && out(11L) == 300.0 && out(12L) == 500.0)
    // source b: 2 docs -> grid 0 and 10, regardless of raw magnitude
    assert(out(20L) == 100.0 && out(21L) == 500.0)
  }

  test("normalization is monotone within a source and rank-only") {
    val ref = (1L to 7L).map(i => (i, i * 10.0)).toDF("id", "score")
    // two sources with wildly different scales but identical rank shape
    val a = (1L to 20L).map(i => (i, i * 1.0, "a"))
    val b = (21L to 40L).map(i => (i, 1e6 + (i - 20) * 777.0, "b"))
    val out = Normalize.quantileNormalize((a ++ b).toDF("id", "score", "src"),
        ref, "id", "score", "src")
      .select(col("src"), col("id"), col("normalized"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byA = out.filter(_._1 == "a").sortBy(_._2).map(_._3)
    val byB = out.filter(_._1 == "b").sortBy(_._2).map(_._3)
    // same rank shape => identical normalized sequences (scale vanishes)
    assert(byA.toSeq == byB.toSeq)
    assert(byA.zip(byA.tail).forall { case (x, y) => x <= y })
    assert(byA.head == 10.0 && byA.last == 70.0)
  }

  test("singleton source and singleton reference stay defined") {
    val ref = Seq((1L, 42.0)).toDF("id", "score")
    val cur = Seq((10L, 5.0, "a"), (11L, 6.0, "a"), (12L, 9.0, "b"))
      .toDF("id", "score", "src")
    val rows = Normalize.quantileNormalize(cur, ref, "id", "score", "src")
      .collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getDouble(r.fieldIndex("normalized")) == 42.0))
  }

  test("salted two-phase rank == plain per-source window: hot source, " +
      "heavy ties, null scores, a null source, a singleton source") {
    val ref = (1L to 9L).map(i => (i, i * 10.0)).toDF("id", "score")
    val rng = new scala.util.Random(23)
    val rows = (1L to 3000L).map { i =>
      val src: Option[String] =
        if (i == 3000L) Some("solo")
        else if (i <= 2000) Some("hot")
        else if (i <= 2600) Some("mid")
        else None
      val sc: Option[Double] =
        if (i % 97 == 0) None               // null scores rank first
        else if (i % 2 == 0) Some(7.0)      // ~50 % mega-tie
        else Some(rng.nextDouble() * 100)
      (i, sc, src)
    }
    val cur = rows.toDF("id", "score", "src")
    // maxSerialRankRows = 1 FORCES the salted arm at spec scale (the
    // default would take the plain window here — same cutover-
    // injection idiom as balanceKeepWindow's spec)
    val out = Normalize.quantileNormalize(cur, ref, "id", "score", "src",
        k = 10, maxRefRows = 10000000L, maxSerialRankRows = 1L)
      .select(col("id"), col("normalized")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === 3000) // nothing dropped: null score/src included
    // the default (plain-window) arm answers identically
    val plain = Normalize.quantileNormalize(cur, ref, "id", "score", "src")
      .select(col("id"), col("normalized")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain === out)
    // expected: the PLAIN single-window form, grid replayed in Scala
    // (m = 9 ref rows, k = 10: grid(i) = ref value at rank
    // 1 + (8·i) DIV 10)
    val refSorted = (1 to 9).map(_ * 10.0)
    def gridVal(i: Long): Double = refSorted((1 + (8 * i) / 10).toInt - 1)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val expected = cur
      .withColumn("__r", row_number().over(
        w.orderBy(col("score"), col("id"))))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__i", when(col("__n") === 1, lit(0L))
        .otherwise(expr("((__r - 1) * CAST(10 AS BIGINT)) DIV (__n - 1)")))
      .select(col("id"), col("__i")).collect()
      .map(r => r.getLong(0) -> gridVal(r.getLong(1))).toMap
    assert(out === expected)
  }

  test("layout independence on real documents") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val ref = docs.filter(col("source") === "src0")
    val cur = docs.filter(col("source") =!= "src0")
    def run(c: org.apache.spark.sql.DataFrame) =
      Normalize.quantileNormalize(c, ref, "doc_id", "n_chars", "source")
        .select("doc_id", "normalized").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(cur) == run(cur.repartition(13)))
  }

  test("non-numeric score rides the plain window arm at ANY volume " +
      "(schema-first eligibility — ADVICE r18)") {
    // string scores are orderable (the plain window and the reference
    // rank handle them), but approxQuantile — the salted arm's edge
    // source — is numeric-only. maxSerialRankRows = 1 would force the
    // salted arm for a numeric score; with a string score the call
    // must FALL BACK to the plain window from the schema alone, not
    // crash when the cutover fires.
    val ref = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "dd"),
      (5L, "ee")).toDF("id", "score")
    val cur = Seq((10L, "k", "a"), (11L, "m", "a"), (12L, "z", "a"),
      (20L, "b", "b"), (21L, "q", "b"), (30L, null, "a"))
      .toDF("id", "score", "src")
    val forced = Normalize.quantileNormalize(cur, ref, "id", "score",
        "src", k = 10, maxRefRows = 10000000L, maxSerialRankRows = 1L)
      .select(col("id"), col("normalized")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical to the default call (which also takes the plain arm)
    val dflt = Normalize.quantileNormalize(cur, ref, "id", "score", "src")
      .select(col("id"), col("normalized")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(forced === dflt)
    // window replay: src a ranks (null, "k", "m", "z") = 1..4 of 4 ->
    // grid indices 0, 3, 6, 10 over m=5 refs: rank 1+(4*i) DIV 10
    // -> i=0: rank 1 "aa"; i=3: rank 2 "bb"; i=6: rank 3 "cc";
    // i=10: rank 5 "ee". src b: 2 docs -> grid 0 and 10.
    assert(forced(30L) === "aa" && forced(10L) === "bb" &&
      forced(11L) === "cc" && forced(12L) === "ee")
    assert(forced(20L) === "aa" && forced(21L) === "ee")
  }

  test("salted arm: the offsets join-back and the grid join stay " +
      "broadcast — no sort-merge join anywhere (VERDICT r17 #2 pin)") {
    // the offsets frame is |sources| x 64-bounded and joins back on a
    // constructed NON-NULL surrogate key precisely so the planner may
    // broadcast it (a raw `<=>` condition demoted q139's anti join to
    // SortMergeJoin and shuffled the whole corpus side — this pin
    // keeps the same demotion from silently recurring here)
    val ref = (1L to 9L).map(i => (i, i * 10.0)).toDF("id", "score")
    val cur = (1L to 300L).map(i =>
      (i, (i % 37).toDouble, s"s${i % 3}")).toDF("id", "score", "src")
    val out = Normalize.quantileNormalize(cur, ref, "id", "score", "src",
      k = 10, maxRefRows = 10000000L, maxSerialRankRows = 1L)
    out.collect()
    val finalPlan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"expected broadcast joins in salted-arm plan:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin"),
      s"salted-arm join demoted to SortMergeJoin:\n$finalPlan")
  }

  test("null-twin parity (NullGroupParity helper): a null source " +
      "normalizes exactly like its named twin, in BOTH arms") {
    // insurance retrofit of the round-18 convention: with idCol = None
    // the twin keeps identical (id, score) pairs, so within-group ranks
    // agree and the normalized values must match row-for-row
    val ref = (1L to 9L).map(i => (i, i * 10.0)).toDF("id", "score")
    val base = (1L to 30L).map(i =>
      (i, (i % 7).toDouble, if (i <= 20) "a" else "b"))
      .toDF("id", "score", "src")
    def run(maxSerial: Long)(df: org.apache.spark.sql.DataFrame) =
      Normalize.quantileNormalize(df, ref, "id", "score", "src",
        k = 10, maxRefRows = 10000000L, maxSerialRankRows = maxSerial)
    def sig(half: org.apache.spark.sql.DataFrame): Seq[String] =
      half.select("id", "normalized").collect().map(_.toString).toSeq
    NullGroupParity.assertParity(base, "src", "a", run(4194304L), sig)
    NullGroupParity.assertParity(base, "src", "a", run(1L), sig)
  }

  test("reserved helper column names are rejected up front, for both " +
      "arms alike (ADVICE r18, the balanceClasses precedent)") {
    val ref = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "score")
    // case-variants included: the analyzer resolves case-insensitively
    // by default, so "__R"/"Normalized" would be silently replaced by
    // the helper withColumns if the guard matched exact strings only
    for (bad <- Seq("normalized", "__sk", "__r", "__R", "Normalized")) {
      val cur = Seq((10L, 1.0, "a", "x")).toDF("id", "score", "src", bad)
      val e = intercept[IllegalArgumentException] {
        Normalize.quantileNormalize(cur, ref, "id", "score", "src")
      }
      assert(e.getMessage.contains(bad))
    }
  }
}
