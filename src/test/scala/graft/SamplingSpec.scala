package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Neyman allocation: the exact-integer path is pinned against
  * hand-computed σ and floor divisions, plus the optimality property
  * (allocation ∝ N_h·σ_h) and the degenerate contracts. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("hand fixture: allocation follows N·σ exactly") {
    // stratum x: values 0,10 ×2 each → N=4, Σx=20, Σx²=200,
    //   varnum = 4·200 − 400 = 400, w = √400·10⁶ = 20·10⁶
    // stratum y: values 0,30 → N=2, Σx=30, Σx²=900,
    //   varnum = 2·900 − 900 = 900, w = 30·10⁶
    // stratum z: constant → w = 0
    val df = Seq(
      ("x", 0L), ("x", 10L), ("x", 0L), ("x", 10L),
      ("y", 0L), ("y", 30L),
      ("z", 7L), ("z", 7L), ("z", 7L)
    ).toDF("src", "v")
    val out = Sampling.neymanAllocation(df, "src", "v", budget = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // total w = 50·10⁶ → x gets 100·20/50 = 40, y gets 60, z gets 0
    assert(out("x") === ((4L, 5.0, 40L)))  // σ_x = 20e6/4e6 = 5
    assert(out("y") === ((2L, 15.0, 60L))) // σ_y = 30e6/2e6 = 15
    assert(out("z") === ((3L, 0.0, 0L)))
  }

  test("null-valued rows carry no variance: excluded from N, not just " +
      "the sums (review finding)") {
    // counting nulls in N while the sums skip them reads N·Σx² − (Σx)²
    // as fake variance: [10, null] would get σ 5.0 and budget it
    // hasn't earned
    val df = Seq(
      ("a", Some(10L)), ("a", None),          // one measured value: σ 0
      ("b", Some(0L)), ("b", Some(30L)),      // the only real variance
      ("c", None), ("c", None)                // nothing measured: no row
    ).toDF("src", "v")
    val out = Sampling.neymanAllocation(df, "src", "v", 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out("a") === ((1L, 0.0, 0L))) // measured count, zero variance
    assert(out("b") === ((2L, 15.0, 100L)))
    assert(!out.contains("c")) // all-null stratum: nothing to sample
  }

  test("all-constant corpus allocates zero instead of dividing by zero") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 9L)).toDF("src", "v")
    val out = Sampling.neymanAllocation(df, "src", "v", 50L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out === Map("a" -> 0L, "b" -> 0L))
  }

  test("allocations never exceed budget and are layout-invariant") {
    val rng = new scala.util.Random(5)
    val df = (0 until 300).map(i =>
      (s"s${i % 7}", rng.nextInt(1000).toLong)).toDF("src", "v")
    val a = Sampling.neymanAllocation(df, "src", "v", 1000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val b = Sampling.neymanAllocation(df.repartition(13), "src", "v", 1000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(a === b) // exact decimal path: partial-agg order can't move it
    assert(a.toSeq.map(_._4).sum <= 1000L) // floor division never overshoots
    assert(a.forall(_._4 >= 0L))
  }

  test("balanceKeepWindow: salted two-phase rank == plain single-window " +
      "rank, with and without the offsets broadcast hint, incl. a " +
      "mega-tie order key; the shipped arms keep the same set") {
    // hot 600 / mid 200 / cold 100 → minN = 100, one label 6× the
    // smallest — the skew shape the big-minN arm exists for, at spec
    // scale. Keys unique (the operator's keyCol contract).
    val df = (1L to 900L).map { i =>
      (i, if (i <= 600) "hot" else if (i <= 800) "mid" else "cold")
    }.toDF("id", "label")
    val hash = graft.functions.PortableHash
      .md5Prefix(col("id").cast("string"), 15)
    val minN = 100L
    def sortedIds(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val refW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(hash.asc, col("id"))
    val ref = df.withColumn("__rk", row_number().over(refW))
      .filter(col("__rk") <= minN).drop("__rk")
    for (hint <- Seq(true, false)) {
      val salted = Sampling
        .balanceKeepWindow(df, "id", "label", hash, minN, hint)
      assert(sortedIds(salted) === sortedIds(ref))
      assert(salted.columns.toSeq === df.columns.toSeq) // helpers dropped
    }
    // mega-tie order key: 4 tie classes of ~25 % each (the q187-spec
    // 75 %-tie discipline) — equal keys MUST share a salt (top 6 bits
    // are monotone in the key), or the two-phase rank would split a
    // tie class across salts and scramble the keyCol tie-break
    val coarse = shiftleft(pmod(hash, lit(4)), 57)
    val refTies = df.withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("label")).orderBy(coarse.asc, col("id"))))
      .filter(col("__rk") <= minN).drop("__rk")
    val saltedTies = Sampling.balanceKeepWindow(
      df, "id", "label", coarse, minN, hintBroadcastOffsets = true)
    assert(sortedIds(saltedTies) === sortedIds(refTies))
    // the shipped operator (heap arm at this size) keeps the identical
    // set — the arm choice is invisible in the answer
    assert(sortedIds(Sampling.balanceClasses(df, "id", "label"))
      === sortedIds(ref))
  }

  test("null-twin parity (NullGroupParity helper): balanceClasses " +
      "samples a null label exactly like its named twin, in BOTH arms") {
    // the durable convention behind the round-17 manual sweep: clone
    // label "a" as a null class (idCol = None keeps the SAME ids, so
    // the md5-of-key order agrees between the twins and the KEPT ID
    // SET must match row-for-row, not just by count). A third smaller
    // class "c" forces real downsampling (minN = 10). Pre-fix, the
    // window arm's offsets using-join null-rejected the whole
    // null-label class.
    val base = ((1L to 40L).map(i => (i, "a")) ++
      (101L to 110L).map(i => (i, "c"))).toDF("id", "label")
    def keptIds(half: org.apache.spark.sql.DataFrame): Seq[String] =
      half.select("id").collect().map(_.getLong(0).toString).toSeq
    // heap arm (default at this volume)
    NullGroupParity.assertParity(
      base, "label", "a",
      df => Sampling.balanceClasses(df, "id", "label"),
      sig = keptIds)
    // window arm, forced via the package-visible entry point (the arm
    // that carried the round-17 bug)
    val hash = graft.functions.PortableHash
      .md5Prefix(col("id").cast("string"), 15)
    NullGroupParity.assertParity(
      base, "label", "a",
      df => Sampling.balanceKeepWindow(df, "id", "label", hash, 10L,
        hintBroadcastOffsets = true),
      sig = keptIds)
  }

  test("null-twin parity (NullGroupParity helper): capPerGroup caps a " +
      "null group exactly like its named twin") {
    // round-19 convention rollout (VERDICT r18 #3). NOTE the two null
    // contracts here are different columns: a null KEY is documented
    // as dropped (uniqueness contract, counted by the observe metric —
    // the ad-hoc tests below pin that), while a null GROUP is a group
    // like any other and must be capped identically. Twin ids are
    // SHIFTED (key uniqueness), so the md5-hash survivor SETS differ
    // by design — the operator's guarantee between twins is the
    // per-group kept COUNT (the helper's documented order-by-hash
    // signature choice).
    val base = ((1L to 10L).map(i => (i, "a")) ++
      (101L to 103L).map(i => (i, "b"))).toDF("id", "grp")
    NullGroupParity.assertParity(
      base, "grp", "a",
      df => Sampling.capPerGroup(df, "id", "grp", k = 4),
      sig = half => Seq(half.count().toString),
      idCol = Some("id"))
  }

  test("balanceKeepWindow: a NULL label is a class, not a silent drop " +
      "(null-safe join parity with the heap arm); reserved helper " +
      "names fail fast in both arms") {
    // 40 null-label rows beside two named labels: null is the smallest
    // class (minN = 40), and both arms must rank and keep it — an
    // inner using-join would null-reject the whole class in exactly
    // one arm (round-17 review catch)
    val df = (1L to 200L).map { i =>
      (i, if (i <= 100) Some("a") else if (i <= 160) Some("b") else None)
    }.toDF("id", "label")
    val hash = graft.functions.PortableHash
      .md5Prefix(col("id").cast("string"), 15)
    val refW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(hash.asc, col("id"))
    val ref = df.withColumn("__r", row_number().over(refW))
      .filter(col("__r") <= 40L).drop("__r")
    def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val win = Sampling.balanceKeepWindow(df, "id", "label", hash, 40L,
      hintBroadcastOffsets = true)
    assert(ids(win) === ids(ref))
    assert(win.filter(col("label").isNull).count() === 40L)
    assert(ids(Sampling.balanceClasses(df, "id", "label")) === ids(ref))
    // reserved names are refused up front, data-independently — on a
    // frame small enough that the heap arm would otherwise run
    val clash = Seq((1L, "a", 0)).toDF("id", "label", "__bsalt")
    val e = intercept[IllegalArgumentException] {
      Sampling.balanceClasses(clash, "id", "label")
    }
    assert(e.getMessage.contains("__bsalt"))
    // case-variant collision (round-18 review catch): the analyzer
    // resolves case-insensitively, so the guard must too
    val clash2 = Seq((1L, "a", 0)).toDF("id", "label", "__BSALT")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.balanceClasses(clash2, "id", "label")
    }
    assert(e2.getMessage.contains("__BSALT"))
  }
}
