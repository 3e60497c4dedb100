package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RaterAgreement}
import graft.plans.TopKPerGroup

/** Randomized cross-checks of the custom operators against brute-force
  * reference computations (fixed seeds — reproducible). */
class OperatorPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("asofBackward matches a brute-force reference on random data") {
    val rng = new scala.util.Random(7L)
    val keys = Seq("a", "b", "c", "d")
    val left = (1 to 200).map(i =>
      (i.toLong, keys(rng.nextInt(4)), rng.nextInt(1000).toLong))
    val right = (1 to 150).map(i =>
      (keys(rng.nextInt(4)), rng.nextInt(1000).toLong, s"p$i"))
    val leftDf = left.toDF("id", "k", "ts")
    val rightDf = right.toDF("k", "rts", "p")

    val got = AsofJoin.asofBackward(leftDf, rightDf, Seq("k"), "ts", "rts",
      Seq("p"))
      .select(col("id"), col("asof_p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    // brute force: per left row, the right row with max rts <= ts
    // (ties on rts resolved by max payload struct — here max p string,
    // matching the operator's documented deterministic tie-break)
    val expected = left.map { case (id, k, ts) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (cands.isEmpty) None
             else {
               val maxTs = cands.map(_._2).max
               Some(cands.filter(_._2 == maxTs).map(_._3).max)
             })
    }.toMap
    assert(got == expected)
  }

  test("asofForward matches a brute-force reference on random data") {
    val rng = new scala.util.Random(13L)
    val keys = Seq("a", "b", "c", "d")
    val left = (1 to 200).map(i =>
      (i.toLong, keys(rng.nextInt(4)), rng.nextInt(1000).toLong))
    val right = (1 to 150).map(i =>
      (keys(rng.nextInt(4)), rng.nextInt(1000).toLong, s"p$i"))
    val tol = 100L

    val got = AsofJoin.asofForward(
      left.toDF("id", "k", "ts"), right.toDF("k", "rts", "p"),
      Seq("k"), "ts", "rts", Seq("p"), tolerance = Some(tol))
      .select(col("id"), col("asof_p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    // brute force: per left row, the right row with min rts >= ts and
    // rts - ts <= tol; ties on rts -> max payload (operator contract)
    val expected = left.map { case (id, k, ts) =>
      val cands = right.filter(r => r._1 == k && r._2 >= ts &&
        r._2 - ts <= tol)
      id -> (if (cands.isEmpty) None
             else {
               val minTs = cands.map(_._2).min
               Some(cands.filter(_._2 == minTs).map(_._3).max)
             })
    }.toMap
    assert(got == expected)
  }

  test("TopKPerGroup matches a brute-force reference on random data") {
    val rng = new scala.util.Random(11L)
    val rows = (1 to 500).map(i =>
      (i.toLong, (rng.nextInt(20)).toString, rng.nextInt(50).toDouble))
    val df = rows.toDF("id", "g", "v").repartition(7) // scramble layout
    val got = TopKPerGroup.perKey(df, Seq("g"), "v", "id", 3)
      .select("id").collect().map(_.getLong(0)).toSet
    val expected = rows.groupBy(_._2).values.flatMap { grp =>
      grp.sortBy(r => (-r._3, r._1)).take(3).map(_._1)
    }.toSet
    assert(got == expected)
  }

  test("BPE: driver and distributed learners agree on random corpora") {
    val rng = new scala.util.Random(31L)
    val alphabet = "abcd"
    for (round <- 0 until 3) {
      val docs = (0 until 40).map { i =>
        (i.toLong, (0 until 8).map(_ =>
          (0 until (1 + rng.nextInt(5))).map(_ =>
            alphabet(rng.nextInt(alphabet.length))).mkString)
          .mkString(" "))
      }.toDF("doc_id", "text")
      val a = graft.operators.Bpe.learnMerges(docs, "text", 4,
        localVocabThreshold = Long.MaxValue).collect().toSeq
      val b = graft.operators.Bpe.learnMerges(docs, "text", 4,
        localVocabThreshold = 0L).collect().toSeq
      assert(a.map(_.toSeq) == b.map(_.toSeq), s"round $round")
    }
  }

  test("boilerplate removal is idempotent (kept lines stay kept)") {
    val rng = new scala.util.Random(41L)
    val templates = Seq("HEAD", "FOOT", "NAV")
    val docs = (0 until 60).map { i =>
      val body = (0 until 3).map(_ => s"body ${rng.nextInt(1000)}")
      val lines = rng.shuffle(templates.take(1 + rng.nextInt(3)) ++ body)
      (i.toLong, s"s${i % 3}", lines.mkString("\n"))
    }.toDF("doc_id", "source", "text")
    val once = graft.operators.Boilerplate
      .removeBoilerplate(docs, "doc_id", "text", "source")
      .select(col("doc_id"), col("source"),
        col("text_clean").as("text"))
    val twice = graft.operators.Boilerplate
      .removeBoilerplate(once, "doc_id", "text", "source")
    val a = once.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = twice.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b) // a line kept in pass 1 is below threshold in pass 2
  }

  test("span excision conserves tokens: kept + excised = total; " +
    "dup-free corpora pass through identity") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(120)
    val out = graft.operators.RepeatedSpans
      .excise(docs, "doc_id", "text", k = 6).collect()
    out.foreach { r =>
      val kept = r.getString(1).split("\\s+").count(_.nonEmpty)
      assert(kept + r.getLong(3) === r.getLong(2),
        s"doc ${r.getLong(0)}")
    }
    // a corpus of all-distinct single docs has nothing to excise
    val uniq = Seq((1L, "entirely fresh words never repeated"),
      (2L, "another disjoint sentence here today")).toDF("doc_id", "text")
    val id = graft.operators.RepeatedSpans
      .excise(uniq, "doc_id", "text", k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(id(1L) === (("entirely fresh words never repeated", 0L)))
    assert(id(2L)._2 === 0L)
  }

  test("fleissKappa matches a brute-force reference on random panels") {
    val rng = new scala.util.Random(21L)
    val cats = Seq("x", "y", "z")
    // items with 1..5 ratings each — the modal panel emerges from data
    val ratings = (1 to 60).flatMap { i =>
      (0 until (1 + rng.nextInt(5))).map(_ => (s"i$i", cats(rng.nextInt(3))))
    }
    val got = RaterAgreement.fleissKappa(
      ratings.toDF("item", "cat"), "item", "cat").collect().head

    val byItem = ratings.groupBy(_._1).toSeq.map { case (_, rs) =>
      val cnts = rs.groupBy(_._2).map(_._2.size.toLong)
      (cnts.sum, cnts.map(c => c * c).sum,
        rs.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong })
    }
    val modalM = byItem.groupBy(_._1).toSeq
      .maxBy { case (m, xs) => (xs.size, m) }._1
    val kept = byItem.filter(_._1 == modalM)
    val n = kept.size.toLong
    val totSq = kept.map(_._2).sum
    val nj = kept.flatMap(_._3.toSeq).groupBy(_._1)
      .map { case (_, xs) => xs.map(_._2).sum }
    val nm = n * modalM
    val pBar = (totSq - nm).toDouble / (nm * (modalM - 1)).toDouble
    val pE = nj.map(x => x.toDouble * x.toDouble).sum / (nm.toDouble * nm)
    val kappa = (pBar - pE) / (1.0 - pE)
    assert(got.getAs[Long]("n_items") === n)
    assert(got.getAs[Long]("n_raters") === modalM)
    assert(got.getAs[Long]("n_items_dropped") === byItem.size - n)
    assert(math.abs(got.getAs[Double]("p_bar") - pBar) < 1e-6)
    assert(math.abs(got.getAs[Double]("p_e") - pE) < 1e-6)
    assert(math.abs(got.getAs[Double]("fleiss_kappa") - kappa) < 1e-6)
  }

  test("krippendorffAlpha matches a brute-force reference on random " +
      "variable panels") {
    val rng = new scala.util.Random(31L)
    val cats = Seq("x", "y", "z", "w")
    val ratings = (1 to 80).flatMap { i =>
      (0 until (1 + rng.nextInt(4))).map(_ => (s"i$i", cats(rng.nextInt(4))))
    }
    val got = RaterAgreement.krippendorffAlpha(
      ratings.toDF("item", "cat"), "item", "cat").collect().head

    val byItem = ratings.groupBy(_._1).toSeq.map { case (_, rs) =>
      val cnts = rs.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
      (cnts.values.sum, cnts)
    }.filter(_._1 >= 2)
    val n = byItem.map(_._1).sum
    // mirror the engine's per-item DECIMAL(28,10) quantization before
    // the order-free sum
    val doN = byItem.map { case (m, cnts) =>
      val ssq = cnts.values.map(c => c * c).sum
      BigDecimal((m * m - ssq).toDouble / (m - 1).toDouble)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val nc = byItem.flatMap(_._2.toSeq).groupBy(_._1)
      .map { case (_, xs) => xs.map(_._2).sum }
    val deN = BigDecimal(n) * BigDecimal(n) -
      nc.map(c => BigDecimal(c) * BigDecimal(c)).sum
    val alpha = 1.0 - (n - 1).toDouble * doN.toDouble / deN.toDouble
    assert(got.getAs[Long]("n_items") === byItem.size.toLong)
    assert(got.getAs[Long]("n_ratings") === n)
    assert(math.abs(got.getAs[Double]("d_o") - doN.toDouble / n) < 1e-6)
    assert(math.abs(got.getAs[Double]("krippendorff_alpha") - alpha) < 1e-6)
  }
}
