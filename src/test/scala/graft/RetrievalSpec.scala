package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark hash join hash join hash"),
    (2L, "vector stream vector"),
    (3L, "the quick brown fox"),
    (4L, "hash join the table scan row"),
    (5L, "stream stream stream stream stream stream stream stream")
  ).toDF("doc_id", "text")

  private val terms = Seq("hash", "vector", "stream")

  /** Plain-Scala BM25 reference (same Lucene-style idf). */
  private def reference: Map[Long, (Double, Long)] = {
    val docs = Map(
      1L -> "spark hash join hash join hash",
      2L -> "vector stream vector",
      3L -> "the quick brown fox",
      4L -> "hash join the table scan row",
      5L -> "stream stream stream stream stream stream stream stream")
      .view.mapValues(_.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n.toDouble
    val dfm = terms.map(t =>
      t -> docs.values.count(_.contains(t))).toMap.filter(_._2 > 0)
    val (k1, b) = (1.2, 0.75)
    docs.flatMap { case (id, tk) =>
      val per = terms.flatMap { t =>
        val tf = tk.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log(
            (n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
          Some(BigDecimal(
            idf * (tf * (k1 + 1.0)) /
              (tf + k1 * ((1.0 - b) + b * tk.size / avgdl)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP))
        }
      }
      if (per.isEmpty) None
      else Some(id -> ((per.sum.toDouble, per.size.toLong)))
    }
  }

  test("bm25 matches a plain-Scala reference, non-matching docs dropped") {
    val got = Retrieval.bm25(corpus, "doc_id", "text", terms)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val want = reference
    assert(got.keySet === want.keySet)   // doc 3 has no query term
    assert(!got.contains(3L))
    want.foreach { case (id, (score, nTerms)) =>
      val (gs, gn) = got(id)
      assert(gn === nTerms, s"doc $id n_terms")
      assert(math.abs(gs - BigDecimal(score)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc $id score: got $gs want $score")
    }
  }

  test("bm25 favors higher tf but saturates, and penalizes long docs") {
    val got = Retrieval.bm25(corpus, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 (tf=3 for hash) beats doc 4 (tf=1) at the SAME dl=6
    // (an unequal-length pair would instead test length normalization)
    assert(got(1L) > got(4L))
    // doc 5 has tf=8 for stream but is long; saturation keeps its
    // per-term score under 3x doc 2's stream contribution
    assert(got(5L) < 3.0 * got(2L))
  }

  test("bm25TopK returns k rows in (score desc, id) order") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, 2)
      .collect()
    assert(top.length === 2)
    val all = Retrieval.bm25(corpus, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
    assert(top.map(_.getLong(0)).toSeq === all.take(2).map(_._1).toSeq)
  }

  test("query terms are lowercased and deduplicated") {
    val a = Retrieval.bm25(corpus, "doc_id", "text",
      Seq("HASH", "hash", "Stream")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Retrieval.bm25(corpus, "doc_id", "text",
      Seq("hash", "stream")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }

  test("plan shape: idf side is broadcast, no corpus-sized shuffle join") {
    val df = Retrieval.bm25(corpus, "doc_id", "text", terms)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
