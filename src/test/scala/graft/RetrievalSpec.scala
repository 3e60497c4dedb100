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

  test("the idf broadcast-back survives EXECUTION as a " +
      "BroadcastHashJoin, never sort-merge (VERDICT r18 #4 pin)") {
    // the |Q|-row df table joins back against the per-(doc, term) tf
    // frame — corpus-cardinal on a real corpus. The hinted broadcast
    // is the whole reason this pass is map-side at 100 TB (PLANS.md);
    // pin the FINAL adaptive plan so a condition change that demotes
    // it (the q139 `<=>` lesson) fails a spec, not a scale run.
    val out = Retrieval.bm25(corpus, "doc_id", "text", terms)
    val plan = finalPlan(out)
    assert(plan.contains("BroadcastHashJoin"),
      s"idf join not broadcast in the final plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"idf join demoted to SortMergeJoin:\n$plan")
  }

  // ---- rankingEval ----------------------------------------------------

  private def evalRuns = Seq(
    // q=1: six candidates (k=5 cuts d15), plus a null and a NaN score
    // row that the heap contract drops
    (1L, 10L, Some(9.0)), (1L, 11L, Some(8.0)), (1L, 12L, Some(7.0)),
    (1L, 13L, Some(6.0)), (1L, 14L, Some(5.0)), (1L, 15L, Some(4.0)),
    (1L, 98L, Some(Double.NaN)), (1L, 99L, None),
    // q=3 has runs but no judgments -> not scored
    (3L, 30L, Some(1.0))
  ).toDF("q", "d", "s")

  private def evalQrels = Seq(
    // q=1: d11 judged twice (grades 1 and 2 -> max 2), d13 grade 1,
    // d77 relevant but never retrieved, d10 judged NON-relevant
    // (grade 0), d12 null grade (-> 0)
    (1L, 11L, Some(2)), (1L, 11L, Some(1)), (1L, 13L, Some(1)),
    (1L, 77L, Some(2)), (1L, 10L, Some(0)), (1L, 12L, None),
    // q=2: one relevant doc, no runs at all -> 0/0/0
    (2L, 20L, Some(3))
  ).toDF("q", "d", "g")

  test("rankingEval: trec semantics on a hand-checked fixture") {
    val out = Retrieval.rankingEval(
        evalRuns, evalQrels, "q", "d", "s", "g", k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // evaluated set = queries with a positive judgment: 1 and 2 only
    assert(out.keySet === Set(1L, 2L))
    val (nRel1, recall1, mrr1, ndcg1) = out(1L)
    // top-5 = d10(g0) d11(g2) d12(g0) d13(g1) d14(g0); relevant = {11,13,77}
    assert(nRel1 === 3L)
    assert(recall1 === math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6) // 0.666667
    assert(mrr1 === 0.5) // first relevant at rank 2
    // ndcg: gains at ranks 2 and 4 vs ideal grades [2,2,1] — exact value
    // pinned by the window-parity test; here just the sane range
    assert(ndcg1 > 0.0 && ndcg1 < 1.0)
    // q=2: judged but never retrieved
    assert(out(2L) === ((1L, 0.0, 0.0, 0.0)))
  }

  test("rankingEval: parity with a whole-group window formulation") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(101)
    val runs = (for {
      q <- 0L until 40L
      d <- 0L until (3 + rng.nextInt(8)).toLong
    } yield (q, d, rng.nextDouble() * 10)).toDF("q", "d", "s")
    val qrels = (for {
      q <- 0L until 45L // some queries have judgments but no runs
      d <- 0L until 10L
      if rng.nextDouble() < 0.4
    } yield (q, d, rng.nextInt(4))).toDF("q", "d", "g")
    val k = 4

    // reference: identical math over row_number windows (whole-group
    // sorts — correct, just not the 100 TB shape)
    val g = qrels.groupBy($"q", $"d").agg(max($"g").as("g"))
    val pos = g.filter($"g" > 0)
    def dcgTerm = ((pow(lit(2.0), greatest($"g", lit(0))) - lit(1.0)) /
      log2($"rk" + lit(1))).cast("decimal(22,9)")
    val ranked = runs
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q").orderBy($"s".desc, $"d".asc)))
      .filter($"rk" <= k)
      .join(g, Seq("q", "d"), "left")
      .withColumn("g", coalesce($"g", lit(0)))
    val runAgg = ranked.groupBy($"q").agg(
      sum(when($"g" > 0, 1L).otherwise(0L)).as("hits"),
      max(when($"g" > 0, lit(1.0) / $"rk").otherwise(0.0)).as("mrr"),
      sum(dcgTerm).as("dcg"))
    val idealAgg = pos
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q").orderBy($"g".desc, $"d".asc)))
      .filter($"rk" <= k)
      .groupBy($"q").agg(sum(dcgTerm).as("idcg"))
    val expected = pos.groupBy($"q").agg(count(lit(1)).as("n_rel"))
      .join(idealAgg, Seq("q"))
      .join(runAgg, Seq("q"), "left")
      .select($"q", $"n_rel",
        round(coalesce($"hits", lit(0L)).cast("double") / $"n_rel", 6)
          .as("recall_at_k"),
        round(coalesce($"mrr", lit(0.0)), 6).as("mrr_at_k"),
        round(coalesce($"dcg".cast("double"), lit(0.0)) /
          $"idcg".cast("double"), 6).as("ndcg_at_k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

    val got = Retrieval.rankingEval(runs, qrels, "q", "d", "s", "g", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got === expected)
  }

  test("rankingEval: negative grades gain zero, never count relevant; " +
      "null-doc judgments don't inflate n_rel") {
    val runs = Seq(
      (1L, Some(10L), 9.0), (1L, Some(11L), 8.0), (1L, Some(12L), 7.0)
    ).toDF("q", "d", "s")
    val qrels = Seq(
      (1L, Some(10L), -2),       // spam label on the TOP hit
      (1L, Some(11L), 1),        // the only true relevant
      (1L, None: Option[Long], 3)// null doc id — must be ignored
    ).toDF("q", "d", "g")
    val out = Retrieval.rankingEval(runs, qrels, "q", "d", "s", "g", 3)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 1L)   // n_rel: the null-doc grade-3 row is out
    assert(r.getDouble(2) === 1.0) // recall: d11 retrieved
    assert(r.getDouble(3) === 0.5) // mrr: first RELEVANT at rank 2 — the
                                   // spam doc at rank 1 is not relevant
    // ndcg: dcg = 1/log2(3) (d10's negative grade gains ZERO, d12's 0
    // too); idcg = 1/log2(2) = 1 -> ndcg = round(1/log2(3), 6)
    val expected = BigDecimal(1.0 / (math.log(3.0) / math.log(2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(r.getDouble(4) ===
      (expected / 1).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("rankingEval accepts decimal doc ids via the exact tie mapping") {
    val runs = Seq(
      (1L, BigDecimal("100.10"), 5.0), (1L, BigDecimal("100.02"), 5.0),
      (1L, BigDecimal("99.99"), 4.0)
    ).toDF("q", "d", "s")
      .select($"q", $"d".cast("decimal(10,2)").as("d"), $"s")
    val qrels = Seq((1L, BigDecimal("100.02"), 1))
      .toDF("q", "d", "g")
      .select($"q", $"d".cast("decimal(10,2)").as("d"), $"g")
    // equal scores tie by doc ASC: 100.02 ranks before 100.10, so the
    // relevant doc sits at rank 1 with k=2
    val out = Retrieval.rankingEval(runs, qrels, "q", "d", "s", "g", 2)
      .collect()
    assert(out.length === 1)
    assert(out.head.getDouble(3) === 1.0) // mrr = 1/1
  }

  test("rankingEval: duplicate retrievals collapse — recall stays <= 1, " +
      "DCG counts a doc once") {
    val runs = Seq(
      (1L, 11L, 9.0), (1L, 11L, 8.0), // duplicate retrieval of d11
      (1L, 12L, 7.0)
    ).toDF("q", "d", "s")
    val qrels = Seq((1L, 11L, 1)).toDF("q", "d", "g")
    val out = Retrieval.rankingEval(runs, qrels, "q", "d", "s", "g", 5)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 1L)
    assert(r.getDouble(2) === 1.0) // NOT 2.0 — the dup collapsed
    assert(r.getDouble(3) === 1.0) // best copy ranks 1st
    assert(r.getDouble(4) === 1.0) // dcg = idcg = 1/log2(2), single-counted
  }

  test("rankingEval ranks long scores at full 64-bit precision") {
    // 2^53 and 2^53+1 collapse to the same double; the uncast integral
    // order path must keep them distinct
    val lo = 9007199254740992L // 2^53
    val hi = 9007199254740993L // 2^53 + 1 — strictly higher score
    val runs = Seq((1L, 10L, lo), (1L, 11L, hi)).toDF("q", "d", "s")
    val qrels = Seq((1L, 11L, 1)).toDF("q", "d", "g")
    val out = Retrieval.rankingEval(runs, qrels, "q", "d", "s", "g", 1)
      .collect()
    assert(out.length === 1)
    // with k=1 only the TRUE top doc survives the cut: d11 (score 2^53+1)
    assert(out.head.getDouble(3) === 1.0,
      "2^53+1 ranked below 2^53 — the score was coerced through double")
  }

  test("compareRankers: paired t from exact per-query deltas") {
    // ranker A finds the relevant doc at rank 1 for q1/q2 and rank 3
    // for q3; ranker B mirrors it (rank 3 for q1/q2, rank 1 for q3) —
    // known MRR deltas [2/3, 2/3, -2/3]
    val qrels = Seq((1L, 11L, 1), (2L, 21L, 1), (3L, 31L, 1))
      .toDF("q", "d", "g")
    def runsOf(hits: Map[Long, Long]) = (for {
      q <- 1L to 3L
      (d, s) <- Seq((hits(q), 2.0), (900L + q, 1.0))
    } yield (q, d, s)).toDF("q", "d", "s")
    val runsA = runsOf(Map(1L -> 11L, 2L -> 21L, 3L -> 931L))
      .union(Seq((3L, 31L, 0.5)).toDF("q", "d", "s"))
    val runsB = runsOf(Map(1L -> 911L, 2L -> 921L, 3L -> 31L))
      .union(Seq((1L, 11L, 0.5), (2L, 21L, 0.5)).toDF("q", "d", "s"))
    val out = Retrieval.compareRankers(runsA, runsB, qrels,
      "q", "d", "s", "g", k = 5, metric = "mrr_at_k").collect().head
    assert(out.getLong(0) === 3L)
    // A mrr: [1, 1, 1/3->0.333333]; B mrr: [1/3, 1/3, 1] (the missed
    // relevant doc ranks THIRD — behind the 1.0-score filler)
    assert(out.getDouble(1) ===
      BigDecimal((1.0 + 1.0 + 0.333333) / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // deltas: [0.666667, 0.666667, -0.666667]; t from the closed form
    val d = Seq(BigDecimal("0.666667"), BigDecimal("0.666667"),
      BigDecimal("-0.666667"))
    val n = 3.0
    val s1 = d.sum.toDouble; val s2 = d.map(x => x * x).sum.toDouble
    val t = (s1 / n) / math.sqrt(((s2 - s1 * s1 / n) / (n - 1)) / n)
    assert(out.getDouble(3) === BigDecimal(s1 / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getDouble(4) === BigDecimal(t)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getLong(5) === 2L)
  }

  test("bm25 on an empty / all-null-text corpus returns empty, no NPE") {
    val empty = corpus.limit(0)
    assert(Retrieval.bm25(empty, "doc_id", "text", terms)
      .collect().isEmpty)
    val nullText = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    assert(Retrieval.bm25(nullText, "doc_id", "text", terms)
      .collect().isEmpty)
  }

  test("compareRankers: uniform nonzero delta -> NULL t, nonzero mean " +
      "(read them together)") {
    // both queries: A ranks the relevant doc 1st, B ranks it 2nd —
    // every delta is exactly +0.5, sample variance 0, t undefined
    // (mathematically +inf). The contract: NULL t alongside a NONZERO
    // mean_delta means a uniform difference, not "no evidence".
    val qrels = Seq((1L, 11L, 1), (2L, 21L, 1)).toDF("q", "d", "g")
    val runsA = Seq((1L, 11L, 2.0), (1L, 91L, 1.0),
      (2L, 21L, 2.0), (2L, 92L, 1.0)).toDF("q", "d", "s")
    val runsB = Seq((1L, 91L, 2.0), (1L, 11L, 1.0),
      (2L, 92L, 2.0), (2L, 21L, 1.0)).toDF("q", "d", "s")
    val out = Retrieval.compareRankers(runsA, runsB, qrels,
      "q", "d", "s", "g", k = 2, metric = "mrr_at_k").collect().head
    assert(out.getDouble(3) === 0.5)
    assert(out.isNullAt(4))
    assert(out.getLong(5) === 1L)
  }

  test("compareRankers: identical rankers -> zero delta, NULL t") {
    val qrels = Seq((1L, 11L, 1), (2L, 21L, 2)).toDF("q", "d", "g")
    val runs = Seq((1L, 11L, 2.0), (1L, 12L, 1.0), (2L, 21L, 3.0))
      .toDF("q", "d", "s")
    val out = Retrieval.compareRankers(runs, runs, qrels,
      "q", "d", "s", "g", k = 3).collect().head
    assert(out.getDouble(3) === 0.0) // mean_delta
    assert(out.isNullAt(4), "zero-variance t must be NULL, not NaN")
    // single query: df 0, t NULL regardless of values
    val one = Retrieval.compareRankers(runs, runs,
      qrels.filter($"q" === 1L), "q", "d", "s", "g", k = 3)
      .collect().head
    assert(one.getLong(0) === 1L && one.isNullAt(4) &&
      one.getLong(5) === 0L)
  }

  // ---- hardNegatives ----------------------------------------------------

  test("hardNegatives: known positives excluded, judged grade-0 and " +
      "null-grade docs stay eligible, null ids dropped") {
    val runs = Seq(
      (Some(1L), Some(10L), Some(9.0)), (Some(1L), Some(11L), Some(8.0)),
      (Some(1L), Some(12L), Some(7.0)), (Some(1L), Some(13L), Some(6.0)),
      (Some(1L), Some(14L), Some(5.0)),
      // null ids can't form a training pair nor match judgments
      (Some(1L), None, Some(99.0)), (None, Some(15L), Some(99.0)))
      .toDF("q", "d", "s")
    val qrels = Seq(
      (1L, Some(11L), Some(2)),   // positive -> excluded
      (1L, Some(13L), Some(1)),   // positive -> excluded
      (1L, Some(10L), Some(0)),   // judged NON-relevant -> eligible
      (1L, Some(12L), None),      // null grade reads 0 -> eligible
      (1L, None, Some(3)))        // null doc judgment ignored
      .toDF("q", "d", "g")
    val out = Retrieval.hardNegatives(runs, qrels, "q", "d", "s", "g", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    // eligible negatives: 10 (9.0), 12 (7.0), 14 (5.0); k=2 keeps the
    // two strongest, rank by score desc
    assert(out.toSeq === Seq((1L, 1, 10L, 9.0), (1L, 2, 12L, 7.0)))
  }

  test("hardNegatives: score ties break by doc id ascending; queries " +
      "with no positives keep their full top-k") {
    val runs = Seq((1L, 12L, 5.0), (1L, 10L, 5.0), (1L, 11L, 5.0),
      (2L, 20L, 1.0)).toDF("q", "d", "s")
    val qrels = Seq((1L, 99L, 1)).toDF("q", "d", "g")
    val out = Retrieval.hardNegatives(runs, qrels, "q", "d", "s", "g", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq((1L, 1, 10L), (1L, 2, 11L),
      (2L, 1, 20L)))
  }

  test("hardNegatives: duplicate retrievals collapse to one negative " +
      "slot (best-scored copy), the rankingEval bounded-damage contract") {
    // doc 10 arrives from two candidate sources: ONE pair at the best
    // score, never two. Both copies land inside the k=2 cut, so the
    // boundary doc 11 is crowded out — the documented trade (collapse
    // happens on the bounded cut; duplicates are an input defect)
    val runs = Seq((1L, 10L, 5.0), (1L, 10L, 9.0), (1L, 11L, 4.0))
      .toDF("q", "d", "s")
    val qrels = Seq((1L, 99L, 1)).toDF("q", "d", "g")
    val out = Retrieval.hardNegatives(runs, qrels, "q", "d", "s", "g", 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((1, 10L, 9.0)))
    // with k wide enough that the duplicate does not sit on the
    // boundary, the distinct doc keeps its slot
    val wide = Retrieval.hardNegatives(runs, qrels, "q", "d", "s", "g", 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(wide.toSeq === Seq((1, 10L, 9.0), (2, 11L, 4.0)))
  }

  test("hardNegatives ranks long scores at full 64-bit precision") {
    // adjacent longs past 2^53 collapse under a double cast — the
    // rankingEval precedent: integral scores rank UNCAST
    val big = (1L << 53) + 2L
    val runs = Seq((1L, 10L, big), (1L, 11L, big + 1L)).toDF("q", "d", "s")
    val qrels = Seq((2L, 99L, 1)).toDF("q", "d", "g")
    val out = Retrieval.hardNegatives(runs, qrels, "q", "d", "s", "g", 1)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 11L,
      "the larger 64-bit score must win the cut")
    assert(out.head.getLong(3) === big + 1L)
  }

  test("hardNegatives: missing or ambiguous score column fails fast") {
    val runs = Seq((1L, 10L, 1.0, 2.0)).toDF("q", "d", "s", "S")
    val qrels = Seq((1L, 11L, 1)).toDF("q", "d", "g")
    val amb = intercept[IllegalArgumentException] {
      Retrieval.hardNegatives(runs, qrels, "q", "d", "s", "g", 1)
    }
    assert(amb.getMessage.contains("ambiguous"))
    val missing = intercept[IllegalArgumentException] {
      Retrieval.hardNegatives(
        runs.select("q", "d"), qrels, "q", "d", "nope", "g", 1)
    }
    assert(missing.getMessage.contains("not in"))
  }

  test("hardNegatives plan: anti-join then heap cut — no whole-group " +
      "sort, rank reuses the heap's partitioning") {
    val runs = Seq((1L, 10L, 9.0), (1L, 11L, 8.0), (2L, 20L, 7.0))
      .toDF("q", "d", "s")
    val qrels = Seq((1L, 11L, 1)).toDF("q", "d", "g")
    val df = Retrieval.hardNegatives(runs, qrels, "q", "d", "s", "g", 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerGroup"), plan.take(2000))
    assert(plan.contains("LeftAnti"), plan.take(2000))
    // ONE hash exchange: the heap cut's. The rank window clusters on
    // the same key and must inherit the exec's propagated partitioning
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1,
      s"expected ONE hash exchange, found $exchanges:\n" + plan.take(3000))
  }

  test("rankingEval plan: both cuts ride the heap exec") {
    val df = Retrieval.rankingEval(
      evalRuns, evalQrels, "q", "d", "s", "g", k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the corpus-sized runs cut AND the ideal-grades cut are both the
    // bounded-heap operator — the only Sorts the operator adds are the
    // rank windows over each cut's <=k survivors per query
    assert(plan.sliding("TopKPerGroup".length)
      .count(_ == "TopKPerGroup") >= 2, plan)
  }
}
