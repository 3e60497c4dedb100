package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Sampling}

class CurationSpec extends SparkTestBase {

  private val ts = Seq(0.7, 0.8, 0.9, 0.95)
  private val edges = Seq(100.0, 200.0, 300.0, 400.0, 500.0)

  test("curationReport: threshold follows the budget rule, counts " +
      "reconcile with the pairwise dedup, folds are group-coherent") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val curve = Dedup.thresholdSweep(docs, "doc_id", "text", ts)
      .collect().map(r => (r.getDouble(0), r.getLong(2))).toMap
    // a budget equal to the curve's tightest point forces the rule to
    // discriminate: smallest threshold that fits, not just min(ts)
    val budget = curve.values.min
    val rep = Curation.curationReport(docs, "doc_id", "text", "source",
      "n_chars", ts, budget, folds = 4, edges = edges).collect()
    assert(rep.nonEmpty)
    val expectChosen = ts.sorted.find(t => curve(t) <= budget)
      .getOrElse(ts.max)
    assert(rep.forall(_.getDouble(1) == expectChosen),
      "chosen_threshold must be the smallest within the budget")
    // counts reconcile: Σ fold n_docs == corpus minus pairwise losers
    // at the chosen threshold (greater endpoint loses)
    val losers = Dedup.portableNearDups(docs, "doc_id", "text",
        threshold = expectChosen)
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = docs.join(losers, Seq("doc_id"), "left_anti")
    assert(rep.map(_.getLong(2)).sum == deduped.count())
    // leakage safety survives the composition: no source straddles folds
    val straddlers = Sampling.kFold(deduped, "source", 4)
      .groupBy(col("source"))
      .agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") > 1)
    assert(straddlers.count() == 0)
  }

  test("curationReport: null-source docs surface as fold -1 and the " +
      "report still reconciles with the deduped corpus") {
    // review finding: kFold's null fold key fell out of the stage-5
    // equi-join (null != null), so null-source docs vanished from the
    // report and sum(n_docs) under-counted the deduped corpus
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .limit(60)
      .unionByName(Seq(
        (900001L, "an orphan row with no source at all", null, 36L),
        (900002L, "another orphan row with no source", null, 33L))
        .toDF("doc_id", "text", "source", "n_chars")
        .select(col("doc_id"), col("text"),
          col("source").cast("string").as("source"),
          lit("en").as("lang"), col("n_chars")))
    val rep = Curation.curationReport(docs, "doc_id", "text", "source",
      "n_chars", ts, maxAffectedDocs = 0L, folds = 4, edges = edges)
      .collect()
    val byFold = rep.map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(byFold.contains(-1), s"null-source fold missing: $byFold")
    assert(byFold(-1) == 2L)
    // total reconciliation INCLUDING the null fold
    val losers = Dedup.portableNearDups(docs, "doc_id", "text",
        threshold = ts.max)
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = docs.join(losers, Seq("doc_id"), "left_anti")
    assert(byFold.values.sum == deduped.count())
  }

  test("curationReport: an unmeetable budget falls back to the most " +
      "conservative threshold") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val curve = Dedup.thresholdSweep(docs, "doc_id", "text", ts)
      .collect().map(r => (r.getDouble(0), r.getLong(2))).toMap
    assume(curve(ts.max) > 0, "fixture has near-dups at the top threshold")
    val rep = Curation.curationReport(docs, "doc_id", "text", "source",
      "n_chars", ts, maxAffectedDocs = 0L, folds = 4, edges = edges)
      .collect()
    assert(rep.forall(_.getDouble(1) == ts.max))
  }
}
