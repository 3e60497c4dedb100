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
