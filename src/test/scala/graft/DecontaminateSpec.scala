package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Decontaminate

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),   // contains eval's 4-gram
    (2L, "one two three four five six seven"),     // clean
    (3L, "alpha beta gamma delta unrelated tail"), // partial overlap
    (4L, "tiny doc")                               // < n tokens: no grams
  ).toDF("doc_id", "text")

  private lazy val evalSet = Seq(
    (100L, "prefix words alpha beta gamma delta epsilon suffix")
  ).toDF("doc_id", "text")

  test("ngramOverlap counts shared distinct n-grams per train doc") {
    val got = Decontaminate.ngramOverlap(train, evalSet,
      "doc_id", "text", n = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: 3 distinct 4-grams, 2 appear in eval ("alpha beta gamma
    // delta", "beta gamma delta epsilon")
    assert(got(1L) == (3L, 2L))
    assert(got(2L) == (4L, 0L))
    assert(got(3L) == (3L, 1L))
    assert(!got.contains(4L)) // no 4-grams -> no row
  }

  test("clean removes only docs at or above the overlap threshold") {
    val kept = Decontaminate.clean(train, evalSet, "doc_id", "text",
      n = 4, maxOverlap = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 1 overlap 2/3 >= 0.5 -> dropped; doc 3 overlap 1/3 -> kept;
    // doc 4 has no grams -> kept (nothing to leak)
    assert(kept == Set(2L, 3L, 4L))
  }

  test("the eval-gram join is BROADCAST in the final adaptive plan, " +
      "never sort-merge (VERDICT r18 #4 pin)") {
    // ngramOverlap leaves the broadcast to Catalyst/AQE by design (the
    // eval side is an aggregate — no static stats, but tiny at
    // runtime). This pin holds the DESIGN claim in the scaladoc
    // ("Catalyst broadcasts it, making the pass effectively map-side
    // at 100 TB"): on an eval set orders of magnitude under the
    // broadcast threshold, the FINAL plan must show the train-gram
    // explode joining a broadcast, not shuffling. A change that
    // defeats the runtime conversion (a null-safe key, a non-equi
    // condition) fails here, not on a cluster.
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val evalTiny = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    val out = Decontaminate.ngramOverlap(docs, evalTiny, "doc_id", "text",
      n = 4)
    val plan = finalPlan(out)
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram join not broadcast in the final plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"eval-gram join demoted to SortMergeJoin:\n$plan")
  }

  test("repetitionScore measures the repeated-trigram fraction") {
    val score = (t: String) => Seq(t).toDF("text")
      .select(TextFunctions.repetitionScore(col("text"), 3).as("s"))
      .head().getDouble(0)
    assert(score("a b c d e") == 0.0) // all trigrams distinct
    // "a b c a b c a b c": 7 trigrams, 3 distinct -> 4/7 repeated
    assert(math.abs(score("a b c a b c a b c") - 4.0 / 7) < 1e-12)
    assert(score("one two") == 0.0) // shorter than n -> defined as 0
    assert(score("") == 0.0)
  }
}
