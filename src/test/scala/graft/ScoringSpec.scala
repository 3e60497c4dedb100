package graft

import graft.operators.Scoring
import org.apache.spark.sql.functions._

class ScoringSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64
  private val w = Scoring.dyadicWeights(dim)

  test("score matches a hand-rolled JVM reference on real docs") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val got = docs.select(col("doc_id"),
        Scoring.logit(col("text"), w, bias = 0.25).as("l"),
        Scoring.score(col("text"), w, bias = 0.25).as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    // independent reference: same md5-less bucket (xxhash64 arm is the
    // default), so recompute buckets through Spark once and fold in
    // plain Scala — catches wiring (pooling, bias, element_at base-1)
    // rather than re-deriving the hash.
    val toks = docs.select(col("doc_id"),
        split(lower(col("text")), "\\s+").as("tk"))
      .as[(Long, Seq[String])].collect()
    val buckets = toks.flatMap(_._2).filter(_.nonEmpty).distinct.toSeq.toDF("t")
      .select(col("t"), Scoring.bucketFast(col("t"), dim).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    toks.foreach { case (id, tk) =>
      val ts = tk.filter(_.nonEmpty)
      val s = ts.foldLeft(0.0)((acc, t) => acc + w(buckets(t)))
      val logit = s / math.max(ts.size, 1) + 0.25
      val expect = 1.0 / (1.0 + math.exp(-logit))
      // the fold/pool/bias arithmetic must be bit-exact; the sigmoid is
      // allowed 2 ulps (Spark's codegen exp need not be Math.exp)
      assert(got(id)._1 == logit, s"logit doc $id")
      assert(math.abs(got(id)._2 - expect) <= 2 * math.ulp(expect),
        s"score doc $id")
    }
  }

  test("portable and fast arms differ only by bucket hash, both in (0,1)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val both = docs.select(
        Scoring.score(col("text"), w, 0.0, portable = true).as("p"),
        Scoring.score(col("text"), w, 0.0, portable = false).as("f"))
      .collect()
    assert(both.forall(r => r.getDouble(0) > 0 && r.getDouble(0) < 1))
    assert(both.forall(r => r.getDouble(1) > 0 && r.getDouble(1) < 1))
  }

  test("sum pooling accumulates evidence; empty text scores sigmoid(bias)") {
    val df = Seq((1L, "alpha alpha alpha"), (2L, "alpha"), (3L, ""))
      .toDF("id", "text")
    val r = df.select(col("id"),
        Scoring.score(col("text"), w, 0.5, meanPool = false).as("sum"),
        Scoring.score(col("text"), w, 0.5).as("mean"))
      .collect().map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2))))
      .toMap
    // mean pooling: 3x same token == 1x same token
    assert(r(1L)._2 == r(2L)._2)
    // sum pooling: 3x token moves the logit 3x as far from bias
    assert(r(1L)._1 != r(2L)._1)
    assert(r(3L)._1 == 1.0 / (1.0 + math.exp(-0.5)))
  }

  test("scoring plan is map-only: no exchange, stays in one codegen stage") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val plan = docs.select(Scoring.score(col("text"), w, 0.0).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("dyadicWeights render exactly: literal round-trips via decimal") {
    Scoring.dyadicWeights(256).foreach { d =>
      assert(java.lang.Double.parseDouble(d.toString) == d)
    }
  }
}
