package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixing

class MixingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = (0 until 3000).map { i =>
    val src = Seq("web", "code", "books", "junk")(i % 4) // 750 each
    (i.toLong, src, s"doc $i")
  }.toDF("id", "source", "text").cache()

  test("mixFractions keeps the binding source whole, scales the rest") {
    val f = Mixing.mixFractions(
      Map("web" -> 750L, "code" -> 750L, "books" -> 750L),
      Map("web" -> 0.6, "code" -> 0.3, "books" -> 0.1))
    // web binds: N = 750/0.6 = 1250 → web 1.0, code 0.5, books 1/6
    assert(f("web") == 1.0)
    assert(math.abs(f("code") - 0.5) < 1e-12)
    assert(math.abs(f("books") - 1.0 / 6) < 1e-12)
  }

  test("temperatureWeights: alpha=1 natural, alpha=0 uniform, low alpha upweights rare") {
    val counts = Map("web" -> 900L, "code" -> 90L, "books" -> 10L)
    val natural = Mixing.temperatureWeights(counts, 1.0)
    assert(math.abs(natural("web") - 0.9) < 1e-12)
    assert(math.abs(natural("books") - 0.01) < 1e-12)
    val uniform = Mixing.temperatureWeights(counts, 0.0)
    assert(uniform.values.forall(w => math.abs(w - 1.0 / 3) < 1e-12))
    val t03 = Mixing.temperatureWeights(counts, 0.3)
    // rare source gains share vs natural, dominant loses; sums to 1
    assert(t03("books") > natural("books") && t03("web") < natural("web"))
    assert(math.abs(t03.values.sum - 1.0) < 1e-12)
    // composes with the mixer: weights are a valid mixSources target
    val rows = (1 to 100).map(i =>
      (i.toLong, if (i <= 80) "web" else if (i <= 95) "code" else "books"))
      .toDF("id", "source")
    val mixed = Mixing.mixSources(rows, "id", "source",
      Mixing.temperatureWeights(Map("web" -> 80L, "code" -> 15L,
        "books" -> 5L), 0.5))
    assert(mixed.count() > 0)
  }

  test("mixSources hits target proportions and drops unlisted sources") {
    val out = Mixing.mixSources(corpus, "id", "source",
      Map("web" -> 0.6, "code" -> 0.3, "books" -> 0.1))
    val got = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("junk"))
    val total = got.values.sum.toDouble
    // hash buckets are approximate at n=750; 5% absolute tolerance
    assert(math.abs(got("web") / total - 0.6) < 0.05)
    assert(math.abs(got("code") / total - 0.3) < 0.05)
    assert(math.abs(got("books") / total - 0.1) < 0.05)
    // binding source (web) is kept whole — no upsampling anywhere
    assert(got("web") == 750L)
    // deterministic: identical output set on re-run
    val again = Mixing.mixSources(corpus, "id", "source",
      Map("web" -> 0.6, "code" -> 0.3, "books" -> 0.1))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("a target source absent from the data yields an empty mix") {
    // absent source has 0 rows -> N = min(n_s/w_s) = 0 -> nothing can
    // satisfy the proportions without upsampling
    val out = Mixing.mixSources(corpus, "id", "source",
      Map("web" -> 0.5, "nonexistent" -> 0.5))
    assert(out.count() == 0)
  }

  test("token-budget selection keeps best-first within each source's cap") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // (id, source, tokens, quality)
      (1L, "web", 50L, 0.9), (2L, "web", 60L, 0.8), (3L, "web", 40L, 0.7),
      (4L, "code", 100L, 0.5), (5L, "code", 30L, 0.9)
    ).toDF("id", "source", "n_tokens", "quality")
    val out = Mixing.selectWithinTokenBudget(docs, "source", "n_tokens",
      budget = 120L, Seq(col("quality").desc, col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // web: 1 (cum 50), 2 (cum 110); 3 would hit 150 > 120 -> dropped
    // code: 5 (cum 30), 4 (cum 130 > 120) -> dropped
    assert(out.keySet == Set(1L, 2L, 5L))
    assert(out(2L) == 110L && out(5L) == 30L)
    // layout independence: same survivors from a different partitioning
    val re = Mixing.selectWithinTokenBudget(docs.repartition(7),
      "source", "n_tokens", budget = 120L,
      Seq(col("quality").desc, col("id")))
      .collect().map(_.getLong(0)).toSet
    assert(re == out.keySet)
  }

  test("weights must be positive and sum to 1") {
    intercept[IllegalArgumentException] {
      Mixing.mixFractions(Map("a" -> 1L), Map("a" -> 0.4, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Mixing.mixFractions(Map("a" -> 1L), Map("a" -> 1.5, "b" -> -0.5))
    }
  }

  private def waterfillRows(rows: (String, Long, Double)*) =
    rows.toSeq.toDF("source", "n_tokens", "weight")

  test("budgetWaterfill: no cap binds -> pure proportional split") {
    // caps 1000/1000 dwarf the budget: lambda = 300/1.0, allocs 225/75
    val out = Mixing.budgetWaterfill(
      waterfillRows(("a", 100L, 0.75), ("b", 100L, 0.25)),
      "source", "n_tokens", "weight", budget = 300L, maxEpochs = 10.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("alloc_tokens") === 225.0)
    assert(out("b").getAs[Double]("alloc_tokens") === 75.0)
    assert(out("a").getAs[Boolean]("capped") === false)
    assert(out("b").getAs[Boolean]("capped") === false)
    assert(out("a").getAs[Double]("lambda") === 300.0)
    assert(out("a").getAs[Double]("epochs") === 2.25)
  }

  test("budgetWaterfill: a binding cap redistributes to the rest") {
    // caps 20/200 (maxEpochs 2), T=100: unconstrained lambda 100 > r_a=40
    // -> a capped at 20, remaining 80 to b (lambda 160); sum == T
    val out = Mixing.budgetWaterfill(
      waterfillRows(("a", 10L, 0.5), ("b", 100L, 0.5)),
      "source", "n_tokens", "weight", budget = 100L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("alloc_tokens") === 20.0)
    assert(out("a").getAs[Boolean]("capped") === true)
    assert(out("a").getAs[Double]("epochs") === 2.0)
    assert(out("b").getAs[Double]("alloc_tokens") === 80.0)
    assert(out("b").getAs[Boolean]("capped") === false)
    assert(out("b").getAs[Double]("lambda") === 160.0)
    assert(out("a").getAs[Double]("alloc_tokens") +
      out("b").getAs[Double]("alloc_tokens") === 100.0)
  }

  test("budgetWaterfill: infeasible budget -> NULL lambda, all capped, " +
      "visible shortfall") {
    val out = Mixing.budgetWaterfill(
      waterfillRows(("a", 10L, 0.5), ("b", 100L, 0.5)),
      "source", "n_tokens", "weight", budget = 1000L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").isNullAt(out("a").fieldIndex("lambda")))
    assert(out("a").getAs[Double]("alloc_tokens") === 20.0)
    assert(out("b").getAs[Double]("alloc_tokens") === 200.0)
    assert(out.values.forall(_.getAs[Boolean]("capped")))
  }

  test("budgetWaterfill: empty source allocates zero with NULL epochs") {
    val out = Mixing.budgetWaterfill(
      waterfillRows(("a", 0L, 0.5), ("b", 100L, 0.5)),
      "source", "n_tokens", "weight", budget = 50L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("alloc_tokens") === 0.0)
    assert(out("a").isNullAt(out("a").fieldIndex("epochs")))
    assert(out("a").getAs[Boolean]("capped") === true) // r=0 <= lambda
    assert(out("b").getAs[Double]("alloc_tokens") === 50.0)
  }

  test("budgetWaterfill rejects a non-positive budget or ceiling") {
    intercept[IllegalArgumentException] {
      Mixing.budgetWaterfill(waterfillRows(("a", 1L, 1.0)),
        "source", "n_tokens", "weight", budget = 0L, maxEpochs = 2.0)
    }
    intercept[IllegalArgumentException] {
      Mixing.budgetWaterfill(waterfillRows(("a", 1L, 1.0)),
        "source", "n_tokens", "weight", budget = 10L, maxEpochs = 0.0)
    }
  }

  test("budgetWaterfill fails fast on a non-positive or NaN weight " +
      "instead of silently corrupting lambda") {
    // a negative weight sorts first in ratio order and inflates lambda
    // for every other source — the guard turns that into an error
    for (badW <- Seq(-0.2, 0.0, Double.NaN)) {
      val e = intercept[Exception] {
        Mixing.budgetWaterfill(
          waterfillRows(("a", 10L, badW), ("b", 100L, 0.5)),
          "source", "n_tokens", "weight", budget = 100L, maxEpochs = 2.0)
          .collect()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("weight must be a positive number"),
        s"weight=$badW raised: $e")
    }
  }
}
