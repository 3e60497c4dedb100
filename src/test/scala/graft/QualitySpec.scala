package graft

import graft.operators.Quality
import graft.operators.Quality._

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 5.0, "click"),
    (2L, None, 15.0, "view"),
    (2L, Some("c"), -1.0, "bogus")
  ).toDF("id", "name", "v", "kind")

  test("single-pass scalar rules count violations correctly") {
    val results = Quality.check(df, Seq(
      NotNull("name"), // 1 violation
      InRange("v", 0, 10), // 2 violations (15, -1)
      AcceptedValues("kind", Seq("click", "view")), // 1
      MatchesRegex("kind", "^[a-z]+$"), // 0
      Unique(Seq("id")))) // 1 dup
    val byName = results.map(r => r.rule -> r.violations).toMap
    assert(byName("not_null(name)") == 1)
    assert(byName("in_range(v,[0.0,10.0])") == 2)
    assert(byName("accepted_values(kind)") == 1)
    assert(byName("matches_regex(kind)") == 0)
    assert(byName("unique(id)") == 1)
  }

  test("enforce throws a readable gate error; passes on clean data") {
    val e = intercept[IllegalStateException] {
      Quality.enforce(df, Seq(NotNull("name")))
    }
    assert(e.getMessage.contains("not_null(name)"))
    Quality.enforce(df, Seq(NotNull("id"), Unique(Seq("id", "name"))))
  }

  test("foreign-key rule counts orphans; null keys are not violations") {
    val facts = Seq(
      (1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)), // 99 = orphan
      (4L, None) // null key: not an FK violation (that's NotNull's job)
    ).toDF("id", "dim_id")
    val dim = Seq((10L, "x"), (20L, "y"), (20L, "y2")) // dup dim keys ok
      .toDF("d_id", "payload")
    val results = Quality.check(facts, Seq(
      NotNull("dim_id"),
      ForeignKey(Seq("dim_id"), dim, Seq("d_id"), "dim")))
    val byName = results.map(r => r.rule -> r.violations).toMap
    assert(byName("foreign_key(dim_id->dim)") == 1)
    assert(byName("not_null(dim_id)") == 1)
    // frame form unions scalar + FK rows with consistent schema
    val frame = Quality.checkAsFrame(facts, Seq(
      NotNull("id"),
      ForeignKey(Seq("dim_id"), dim, Seq("d_id"), "dim")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(frame("not_null(id)") == ((0L, true)))
    assert(frame("foreign_key(dim_id->dim)") == ((1L, false)))
    // FK-only suite (no scalar aggregate pass at all)
    val only = Quality.checkAsFrame(facts,
      Seq(ForeignKey(Seq("dim_id"), dim, Seq("d_id"), "dim")))
    assert(only.count() == 1)
  }

  test("observed counters ride the existing action — no second scan") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val observed = Quality.withCounters(orders, "ingest", Map(
      "n_rows" -> org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      "null_cust" -> org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("o_custkey").isNull, 1L)
          .otherwise(0L))))
    // the caller's own action — must execute THIS frame's plan
    // (count() would build a derived aggregate plan; see observedValues)
    val n = observed.collect().length.toLong
    val vals = Quality.observedValues(observed, "ingest")
    assert(vals("n_rows") == n)
    assert(vals("null_cust") == 0L)
    // one scan total: the observe node adds no exchange and no extra job
    val m = PlanMetrics.shuffleSummary(
      Quality.withCounters(orders.select("o_orderkey"), "x",
        Map("n" -> org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))))
    assert(m.exchanges == 0)
  }

  test("testdata tables pass their natural constraints") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    Quality.enforce(orders, Seq(
      NotNull("o_orderkey"), Unique(Seq("o_orderkey")),
      AcceptedValues("o_orderstatus", Seq("F", "O", "P")),
      InRange("o_totalprice", 0, 1e7)))
  }
}
