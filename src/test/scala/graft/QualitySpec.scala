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

  test("testdata tables pass their natural constraints") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    Quality.enforce(orders, Seq(
      NotNull("o_orderkey"), Unique(Seq("o_orderkey")),
      AcceptedValues("o_orderstatus", Seq("F", "O", "P")),
      InRange("o_totalprice", 0, 1e7)))
  }
}
