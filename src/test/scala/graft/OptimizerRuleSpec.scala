package graft

import org.apache.spark.sql.functions._
import graft.plans.BoundedEditDistanceRule

class OptimizerRuleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val names = Seq(
    "spark", "spank", "sparkle", "spork", "fli", "flink", "flank",
    "completely-different-string").toDF("n")

  test("levenshtein <= k predicates rewrite to the banded 3-arg form") {
    val q = names.as("a").crossJoin(names.as("b"))
      .filter(levenshtein(col("a.n"), col("b.n")) <= 2)
    val optimized = q.queryExecution.optimizedPlan
    val s = optimized.toString
    assert(s.contains("levenshtein") && s.contains("Some(2)"),
      s"expected banded levenshtein in:\n$s")
    assert(s.contains("length"), s"expected length prefilter in:\n$s")
    // idempotent: a second application changes nothing
    assert(BoundedEditDistanceRule(optimized) == optimized)
  }

  test("rewritten predicate returns exactly the original matches") {
    def editDistance(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val local = names.collect().map(_.getString(0))
    for ((op, pred) <- Seq[(String, (Int, Int) => Boolean)](
      ("<=", _ <= _), ("<", _ < _), ("==", _ == _))) {
      val expected = (for (a <- local; b <- local
        if pred(editDistance(a, b), 2)) yield (a, b)).sorted.toSeq
      val cond = op match {
        case "<=" => levenshtein(col("a.n"), col("b.n")) <= 2
        case "<" => levenshtein(col("a.n"), col("b.n")) < 2
        case "==" => levenshtein(col("a.n"), col("b.n")) === 2
      }
      val got = names.as("a").crossJoin(names.as("b")).filter(cond)
        .select(col("a.n"), col("b.n"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(got == expected, s"mismatch for op $op")
    }
  }

  test("null inputs stay filtered out after the rewrite") {
    val withNull = Seq(Some("abc"), None, Some("abd")).toDF("n")
    val got = withNull.as("a").crossJoin(withNull.as("b"))
      .filter(levenshtein(col("a.n"), col("b.n")) <= 1)
      .count()
    assert(got == 4) // only the 2x2 non-null pairs match
  }
}
