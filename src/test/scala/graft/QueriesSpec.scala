package graft

/** Smoke: every declared query runs on sf0.001; contract invariants. */
class QueriesSpec extends SparkTestBase {

  test("oracle keys are a subset of query keys") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracles: ${ok -- qk}")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and is deterministic-schema on sf0.001") {
      val df = fn(spark, sf001)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length,
        "duplicate column names break the oracle compare")
      // compare-safety invariant: outputs must be atomic-typed — arrays,
      // maps, and structs don't hash-compare portably across engines
      df.schema.fields.foreach { f =>
        assert(!f.dataType.typeName.matches("array|map|struct"),
          s"non-atomic output column ${f.name}: ${f.dataType.sql}")
      }
    }
  }
}
