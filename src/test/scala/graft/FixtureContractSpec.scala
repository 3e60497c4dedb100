package graft

import org.apache.spark.sql.types._

/** Canary for the NEXT fixture regeneration: asserts the Spark-visible
  * type of every column the engine DISPATCHES or arithmetics on, so a
  * driver-side physical-type flip fails as ONE named assertion with a
  * remediation message instead of a dozen red operator suites.
  *
  * History: `events.ts` has already flipped physical type twice across
  * fixture drops — TIMESTAMP(NANOS) (readable only as an epoch-ns long
  * via `spark.sql.legacy.parquet.nanosAsLong`) and then native
  * timestamp[us] (TIMESTAMP_NTZ). `operators/EventTime` dispatches on
  * the ACTUAL type, so both shapes work; this spec exists to catch a
  * THIRD shape (e.g. int96, tz-less date, string) the dispatcher does
  * not cover, at the contract level where the fix belongs.
  */
class FixtureContractSpec extends SparkTestBase {

  private def schemaOf(table: String) =
    spark.read.parquet(s"$sf001/$table.parquet").schema

  private def assertType(table: String, column: String,
      accepted: Set[DataType], why: String): Unit = {
    val schema = schemaOf(table)
    val field = schema.find(_.name == column).getOrElse(
      fail(s"fixture contract: $table.parquet lost column '$column' " +
        s"(schema is now ${schema.map(_.name).mkString(", ")}) — $why"))
    assert(accepted.contains(field.dataType),
      s"fixture contract: $table.$column is now ${field.dataType}, " +
        s"accepted: ${accepted.mkString(" | ")}. $why")
  }

  test("events.ts stays within EventTime's dispatch set") {
    // The one column with a cross-round flip history. If this fails,
    // extend operators/EventTime.tsTimestamp/tsMicros with the new
    // shape FIRST — every events-time operator (sessionize, rollups,
    // retention, as-of, SCD2, PSI series, streaming) and the generated
    // DuckDB oracles key on that single dispatch point.
    assertType("events", "ts",
      Set(LongType, TimestampNTZType, TimestampType),
      "Remediation: add the new physical shape to " +
        "graft.operators.EventTime (the only place that may read ts " +
        "raw), keeping epoch-MICROsecond ticks as the engine-wide " +
        "shared precision with DuckDB epoch_us().")
  }

  test("integer key/measure columns keep their width class") {
    // Hash families (md5 of CAST(key AS STRING)), split buckets, and
    // generated oracle SQL all render keys through text — a silent
    // long→double flip would change every rendered value.
    for ((t, c) <- Seq(
      "orders" -> "o_orderkey", "orders" -> "o_custkey",
      "lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
      "customer" -> "c_custkey", "part" -> "p_partkey",
      "documents" -> "doc_id", "documents" -> "n_chars",
      "events" -> "event_id", "events" -> "user_id",
      "embeddings" -> "vec_id"))
      assertType(t, c, Set(LongType, IntegerType),
        "Integral keys feed md5-bucket sampling, surrogate keys, and " +
          "oracle text rendering; a fractional type breaks value-level " +
          "hash parity.")
  }

  test("text and embedding payloads keep their contract types") {
    assertType("documents", "text", Set(StringType),
      "Every shingle/token/hash chain consumes raw UTF-8 text.")
    assertType("embeddings", "embedding",
      Set(ArrayType(FloatType, true), ArrayType(FloatType, false)),
      "ANN kernels (CosineSimilarity codegen, IVF/PQ) are compiled " +
        "against array<float>; a double[] flip silently changes " +
        "distance rounding vs the DuckDB oracles.")
    assertType("events", "value", Set(DoubleType),
      "Windowed sums aggregate value through DECIMAL(18,6) for oracle " +
        "parity — a decimal/float source changes the rounding contract.")
  }

  test("date-ish columns the oracles compare stay timestamp-typed") {
    for ((t, c) <- Seq("orders" -> "o_orderdate",
        "lineitem" -> "l_shipdate"))
      assertType(t, c, Set(TimestampType, TimestampNTZType, DateType),
        "Date filters/windows are written engine-portably over these; " +
          "an epoch-int flip needs an EventTime-style dispatch shim.")
  }
}
