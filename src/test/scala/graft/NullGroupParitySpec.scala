package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Meta-tests: the NullGroupParity helper must CATCH the failure
  * shapes it exists for (the round-17 null-join sweep's bug classes),
  * not just pass on healthy operators — a parity helper that can't
  * fail is worse than none. */
class NullGroupParitySpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq((1L, "a", 10.0), (2L, "a", 20.0),
    (3L, "b", 5.0)).toDF("id", "g", "v")

  private def sig(half: DataFrame): Seq[String] =
    half.select("v", "tot").collect().map(_.toString).toSeq

  test("a null-REJECTING join is caught (the dropped-rows bug class)") {
    // per-group totals re-attached via a plain === join: the null
    // twin's rows silently vanish — balanceKeepWindow's round-17 bug
    def broken(df: DataFrame): DataFrame = {
      val totals = df.groupBy(col("g").as("__tg"))
        .agg(sum(col("v")).as("tot"))
      df.join(totals, col("g") === col("__tg")).drop("__tg")
    }
    val e = intercept[AssertionError] {
      NullGroupParity.assertParity(base, "g", "a", broken, sig,
        idCol = Some("id"))
    }
    assert(e.getMessage.contains("null-group parity violated"))
  }

  test("a zeroing default over a null-rejected left join is caught " +
      "(the WRONG-row bug class)") {
    // the Drift.psiSeries round-17 shape: the row survives but its
    // joined-in aggregate null-rejects and a coalesce papers it to 0
    def broken(df: DataFrame): DataFrame = {
      val totals = df.groupBy(col("g").as("__tg"))
        .agg(sum(col("v")).as("__t"))
      df.join(totals, col("g") === col("__tg"), "left")
        .withColumn("tot", coalesce(col("__t"), lit(0.0)))
        .drop("__tg", "__t")
    }
    val e = intercept[AssertionError] {
      NullGroupParity.assertParity(base, "g", "a", broken, sig,
        idCol = Some("id"))
    }
    assert(e.getMessage.contains("null-group parity violated"))
  }

  test("the non-null surrogate-key fix passes the same check") {
    // the shipped recipe: join on the "v"-prefix surrogate — null-safe
    // group equality that stays a broadcastable hash-equi-join
    def fixed(df: DataFrame): DataFrame = {
      val k = coalesce(concat(lit("v"), col("g").cast("string")), lit(""))
      val totals = df.groupBy(k.as("__tg")).agg(sum(col("v")).as("tot"))
      df.withColumn("__k", k)
        .join(totals, col("__k") === col("__tg")).drop("__tg", "__k")
    }
    NullGroupParity.assertParity(base, "g", "a", fixed, sig,
      idCol = Some("id"))
  }

  test("an empty named-group output fails loudly as a fixture error, " +
      "not a silent pass") {
    // if the op (or a wrong twinValue) produces no named rows, both
    // sides would be empty and empty == empty would 'pass' — the
    // helper must refuse instead
    val e = intercept[AssertionError] {
      NullGroupParity.assertParity(base, "g", "ZZZ",
        df => df.withColumn("tot", col("v")), sig, idCol = Some("id"))
    }
    assert(e.getMessage.contains("never"))
  }
}
