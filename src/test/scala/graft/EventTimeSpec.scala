package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.EventTime

/** The fixture contract EventTime protects: the same instants must
  * normalize to identical µs ticks and identical timestamps whether the
  * events table carries epoch-ns longs (older parquet drops, read via
  * nanosAsLong) or native timestamp[us]/TIMESTAMP_NTZ (current drops). */
class EventTimeSpec extends SparkTestBase {
  import spark.implicits._

  private val instantsUs = Seq(
    0L, 1L, 999999L, 1000000L, 3600L * 1000000L,
    1699999999123456L) // µs-precision epoch instants

  test("long-ns and timestamp[us] arms agree on tsMicros and tsTimestamp") {
    val longDf = instantsUs.map(_ * 1000L).toDF("ts") // epoch ns
    val tsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(instantsUs.map(us =>
        org.apache.spark.sql.Row(java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, ((us % 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)))),
      StructType(Seq(StructField("ts", TimestampNTZType))))

    val fromLong = longDf.select(
      EventTime.tsMicros(longDf).as("us"),
      EventTime.tsTimestamp(longDf).as("t")).collect()
    val fromTs = tsDf.select(
      EventTime.tsMicros(tsDf).as("us"),
      EventTime.tsTimestamp(tsDf).as("t")).collect()

    assert(fromLong.map(_.getLong(0)).toSeq == instantsUs)
    assert(fromTs.map(_.getLong(0)).toSeq == instantsUs)
    assert(fromLong.map(_.getTimestamp(1)).toSeq ==
      fromTs.map(_.getTimestamp(1)).toSeq)
  }

  test("TimestampType passes through; unsupported types fail fast") {
    val tzDf = Seq(java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(42L))).toDF("ts")
    assert(tzDf.select(EventTime.tsMicros(tzDf)).head().getLong(0) ==
      42000000L)
    val strDf = Seq("2023-01-01").toDF("ts")
    intercept[IllegalArgumentException] {
      EventTime.tsTimestamp(strDf)
    }
  }

  test("sub-ns truncation matches the engines' shared µs tick") {
    // a ns value with live sub-µs digits truncates toward zero (DIV)
    val df = Seq(1000000123456789L).toDF("ts")
    assert(df.select(EventTime.tsMicros(df)).head().getLong(0) ==
      1000000123456L)
  }
}
