package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalizes the `events.ts` column across test-fixture generations.
  *
  * The physical parquet type of `ts` has changed between data drops:
  * earlier fixtures wrote TIMESTAMP(NANOS), which Spark can only read as
  * an epoch-nanoseconds long (`spark.sql.legacy.parquet.nanosAsLong`);
  * current fixtures write `timestamp[us]` (no timezone), which Spark
  * reads as TIMESTAMP_NTZ by default. Every events-time consumer
  * normalizes through these helpers, dispatching on the ACTUAL column
  * type, so either fixture shape — and a future regeneration to a
  * tz-adjusted TIMESTAMP — degrades gracefully instead of crashing
  * analysis.
  *
  * Contract: a LongType `ts` is epoch NANOseconds. All entry-point
  * sessions run with `spark.sql.session.timeZone=UTC`, so a
  * TIMESTAMP_NTZ wall clock IS the epoch instant — matching DuckDB's
  * `epoch_us(ts)` on the same naive column exactly. Epoch MICROseconds
  * is the engine-wide shared tick (both engines are exact there); the
  * nanos fixtures' sub-microsecond digits were always zero.
  */
object EventTime {

  /** `ts` as a native TimestampType column (µs-precision epoch instant),
    * whatever the fixture generation produced. */
  def tsTimestamp(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType => timestamp_micros(expr(s"$c DIV 1000"))
      case _: TimestampNTZType => col(c).cast(TimestampType)
      case _: TimestampType => col(c)
      case dt => throw new IllegalArgumentException(
        s"events ts column '$c' has unsupported type $dt " +
          "(expected epoch-ns long, TIMESTAMP, or TIMESTAMP_NTZ)")
    }

  /** `ts` as an epoch-MICROseconds long — the shared exact precision
    * with DuckDB's `epoch_us(ts)`; integer ticks, no float time math. */
  def tsMicros(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType => expr(s"$c DIV 1000")
      case _ => unix_micros(tsTimestamp(df, c))
    }
}
