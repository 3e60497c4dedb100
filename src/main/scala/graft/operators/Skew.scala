package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities.
  *
  * When salting pays (measured in `graft.SkewProbe`): hot-key SHUFFLE
  * JOINS where the build side can't broadcast and AQE's runtime skew
  * split doesn't apply — a 50%-hot key joins 2.9× faster salted, with
  * identical results. When it does NOT: algebraic aggregates (sum/count/
  * min/max), where Spark's map-side partial aggregation already combines
  * the hot key inside each scan partition and the shuffle carries only
  * ~(#partitions × #keys) rows — there `saltedSumCount` is redundant
  * (kept for non-combinable aggregation shapes, e.g. when the partial-agg
  * hash table is disabled or the aggregate buffers are too wide to
  * combine map-side).
  *
  * Both are pure plan rewrites — deterministic results, identical to the
  * unsalted equivalents (asserted in SkewSpec and SkewProbe).
  */
object Skew {

  /** Two-stage salted sum/count aggregate: stage 1 groups by
    * (keys, salt) — spreading each hot key over `numSalts` reducers —
    * stage 2 re-aggregates the partials by keys alone. The second shuffle
    * moves only `numSalts` rows per key. */
  /** Deterministic salt in [0, numSalts): hash of the key columns mixed
    * with the input partition id. Each scan partition's share of a hot
    * key gets one salt — map-side partial aggregation still combines
    * locally, while the shuffle spreads the key across reducers. No
    * `monotonically_increasing_id` (whose values — and crc32-of-them salt
    * quality — depended on partition layout); results are identical to
    * unsalted regardless of layout (SkewSpec). */
  private def saltOf(keys: Seq[String], numSalts: Int): Column =
    pmod(hash(keys.map(col) :+ spark_partition_id(): _*), lit(numSalts))

  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      numSalts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", saltOf(keys, numSalts))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol).cast("decimal(28,6)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right
    * side: left rows get a random salt in [0, numSalts); right rows are
    * replicated once per salt value; the join key becomes (key, salt), so
    * one hot key spreads across `numSalts` partitions. Inner-join
    * semantics preserved exactly. */
  def saltedJoin(
      skewedLeft: DataFrame,
      right: DataFrame,
      key: String,
      numSalts: Int = 16): DataFrame = {
    val salted = skewedLeft.withColumn("__salt",
      saltOf(Seq(key), numSalts).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Diagnostic: per-key row counts with share of total, descending —
    * the standard first look when a stage straggles. */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20)
      : DataFrame = {
    val counted = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val total = sum(col("n")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    counted.withColumn("share", col("n").cast("double") / total)
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
