package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims

import graft.functions.{CountMinCounters, PortableHash}

/** Count-Min sketch operators: build one `depth × width` counter table
  * over a key column in a single aggregate pass (a few KB of state and
  * shuffle however many rows flow through — see
  * [[graft.functions.CountMinCounters]]), then answer point-frequency
  * queries from the broadcast sketch with a MIN over `depth` counters.
  *
  * Because the aggregate's counters are order-independent sums over the
  * [[graft.functions.PortableHash]] family, estimates are deterministic
  * and exactly replayable in oracle SQL — the rare sketch whose VALUES
  * (not just error bounds) can be verified cross-engine.
  */
object CountMinSketchOps {

  /** The sketch aggregate as a [[Column]]: array of depth·width longs. */
  def cmsAggregate(
      key: Column, depth: Int, width: Int, seed: Long = 43L): Column =
    Shims.column(CountMinCounters(Shims.expression(key), depth, width, seed)
      .toAggregateExpression())

  /** Point estimate for `key` from a sketch column: min over the depth
    * counters the key hashes to. Pure codegen'd column math (md5 + the
    * affine family + element_at) — usable map-side against a broadcast
    * one-row sketch. */
  def cmsEstimate(
      sketch: Column, key: Column,
      depth: Int, width: Int, seed: Long = 43L): Column = {
    val h = PortableHash.md5Prefix(key.cast("string"), 8)
    PortableHash.coefficients(depth, seed).zipWithIndex.map {
      case ((a, b), i) =>
        element_at(sketch,
          (lit(i.toLong * width) +
            (lit(a) * h + lit(b)) % lit(PortableHash.prime) % lit(width) +
            lit(1L)).cast("int"))
    }.reduce((x, y) => least(x, y))
  }

  /** Estimated frequency of every row of `probes(probeCol)` against the
    * sketch of `df(keyCol)`: ONE pass over `df` (the aggregate), then a
    * broadcast of the single-row sketch onto the probe side — `df` is
    * never shuffled by key. */
  def estimateCounts(
      df: DataFrame, keyCol: String,
      probes: DataFrame, probeCol: String,
      depth: Int = 4, width: Int = 1024, seed: Long = 43L): DataFrame = {
    val sk = df.agg(cmsAggregate(col(keyCol), depth, width, seed).as("__sk"))
    probes.join(broadcast(sk))
      .withColumn("est",
        cmsEstimate(col("__sk"), col(probeCol), depth, width, seed))
      .drop("__sk")
  }
}
