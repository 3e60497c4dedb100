package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    // shard a: sizes 600, 600, 600, 600 → capacity 1000
    (1L, "a", 600L), (2L, "a", 600L), (3L, "a", 600L), (4L, "a", 600L),
    // shard b: one oversized doc
    (5L, "b", 1500L), (6L, "b", 100L)
  ).toDF("id", "shard", "n")

  test("docs land in the pack where their first token falls") {
    val out = Packing.assignPacks(docs, "shard", "id", "n", 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // shard a prefix sums before each doc: 0, 600, 1200, 1800
    assert(out(1L) == 0L && out(2L) == 0L)
    assert(out(3L) == 1L && out(4L) == 1L)
    // shard b: oversized doc starts pack 0; next doc starts at 1500 → pack 1
    assert(out(5L) == 0L && out(6L) == 1L)
  }

  test("tieCols pin peer order under duplicate orderCol values") {
    // priority is constant per shard → every row is a window peer; the
    // tiebreaker (id) must fully determine the layout
    val dup = Seq(
      (10L, "a", 1, 600L), (11L, "a", 1, 600L),
      (12L, "a", 1, 600L), (13L, "a", 1, 600L)
    ).toDF("id", "shard", "priority", "n")
    val out = Packing.assignPacks(dup, "shard", "priority", "n", 1000L,
      tieCols = Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    // layout = id ascending: prefix sums 0, 600, 1200, 1800
    assert(out(10L) == (0L, 0L) && out(11L) == (600L, 0L))
    assert(out(12L) == (1200L, 1L) && out(13L) == (1800L, 1L))
  }

  test("pack report totals preserve all tokens") {
    val assigned = Packing.assignPacks(docs, "shard", "id", "n", 1000L)
    val rep = Packing.packReport(assigned, "shard", "n", 1000L)
    val total = rep.agg(sum("n_tokens")).head().getLong(0)
    assert(total == 600L * 4 + 1500L + 100L)
    assert(rep.filter(col("utilization") > 0).count() == rep.count())
  }

  test("lengthSweep: hand-computed truncation and padding fractions") {
    // token counts 100, 300, 900 against candidates 256 and 1024
    val d = Seq(100L, 300L, 900L).toDF("nt")
    val out = Packing.lengthSweep(d, "nt", Seq(1024L, 256L))
      .collect().map(r => r.getLong(0) -> r).toMap
    val at256 = out(256L)
    assert(at256.getAs[Long]("n_docs") === 3L)
    assert(at256.getAs[Long]("n_truncated") === 2L) // 300 and 900
    assert(at256.getAs[Long]("tokens_total") === 1300L)
    assert(at256.getAs[Long]("tokens_kept") === 100L + 256L + 256L)
    // trunc loss = floor-ppm of 688/1300; pad = (768-612)/768 exact
    assert(at256.getAs[Double]("trunc_loss_frac") === 0.52923)
    assert(at256.getAs[Double]("pad_frac") === 0.203125)
    val at1024 = out(1024L)
    assert(at1024.getAs[Long]("n_truncated") === 0L)
    assert(at1024.getAs[Double]("trunc_loss_frac") === 0.0)
    // pad = floor-ppm of (3*1024 - 1300)/3072
    assert(at1024.getAs[Double]("pad_frac") === 0.576822)
    // rows come back sorted by max_len
    val order = Packing.lengthSweep(d, "nt", Seq(1024L, 256L))
      .collect().map(_.getLong(0)).toSeq
    assert(order === Seq(256L, 1024L))
  }

  test("lengthSweep: zero-token corpus and int64-overflow-scale " +
      "products stay defined") {
    // ADVICE r14: (a) an all-empty-token corpus made tokens_total 0 and
    // the integral DIV threw DIVIDE_BY_ZERO under ANSI — trunc_loss is
    // undefined there and now comes back NULL; pad_frac stays exact
    // (everything is padding).
    val empty = Seq(0L, 0L).toDF("nt")
    val z = Packing.lengthSweep(empty, "nt", Seq(128L)).collect().head
    assert(z.getAs[Long]("tokens_total") === 0L)
    assert(z.isNullAt(z.fieldIndex("trunc_loss_frac")))
    assert(z.getAs[Double]("pad_frac") === 1.0)
    // (b) n_docs·max_len used to multiply in BIGINT before the decimal
    // cast: with a candidate length near int64's edge the product
    // overflowed (ANSI: runtime error). The decimal product survives.
    val one = Seq(10L).toDF("nt")
    val big = Packing.lengthSweep(one, "nt", Seq(Long.MaxValue / 2))
      .collect().head
    // pad = floor-ppm of (L - 10)/L with L ~ 4.6e18 -> 0.999999
    assert(big.getAs[Double]("pad_frac") === 0.999999)
    assert(big.getAs[Double]("trunc_loss_frac") === 0.0)
  }
}
