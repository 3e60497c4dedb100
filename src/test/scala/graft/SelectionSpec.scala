package graft

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.Selection

/** DSIR importance weights: gram featurization pinned by hand, the full
  * log-ratio arithmetic replayed by an in-test reference model built on
  * the same portable md5 hash (so the expected values are exact, not
  * property-level). */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  test("gramRows: unigrams + adjacent bigrams, empty/null text handling") {
    val docs = Seq(
      (1L, "a b c"), (2L, "solo"), (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val inner = Selection.gramRows(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(inner.filter(_._1 == 1L).map(_._2).sorted.toSeq ===
      Seq("a", "a b", "b", "b c", "c"))
    assert(inner.filter(_._1 == 2L).map(_._2).toSeq === Seq("solo"))
    assert(!inner.exists(r => r._1 == 3L || r._1 == 4L))
    // outer: the token-less docs survive as one null-gram row each
    val outer = Selection.gramRows(docs, "id", "text", outer = true)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(outer.count(_._1 == 1L) === 5)
    assert(outer.filter(r => r._1 == 3L || r._1 == 4L).map(_._2).toSeq ===
      Seq(null, null))
  }

  /** Reference model: the exact DSIR arithmetic over explicit gram lists,
    * bucket hash shared with the operator via PortableHash.hash32. */
  private def refLogW(
      rawDocs: Map[Long, Seq[String]], tgtGrams: Seq[String],
      b: Int): Map[Long, Option[Double]] = {
    def bucketOf(g: String): Long =
      PortableHash.hash32(g.getBytes("UTF-8")) % b
    val rawCounts = rawDocs.values.flatten.toSeq.groupBy(bucketOf)
      .map { case (k, v) => k -> v.size.toLong }
    val tgtCounts = tgtGrams.groupBy(bucketOf)
      .map { case (k, v) => k -> v.size.toLong }
    val nr = rawCounts.values.sum
    val nt = tgtGrams.size.toLong
    def q10(x: Double): JBD =
      new JBD(x, MathContext.DECIMAL128).setScale(10, RoundingMode.HALF_UP)
    val lr: Map[Long, JBD] = rawCounts.map { case (bk, cr) =>
      val ct = tgtCounts.getOrElse(bk, 0L)
      val pt = (ct + 1).toDouble / (nt + b).toDouble
      val pr = (cr + 1).toDouble / (nr + b).toDouble
      bk -> q10(math.log(pt)).subtract(q10(math.log(pr)))
        .setScale(12, RoundingMode.HALF_UP)
    }
    rawDocs.map { case (id, grams) =>
      // round the exact DECIMAL sum to 6dp, THEN convert to double —
      // the operator's tie-free order (decimal-round-then-cast)
      id -> (if (grams.isEmpty) None
      else Some(grams.map(g => lr(bucketOf(g)))
        .reduce(_.add(_))
        .setScale(6, RoundingMode.HALF_UP).doubleValue()))
    }
  }

  private def grams(text: String): Seq[String] = {
    val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
  }

  test("importanceWeights matches the exact reference model") {
    val raw = Seq(
      (1L, "the quick fox"), (2L, "slow turtle walks slow"),
      (3L, "the quick quick fox"), (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val target = Seq("the quick fox jumps", "quick fox")
      .toDF("text")
    val b = 64
    val out = Selection.importanceWeights(raw, target, "doc_id", "text", b)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    val rawModel = Map(
      1L -> grams("the quick fox"), 2L -> grams("slow turtle walks slow"),
      3L -> grams("the quick quick fox"), 4L -> Seq.empty[String],
      5L -> Seq.empty[String])
    val tgtModel = grams("the quick fox jumps") ++ grams("quick fox")
    val expected = refLogW(rawModel, tgtModel, b)
    assert(out.keySet === rawModel.keySet, "one row per raw doc")
    rawModel.foreach { case (id, g) =>
      assert(out(id)._1 === g.size.toLong, s"n_grams of doc $id")
      assert(out(id)._2 === expected(id), s"log_w of doc $id")
    }
    // the target-like docs outscore the unrelated one
    assert(out(1L)._2.get > out(2L)._2.get)
    assert(out(3L)._2.get > out(2L)._2.get)
  }

  test("importanceWeights on real documents: target source scores highest " +
      "on average and every doc has a row") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val target = docs.filter(col("source") === "src13").select("text")
    val out = Selection.importanceWeights(docs, target, "doc_id", "text",
      numBuckets = 1024)
    assert(out.count() === docs.count())
    val bySrc = out.join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(avg(col("log_w")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val best = bySrc.maxBy(_._2)._1
    assert(best === "src13",
      s"target source should score highest, got $best: $bySrc")
  }
}
