package graft

import graft.operators.Zipf

class ZipfSpec extends SparkTestBase {
  import spark.implicits._

  test("exact Zipf corpus recovers slope -1 (freq = C/rank)") {
    // token t_r appears 120/r times: ln(freq) = ln(120) - 1*ln(rank)
    val words = (1 to 8).flatMap(r => Seq.fill(120 / r)(s"tok$r"))
    val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val row = Zipf.fit(docs, "text", topK = 8).collect().head
    assert(row.getAs[Long]("n_tokens") === 8L)
    // 120/r truncates (120/7=17, not 17.14): slope near -1, not exact
    assert(math.abs(row.getAs[Double]("slope") + 1.0) < 0.01)
    assert(row.getAs[Double]("r2") > 0.999)
  }

  test("uniform frequencies give slope 0") {
    val words = (1 to 6).flatMap(r => Seq.fill(10)(s"w$r"))
    val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val row = Zipf.fit(docs, "text", topK = 6).collect().head
    assert(row.getAs[Double]("slope") === 0.0)
  }

  test("n_tokens = min(topK, vocabulary); result is partition-invariant") {
    val docs = (1 to 64).map(i =>
      s"alpha beta beta gamma gamma gamma delta${i % 4}").toDF("text")
    val one = Zipf.fit(docs.coalesce(1), "text", topK = 100).collect().head
    val many = Zipf.fit(docs.repartition(13), "text", topK = 100)
      .collect().head
    assert(one === many) // decimal-exact sums: layout-independent
    assert(one.getAs[Long]("n_tokens") === 7L) // 3 + 4 distinct deltas
  }

  test("topK < 2 rejected") {
    val docs = Seq(Tuple1("a b c")).toDF("text")
    intercept[IllegalArgumentException](Zipf.fit(docs, "text", topK = 1))
  }
}
