package graft

import graft.operators.LangModel
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  test("train: hand-checkable counts, top-V cut, <unk> mass") {
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b rare")).toDF("doc_id", "text")
    val m = LangModel.train(docs, "text", vocabSize = 2)
    assert(m.nTokens === 8L)
    val uni = m.unigrams.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // top-2 by (count desc, token asc): a=3, b=3; c+rare fold to <unk>
    assert(uni === Map("a" -> 3L, "b" -> 3L, LangModel.Unk -> 2L))
    val big = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1 sym stream: a b a b <unk>; doc2: a b <unk>
    assert(big(("a", "b")) === 3L)
    assert(big(("b", "a")) === 1L)
    assert(big(("b", LangModel.Unk)) === 2L)
    assert(big.values.sum === 6L) // 4 + 2 adjacent pairs
  }

  test("scoreDocs: hand-computed interpolated log-prob") {
    val docs = Seq((1L, "a a")).toDF("doc_id", "text")
    val m = LangModel.train(docs, "text", vocabSize = 1)
    // N=2, V=1 (alphabet {a, <unk>} -> denom +2): c1(a)=2, c2(a,a)=1
    val got = LangModel.scoreDocs(docs, "doc_id", "text", m,
      lambda = 0.75).head()
    val lp = math.log(0.75 * ((1.0 + 1) / (2 + 2)) +
      0.25 * ((2.0 + 1) / (2 + 2)))
    assert(got.getLong(1) === 1L) // one bigram position
    assert(math.abs(got.getDouble(2) -
      BigDecimal(BigDecimal(lp).setScale(10,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("corpus-typical text scores lower perplexity than rare text") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val m = LangModel.train(docs, "text", vocabSize = 64)
    val probe = Seq(
      (9000001L, "table join hash row scan batch window group order"),
      (9000002L, "xylophone quixotic zephyr bandersnatch vorpal jabberwock " +
        "galumphing frabjous")).toDF("doc_id", "text")
    val got = LangModel.scoreDocs(probe, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(9000001L) < got(9000002L),
      s"typical ${got(9000001L)} !< rare ${got(9000002L)}")
  }

  test("documents under 2 tokens keep a row with n_scored = 0") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val m = LangModel.train(train, "text", vocabSize = 4)
    val probe = Seq((1L, "a b a"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val got = LangModel.scoreDocs(probe, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.isNullAt(2)))).toMap
    assert(got(1L)._1 === 2L && !got(1L)._2)
    assert(got(2L) === ((0L, true)))
    assert(got(3L) === ((0L, true)))
  }

  test("scores are layout-independent (decimal-summed partials)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(100)
    val m = LangModel.train(docs, "text", vocabSize = 32)
    def run(d: org.apache.spark.sql.DataFrame) =
      LangModel.scoreDocs(d, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) 0.0 else r.getDouble(2))))
        .toMap
    assert(run(docs) === run(docs.repartition(7)))
  }
}
