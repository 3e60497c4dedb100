package graft

import graft.operators.GopherRules
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, id: Long): Row =
    df.filter(col("doc_id") === id).collect().head

  test("a clean English paragraph passes every flag") {
    val text = ("the quick brown fox jumps over that lazy dog and " +
      "everyone would have agreed with such a fine outcome indeed ") * 3
    val out = GopherRules.score(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", minWords = 10)
    val r = row(out, 1L)
    assert(r.getAs[Boolean]("passes"))
    assert(r.getAs[Int]("stopword_hits") >= 2)
    assert(r.getAs[Long]("n_words") === 60L)
  }

  test("each gate fails for its targeted pathology") {
    val docs = Seq(
      // too few words
      (1L, "the and that have with be to of"),
      // symbol flood: '#' on most words
      (2L, ("# the # and # that # have # with " * 6)),
      // bullet lines > 90%
      (3L, (1 to 10).map(i => s"- the item $i and that").mkString("\n")),
      // ellipsis endings > 30% of lines
      (4L, "the first line and that have...\nsecond with more...\nthe third one is fine here and that have with be of the end"),
      // alphabetic share < 80%: digit runs count as words
      (5L, ("the 111 222 333 444 and that have with 555 666 777 888 999 " * 3)),
      // no required stop words
      (6L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3)),
      // mean word length out of [3,10]
      (7L, ("aa bb cc dd ee ff gg hh ii jj " * 4) + "the and that")
    ).toDF("doc_id", "text")
    val out = GopherRules.score(docs, "doc_id", "text", minWords = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out(1L).getAs[Boolean]("word_count_ok"))
    assert(!out(2L).getAs[Boolean]("symbol_ok"))
    assert(!out(3L).getAs[Boolean]("bullet_ok"))
    assert(!out(4L).getAs[Boolean]("ellipsis_ok"))
    assert(!out(5L).getAs[Boolean]("alpha_ok"))
    assert(!out(6L).getAs[Boolean]("stopword_ok"))
    assert(!out(7L).getAs[Boolean]("mean_word_len_ok"))
    assert(out.values.forall(r => !r.getAs[Boolean]("passes")))
  }

  test("stop-word match is plain-token: punctuation-attached misses") {
    // 'the,' and 'and.' are not ' the ' / ' and ' tokens
    val out = GopherRules.score(
      Seq((1L, "the, and. that, have. with, nothing matches here"))
        .toDF("doc_id", "text"), "doc_id", "text", minWords = 1)
    assert(row(out, 1L).getAs[Int]("stopword_hits") === 0)
  }

  test("gate returns the original rows of passing docs only") {
    val ok = "the quick brown fox jumps over that lazy dog and " +
      "everyone would have agreed with such a fine outcome indeed"
    val docs = Seq((1L, ok, "keep"), (2L, "tiny", "drop"))
      .toDF("doc_id", "text", "tag")
    val out = GopherRules.gate(docs, "doc_id", "text", minWords = 10)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L))
    assert(out.head.getAs[String]("tag") === "keep") // columns intact
  }

  test("flags are integer-exact: boundary cases land deterministically") {
    // exactly 10 words with exactly 1 symbol hit: 1*10 <= 10 → ok
    val boundary = "the and that have with be to of gg #"
    val r = row(GopherRules.score(
      Seq((1L, boundary)).toDF("doc_id", "text"),
      "doc_id", "text", minWords = 10), 1L)
    assert(r.getAs[Long]("n_words") === 10L)
    assert(r.getAs[Boolean]("word_count_ok"))
    assert(r.getAs[Boolean]("symbol_ok"))
  }
}
