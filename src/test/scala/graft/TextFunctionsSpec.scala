package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("tokens / tokenCount handle empties and whitespace runs") {
    assert(one(TF.tokenCount(col("text")), "a  b\tc\nd") == 4)
    assert(one(TF.tokenCount(col("text")), "") == 0)
    assert(one(TF.tokenCount(col("text")), "   ") == 0)
    assert(one(TF.tokenCount(col("text")), "Hello WORLD") == 2)
  }

  test("bpeTokenCount splits letters, digits, punctuation") {
    // "ab12,cd" -> [ab][1][2][,][cd]
    assert(one(TF.bpeTokenCount(col("text")), "ab12,cd") == 5)
  }

  test("langId picks marker-majority language, 'und' when no evidence") {
    assert(one(TF.langId(col("text")), "the cat and the dog is here") == "en")
    assert(one(TF.langId(col("text")), "der Hund und die Katze") == "de")
    assert(one(TF.langId(col("text")), "le chat est sur les toits") == "fr")
    assert(one(TF.langId(col("text")), "xyzzy qwerty") == "und")
    assert(one(TF.langId(col("text")), "这是了一个测试") == "zh")
  }

  test("fingerprint is whitespace/case invariant") {
    val a = one(TF.fingerprint(col("text")), "Hello   World")
    val b = one(TF.fingerprint(col("text")), "hello world ")
    assert(a == b)
  }

  test("shingles produce distinct n-grams; short text -> empty") {
    val sh = one(TF.shingles(col("text"), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh == Seq("a b c", "b c d"))
    assert(one(TF.shingles(col("text"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
    val ch = one(TF.charShingles(col("text"), 2), "abc")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(ch == Seq("ab", "bc"))
  }

  test("normalizeUnicode folds decomposed accents; redact scrubs PII") {
    // "\u00e9" composed vs "e" + combining acute (U+0301)
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    assert(composed != decomposed)
    val a = one(TF.normalizeUnicode(col("text")), composed)
    val b = one(TF.normalizeUnicode(col("text")), decomposed)
    assert(a == b)
    val red = one(TF.redact(col("text")),
      "see https://example.com/x?a=1 or mail bob@test.org today")
    assert(red == "see <URL> or mail <EMAIL> today")
    val ctl = one(TF.stripControlChars(col("text")), "a\u0000b\tc")
    assert(ctl == "ab\tc") // tab survives, NUL stripped
  }

  test("qualityScore within [0,1] and penalizes short docs") {
    val short = one(TF.qualityScore(col("text")), "hi").asInstanceOf[Double]
    val good = one(TF.qualityScore(col("text")),
      "a decent length document with several distinct words here")
      .asInstanceOf[Double]
    assert(short < good && good <= 1.0 && short >= 0.0)
  }

  test("luhnValid: canonical card numbers, off-by-one rejected") {
    def luhn(s: String): Boolean =
      one(TF.luhnValid(col("text")), s).asInstanceOf[Boolean]
    assert(luhn("4111111111111111"))  // canonical Visa test number
    assert(!luhn("4111111111111112"))
    assert(luhn("79927398713"))       // the textbook Luhn example
    assert(!luhn("79927398714"))
  }

  test("piiCounts: emails, IPv4s, card runs and their Luhn subset") {
    val r = one(TF.piiCounts(col("text")),
      "mail a@b.org and c.d@e-f.co from 192.168.0.1; " +
        "cards 4111111111111111 and 4111111111111112 end")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(r.getAs[Long]("n_email") === 2L)
    assert(r.getAs[Long]("n_ipv4") === 1L)
    assert(r.getAs[Long]("n_card") === 2L)
    assert(r.getAs[Long]("n_card_valid") === 1L)
    // short digit runs are not card candidates
    val none = one(TF.piiCounts(col("text")), "call 555 0100 now")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(none.getAs[Long]("n_card") === 0L)
  }

  test("scriptCounts: exact per-class counts, whitespace excluded") {
    val r = one(TF.scriptCounts(col("text")), "abc Привет 中文 42 é!")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(r.getAs[Long]("n_latin") === 4L)    // a b c é
    assert(r.getAs[Long]("n_cyrillic") === 6L) // Привет
    assert(r.getAs[Long]("n_cjk") === 2L)
    assert(r.getAs[Long]("n_digit") === 2L)
    assert(r.getAs[Long]("n_greek") === 0L)
    assert(r.getAs[Long]("n_chars") === 15L)   // incl. '!' (other)
  }

  test("dominantScript: majority wins, declaration order breaks ties") {
    assert(one(TF.dominantScript(col("text")), "Привет мир ok") == "cyrillic")
    assert(one(TF.dominantScript(col("text")), "中文数据") == "cjk")
    assert(one(TF.dominantScript(col("text")), "!!!") == "other")
    // 2 latin vs 2 digit: latin is declared first
    assert(one(TF.dominantScript(col("text")), "ab 12") == "latin")
  }
}
