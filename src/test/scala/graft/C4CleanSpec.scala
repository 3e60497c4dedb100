package graft

import graft.operators.C4Clean
import org.apache.spark.sql.functions._

class C4CleanSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    // kept: 3 terminal-punct lines of >=3 words; 1 short line dropped
    (1L, "This line is long enough.\nShort one.\nIs this kept too?\nno punct line"),
    // dropped: page gate — contains '{'
    (2L, "A fine sentence here.\nfunction f() { return 1; }\nAnother fine one."),
    // dropped: page gate — lorem ipsum (case-insensitive)
    (3L, "Lorem Ipsum dolor sit amet.\nAnother good sentence here."),
    // dropped: only 1 kept line (< minKeptLines=2)
    (4L, "Only this one survives cleanly.\ntoo short.\nno terminal punct"),
    // line gate: 'javascript' mention drops the line, page then dies
    (5L, "Please enable JavaScript to view this.\nEnable javascript now please."),
    // kept: quote-terminated counts as terminal punctuation
    (6L, "He said it was \"done.\"\nShe agreed with that fully!")
  ).toDF("doc_id", "text")

  test("line and page gates: C4 battery keeps/drops the documented cases") {
    val out = C4Clean.clean(docs, "doc_id", "text",
        minLineWords = 3, minKeptLines = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(1L, 6L))
    // doc 1: 4 lines, 2 kept (>=3 words + terminal punct): line 1 and 3;
    // "Short one." has 2 words < minLineWords=3
    assert(out(1L)._1 === "This line is long enough.\nIs this kept too?")
    assert(out(1L)._2 === 4L) // n_lines counts the original lines
    assert(out(1L)._3 === 2L)
    assert(out(6L)._1 === "He said it was \"done.\"\nShe agreed with that fully!")
  }

  test("order restored after the groupBy rebuild (many lines)") {
    val text = (1 to 40).map(i => s"Sentence number $i is definitely long enough.")
      .mkString("\n")
    val out = C4Clean.clean(Seq((9L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === text) // all kept, original order
    assert(out.head.getLong(3) === 40L)
  }

  test("empty input and all-dropped input both yield empty output") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(C4Clean.clean(empty, "doc_id", "text").count() === 0L)
    val junk = Seq((1L, "no punctuation anywhere at all")).toDF("doc_id", "text")
    assert(C4Clean.clean(junk, "doc_id", "text").count() === 0L)
  }

  test("lineKept predicate matches a DuckDB-parity re-derivation") {
    // the q153 parity hinges on rlike/regexp_count agreeing with the
    // oracle's regexp_matches/regexp_extract_all; pin the Spark side
    val lines = Seq("Ends with period.", "Ends with bang!", "short.",
      "trailing space after dot.   ", "javascript is Mentioned here.",
      "no terminal punctuation at all")
    val got = lines.toDF("line")
      .filter(C4Clean.lineKept(col("line"), minLineWords = 3))
      .as[String].collect().toSet
    assert(got === Set("Ends with period.", "Ends with bang!",
      "trailing space after dot.   "))
  }
}
