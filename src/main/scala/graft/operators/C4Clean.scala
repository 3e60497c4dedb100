package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
  * the published line+page filter battery behind the C4 corpus:
  *
  * line kept iff it ends in terminal punctuation (`.` `!` `?` `"`),
  * has at least `minLineWords` words, and does not mention
  * "javascript" (case-insensitive); page kept iff it retains at least
  * `minKeptLines` lines (the paper's ≥3-sentence gate, with kept lines
  * as the sentence proxy — documented deviation), contains no `{`
  * (code), and no "lorem ipsum" (template filler).
  *
  * Scale shape (same as [[Boilerplate]]): posexplode of the line split
  * is map-side; every line predicate is a codegen'd rlike/regexp_count
  * (no higher-order lambdas — those run interpreted, measured ~30×
  * slower on hot paths); the rebuild is ONE groupBy(doc) shuffle of
  * kept lines with an order-restoring sort_array. Shuffle volume is the
  * kept-line corpus, key is the document id — unskewable. Page gates
  * are plain filters on the rebuilt frame.
  *
  * Reference behavior: the reference pipeline has no text cleaning
  * (`etl_functions.py` coerces and renames only); this is the standard
  * strengthening for a web-corpus training-data engine.
  */
object C4Clean {

  /** Line-kept predicate over a line column — exposed for audits. */
  def lineKept(line: org.apache.spark.sql.Column,
      minLineWords: Int): org.apache.spark.sql.Column =
    line.rlike("[.!?\"][ \t]*$") &&
      regexp_count(line, lit("\\S+")) >= minLineWords &&
      !lower(line).contains("javascript")

  /** Clean every page: returns one row per SURVIVING document with
    * (idCol, text_clean, n_lines, n_kept). Dropped documents (page
    * gates, or fewer than `minKeptLines` surviving lines) are absent
    * from the output — this is a filter, not an annotate. */
  def clean(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLineWords: Int = 5,
      minKeptLines: Int = 3): DataFrame = {
    // page-level gates first: they need no line work at all, and the
    // filter pushes to the scan (cheap rejection before the explode)
    val pages = docs.filter(
      !col(textCol).contains("{") &&
        !lower(col(textCol)).contains("lorem ipsum"))

    val kept = pages.select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(lineKept(col("line"), minLineWords))

    kept.groupBy(col(idCol))
      .agg(first(col("n_lines")).as("n_lines"),
        sort_array(collect_list(struct(col("pos"), col("line"))))
          .as("ordered"),
        count(lit(1)).as("n_kept"))
      .filter(col("n_kept") >= minKeptLines)
      .select(col(idCol),
        array_join(transform(col("ordered"), _.getField("line")), "\n")
          .as("text_clean"),
        col("n_lines"), col("n_kept"))
  }
}
