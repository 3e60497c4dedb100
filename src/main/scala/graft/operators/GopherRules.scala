package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * Appendix A1.1) — the published heuristic gate battery for web-crawl
  * pretraining corpora: word-count bounds, mean-word-length bounds,
  * symbol-to-word ratio, bullet/ellipsis line shares, alphabetic-word
  * share, and a minimum stop-word presence.
  *
  * Every signal is a single codegen'd expression over the text column
  * (regexp_count / split / length — no UDFs, no higher-order lambdas),
  * so the whole battery is one map-only pass: flat at any corpus size,
  * nothing shuffles. All PASS/FAIL flags compare integer counts by
  * CROSS-MULTIPLICATION (e.g. `symbols * 10 <= words` for the 0.1
  * bound), never float ratios, so the gate is exactly reproducible on
  * any engine; the reported ratio columns are rounded doubles for
  * humans, not inputs to the flags.
  *
  * Definitional notes (documented deviations, same spirit as the
  * paper): "words" are whitespace-delimited runs; mean word length
  * counts all non-whitespace chars; "alphabetic" means ASCII [A-Za-z];
  * stop-word presence is a plain-token match (punctuation-attached
  * occurrences don't count). Reference behavior: the reference pipeline
  * has no quality gate at all (`dags/utils.py` filters on status only);
  * this is the standard strengthening for a training-data engine.
  */
object GopherRules {

  /** The paper's required-stop-word list (≥ 2 must appear). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def nWords(text: Column): Column =
    regexp_count(text, lit("\\S+"))

  /** Per-document signal + flag battery. Output columns:
    * (idCol, n_words, n_lines, word_chars, mean_word_len, alpha_words,
    * symbol_hits, bullet_lines, ellipsis_lines, stopword_hits,
    * word_count_ok, mean_word_len_ok, symbol_ok, bullet_ok,
    * ellipsis_ok, alpha_ok, stopword_ok, passes). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val text = col(textCol)
    val words = nWords(text)
    val lines = size(split(text, "\n")).cast("long")
    val wordChars = length(regexp_replace(text, "\\s+", "")).cast("long")
    // one regexp_count per signal; '\n'-anchoring via explicit concat
    // instead of (?m) so Java and RE2 line semantics cannot diverge
    val alphaWords = regexp_count(text, lit("[^\\s]*[A-Za-z][^\\s]*"))
    val symbolHits = regexp_count(text, lit("#|\\.\\.\\.|…"))
    val bulletLines =
      regexp_count(concat(lit("\n"), text), lit("\n[ \t]*[-*•]"))
    val ellipsisLines =
      regexp_count(concat(text, lit("\n")), lit("(\\.\\.\\.|…)[ \t]*\n"))
    // plain-token stop-word presence over space-normalized lowercase
    val norm = concat(lit(" "),
      regexp_replace(lower(text), "\\s+", " "), lit(" "))
    val stopHits = StopWords.map(w =>
      when(norm.contains(s" $w "), 1).otherwise(0))
      .reduce(_ + _).cast("int")

    docs.select(col(idCol),
        words.as("n_words"), lines.as("n_lines"),
        wordChars.as("word_chars"),
        alphaWords.as("alpha_words"), symbolHits.as("symbol_hits"),
        bulletLines.as("bullet_lines"),
        ellipsisLines.as("ellipsis_lines"),
        stopHits.as("stopword_hits"))
      .withColumn("mean_word_len",
        round(col("word_chars").cast("double") /
          nullif(col("n_words"), lit(0)), 6))
      // integer-exact flags (cross-multiplied thresholds)
      .withColumn("word_count_ok",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("mean_word_len_ok",
        col("word_chars") >= lit(3) * col("n_words") &&
          col("word_chars") <= lit(10) * col("n_words") &&
          col("n_words") > 0)
      .withColumn("symbol_ok",
        col("symbol_hits") * 10 <= col("n_words"))
      .withColumn("bullet_ok",
        col("bullet_lines") * 10 <= col("n_lines") * 9)
      .withColumn("ellipsis_ok",
        col("ellipsis_lines") * 10 <= col("n_lines") * 3)
      .withColumn("alpha_ok",
        col("alpha_words") * 5 >= col("n_words") * 4 && col("n_words") > 0)
      .withColumn("stopword_ok", col("stopword_hits") >= 2)
      .withColumn("passes",
        col("word_count_ok") && col("mean_word_len_ok") &&
          col("symbol_ok") && col("bullet_ok") && col("ellipsis_ok") &&
          col("alpha_ok") && col("stopword_ok"))
  }

  /** Gate form: the input rows whose text passes the full battery. */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    docs.join(
      score(docs, idCol, textCol, minWords, maxWords)
        .filter(col("passes")).select(col(idCol)),
      Seq(idCol), "left_semi")
}
