package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline surface:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting. All are composed from codegen'd built-ins (no UDFs) so
  * they stay inside whole-stage codegen at 100 TB scale.
  *
  * Each function documents its DuckDB-SQL oracle equivalent — the driver
  * hash-compares both (SparkEntry.oracleSql).
  */
object TextFunctions {

  /** Whitespace tokens, lowercased, empties removed.
    * Oracle: list_filter(string_split_regex(lower(text),'\s+'), t -> t <> '') */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, single digits, and single
    * non-alnum glyphs each count as one token (a common pre-tokenizer
    * regex shape). Oracle: len(regexp_extract_all(text, pat)). */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Count of sentence punctuation. Oracle: len(regexp_extract_all(text,'[.!?]')) */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.!?]"), lit(0)))

  /** Distinct-token ratio (lexical diversity), double in [0,1].
    * Oracle: len(list_distinct(toks)) / greatest(len(toks), 1) */
  def distinctTokenRatio(text: Column): Column = {
    val t = tokens(text)
    size(array_distinct(t)).cast("double") /
      greatest(size(t), lit(1)).cast("double")
  }

  /** Stopword-hit ratio against a fixed English list — a standard quality
    * signal (C4/Gopher-style heuristics). */
  val englishStopwords: Seq[String] =
    Seq("the", "a", "and", "is", "of", "to", "in", "that", "it", "for")
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val hits = size(filter(t,
      w => englishStopwords.foldLeft(lit(false))((acc, s) => acc || w === s)))
    hits.cast("double") / greatest(size(t), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: mean of (length-in-range,
    * lexical diversity, low-punct). Deterministic, SQL-expressible. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lenOk = when(n.between(5, 10000), lit(1.0)).otherwise(lit(0.0))
    val diversity = distinctTokenRatio(text)
    val punctOk = when(
      punctCount(text).cast("double") /
        greatest(n, lit(1)).cast("double") < 0.3, lit(1.0))
      .otherwise(lit(0.0))
    round((lenOk + diversity + punctOk) / lit(3.0), 6)
  }

  /** Stopword-evidence language ID over {en,de,fr,es,zh}. Score = number
    * of language-marker substrings present; argmax with fixed priority
    * order (en,de,es,fr,zh); all-zero → 'und'. Simple n-gram/stopword
    * heuristic, exactly reproducible in oracle SQL via CASE. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " is "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " una "),
    "fr" -> Seq(" le ", " les ", " est "),
    "zh" -> Seq("的", "是", "了"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map(m => when(padded.contains(m), 1).otherwise(0))
      .reduce(_ + _)
  }

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ms) => l -> langScore(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), other) =>
      when(s > 0 && s === best, lit(l)).otherwise(other)
    }
  }

  /** Unicode-script character classes for script detection — the
    * writing-system complement to [[langId]]'s marker-word heuristic
    * (script is robust where marker words are absent: names, code,
    * short strings). Java-regex ranges; the DuckDB oracle uses the same
    * ranges in RE2 `\x{…}` syntax. CJK folds Han + kana + Hangul. */
  val scriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\u00C0-\\u024F]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "greek" -> "[\\u0370-\\u03FF]",
    "arabic" -> "[\\u0600-\\u06FF]",
    "cjk" -> "[\\u4E00-\\u9FFF\\u3040-\\u30FF\\uAC00-\\uD7AF]",
    "digit" -> "[0-9]")

  /** Per-script character counts plus the non-whitespace total, as a
    * struct of exact longs — map-only, all codegen'd built-ins. */
  def scriptCounts(text: Column): Column = {
    val counts = scriptClasses.map { case (name, pat) =>
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
        .as(s"n_$name")
    }
    val total = length(regexp_replace(text, "\\s", "")).cast("long")
      .as("n_chars")
    struct(counts :+ total: _*)
  }

  /** Dominant script by character count (ties break in [[scriptClasses]]
    * declaration order; 'other' when no class matches anything). */
  def dominantScript(text: Column): Column = {
    val sc = scriptCounts(text)
    val names = scriptClasses.map(_._1)
    val best = names.map(n => sc.getField(s"n_$n"))
      .reduce((a, b) => greatest(a, b))
    names.foldRight(lit("other"): Column) { case (n, other) =>
      when(sc.getField(s"n_$n") > 0 && sc.getField(s"n_$n") === best,
        lit(n)).otherwise(other)
    }
  }

  /** Luhn mod-10 check over a digit string — the card-number validity
    * test that separates real PII from random digit runs. Reversed
    * digits, every second doubled (−9 past 9), sum ≡ 0 (mod 10).
    * Composed from HOFs over a ≤19-char array (bounded, not a hot
    * scan), exact integers throughout. */
  def luhnValid(digits: Column): Column = {
    // Spark's split keeps the empty match at end-of-string (limit -1
    // semantics) — drop it before the ANSI cast
    val ds = transform(
      filter(split(reverse(digits), "(?!^)"), c => c =!= ""),
      _.cast("int"))
    val sum = aggregate(
      zip_with(ds, sequence(lit(0), size(ds) - 1), (d, i) =>
        when(i % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)),
      lit(0), (acc, x) => acc + x)
    sum % 10 === 0
  }

  /** PII-candidate counts as exact longs: emails, IPv4 literals, card-
    * length digit runs (13–19), and the Luhn-VALID subset of those runs
    * — the audit view a redaction pass (see [[redact]]) is gated on.
    * Regexes avoid lookarounds so Java and RE2 (DuckDB) agree. */
  def piiCounts(text: Column): Column = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipPat = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val cardPat = "\\b[0-9]{13,19}\\b"
    val cards = regexp_extract_all(text, lit(cardPat), lit(0))
    struct(
      size(regexp_extract_all(text, lit(emailPat), lit(0))).cast("long")
        .as("n_email"),
      size(regexp_extract_all(text, lit(ipPat), lit(0))).cast("long")
        .as("n_ipv4"),
      size(cards).cast("long").as("n_card"),
      size(filter(cards, c => luhnValid(c))).cast("long")
        .as("n_card_valid"))
  }

  /** Normalized-text fingerprint: md5 of lowercase, whitespace-collapsed,
    * trimmed text. Oracle: md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** zlib-deflate compression ratio (compressed/raw UTF-8 bytes) — the
    * Gopher-family repetition/noise heuristic via the custom expression.
    * Spec-gated (not DuckDB-expressible); see [[CompressionRatioUtil]]. */
  def compressionRatio(text: Column): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      CompressionRatio(
        org.apache.spark.sql.graftshim.Shims.expression(text)))

  /** Unicode-normalize (NFC/NFD/NFKC/NFKD) via the custom expression. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      NormalizeUnicode(
        org.apache.spark.sql.graftshim.Shims.expression(text), form))

  /** Redaction regexes (simple, portable between Java regex and RE2). */
  val urlPattern = "https?://[^\\s]+"
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Strip URLs and e-mail addresses (training-data PII/noise scrub).
    * Oracle: regexp_replace(text, pat, '<TOKEN>', 'g'). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")

  /** Remove control characters (C0/C1 except \t \n \r). */
  def stripControlChars(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  /** 1..n as an array column; empty when n < 1 (`sequence(1, 0)` would
    * count DOWN, so it needs the guard). */
  private def indices(n: Column): Column =
    when(n >= 1, sequence(lit(1), n)).otherwise(array().cast("array<int>"))

  /** Word n-gram shingles over an ALREADY-MATERIALIZED token-array column.
    * Callers must project `tokens(text)` into its own column first: the
    * lambda below references the array per element, and an inline
    * `tokens(text)` tree would be re-evaluated per element — O(tokens²)
    * split/filter work per document. */
  def shinglesOf(toks: Column, n: Int): Column =
    if (n == 1) array_distinct(toks)
    else array_distinct(transform(indices(size(toks) - (n - 1)), i =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))

  /** Word n-gram shingles of the token stream (dedup unit). Convenience
    * single-expression form — fine for tests/small inputs; hot paths
    * should materialize tokens and use [[shinglesOf]]. */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** Distinct word n-gram shingles of raw text via the fused codegen'd
    * [[WordShingles]] expression — value-identical to [[shingles]] but one
    * tight pass instead of an interpreted higher-order-function tree. The
    * hot-path form for the dedup/minhash chains. */
  def shinglesFast(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      WordShingles(
        org.apache.spark.sql.graftshim.Shims.expression(text), n))

  /** Repeated-n-gram fraction in [0,1] — the Gopher/C4 repetition quality
    * signal: 1 − distinct_ngrams / total_ngrams. 0 for texts shorter than
    * n tokens (nothing to repeat). Oracle: 1 − len(list_distinct(grams))
    * / greatest(len(tk)−(n−1), 1) over the same n-gram construction. */
  def repetitionScore(text: Column, n: Int): Column = {
    val total = greatest(tokenCount(text) - (n - 1), lit(0))
    val distinctN = size(shinglesFast(text, n))
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) -
        distinctN.cast("double") / total.cast("double"))
  }

  /** Shannon entropy (bits per code point) via the fused codegen'd
    * [[CharEntropy]] expression — the gibberish/byte-soup quality signal
    * (low = repetitive boilerplate, high = base64/minified noise).
    * Oracle: log2(n) − list_sum over sorted per-char counts c·log2(c)
    * divided by n (see q132). */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      CharEntropy(
        org.apache.spark.sql.graftshim.Shims.expression(text)))

  /** Exact Jaccard of two distinct-element string-array columns via the
    * fused codegen'd [[JaccardSimilarity]] expression — value-identical
    * to `size(array_intersect)/size(array_union)` without materializing
    * either intermediate array (the verify hot loop of the dedup chains). */
  def jaccardFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      JaccardSimilarity(
        org.apache.spark.sql.graftshim.Shims.expression(a),
        org.apache.spark.sql.graftshim.Shims.expression(b)))

  /** [[jaccardFast]] for arrays the caller has already array_sort'ed
    * (and made distinct): linear merge, no per-pair hash set — the
    * exact-similarity-join verify primitive, where the sort is paid
    * once per doc and the merge once per candidate pair. Value- and
    * null-identical to [[jaccardFast]] on such inputs. */
  def jaccardSortedFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      JaccardSortedSimilarity(
        org.apache.spark.sql.graftshim.Shims.expression(a),
        org.apache.spark.sql.graftshim.Shims.expression(b)))

  /** |a ∩ b| (long) over sorted distinct string arrays via the same
    * merge — the directed-containment verify's numerator without
    * materializing array_intersect. */
  def intersectCountSorted(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      IntersectCountSorted(
        org.apache.spark.sql.graftshim.Shims.expression(a),
        org.apache.spark.sql.graftshim.Shims.expression(b)))

  /** Character n-gram shingles of the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    array_distinct(transform(indices(length(norm) - (n - 1)), i =>
      norm.substr(i, lit(n))))
  }
}
