package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document repeated-substring detection — the "dedup at the
  * substring level" signal of Lee et al. 2021 (Deduplicating Training
  * Data Makes Language Models Better), which found that memorized text
  * is dominated by substrings repeated ACROSS documents that whole-doc
  * dedup never sees (boilerplate headers, licenses, quoted passages).
  *
  * The exact method there is a corpus-wide suffix array — inherently a
  * single sorted view of all bytes, which at 100 TB means one global
  * sort. This is the Spark-native restatement: positional token k-grams
  * as the fixed-width proxy for "substring of length ≥ k", a shuffle on
  * the k-gram key to find grams occurring in ≥ `minDocs` distinct
  * documents, and a per-document roll-up of how much of each document is
  * covered by such shared spans. A k-gram posting list is exactly the
  * k-prefix bucketing of the suffix array, so every repeated substring of
  * ≥ k tokens is caught (shorter repeats are deliberately below the
  * radar, as in the paper's min-length threshold).
  *
  * Plan shape: token/k-gram construction is map-only inside whole-stage
  * codegen; the only wide stages are the hot-gram aggregate and the
  * postings⋈hot join, both keyed on the gram. With `hashKeys` (default)
  * the key is xxhash64(gram) — 8 bytes per posting through the shuffle
  * instead of the ~k·word-length string, which at 100 TB is the
  * difference between shuffling ~0.5 PB of strings and ~40 TB of longs.
  * A 64-bit collision could only flag a gram spuriously (never miss
  * one); at 2^40 distinct grams the expected number of colliding PAIRS
  * is ~2^16/2^25 ≈ 0.03 docs mis-flagged corpus-wide — acceptable for a
  * filtering signal, and `hashKeys = false` keeps the exact-string arm.
  */
object RepeatedSpans {

  /** Positional k-grams: one row per (id, __pos, __g) with __pos the
    * 0-based token offset of the gram. Documents shorter than k tokens
    * emit nothing (no substring of length k exists). Gram construction is
    * the fused codegen [[graft.functions.PositionalWordShingles]] pass —
    * the equivalent interpreted higher-order-function tree
    * (`transform(sequence, i -> array_join(slice(tokens, i, k)))`) was
    * the whole query's bottleneck at sf0.1 (~30× slower per row;
    * RepeatedSpansSpec pins value-equality against that form). */
  def positionalGrams(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val gramArr = org.apache.spark.sql.graftshim.Shims.column(
      graft.functions.PositionalWordShingles(
        org.apache.spark.sql.graftshim.Shims.expression(col(textCol)), k))
    docs.select(col(idCol),
      posexplode(gramArr).as(Seq("__pos", "__g")))
  }

  private def keyed(grams: DataFrame, hashKeys: Boolean): DataFrame =
    if (hashKeys) grams.withColumn("__key", xxhash64(col("__g")))
    else grams.withColumn("__key", col("__g"))

  /** K-grams appearing in at least `minDocs` distinct documents:
    * (__key, n_docs). One shuffle on the gram key. */
  def hotGrams(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2, hashKeys: Boolean = true): DataFrame =
    keyed(positionalGrams(docs, idCol, textCol, k), hashKeys)
      .groupBy(col("__key"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document cross-corpus duplication roll-up:
    * (idCol, total_kgrams, dup_kgrams, dup_ratio, covered_tokens).
    *
    *  - dup_kgrams / dup_ratio: k-gram positions whose gram also occurs
    *    in ≥ minDocs−1 OTHER documents (the gram's doc-count includes
    *    this one).
    *  - covered_tokens: tokens of the document lying under at least one
    *    duplicated span — the merged-interval length of all [pos, pos+k)
    *    windows, the quantity Lee et al. cut; computed with one
    *    `aggregate` fold over the sorted position list, no second
    *    shuffle.
    *
    * Documents with fewer than k tokens emit no row (nothing can repeat),
    * matching [[Decontaminate.ngramOverlap]]'s convention. The hot-gram
    * side carries multiplicity one into the join, so no fan-out. */
  def dupStats(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2, hashKeys: Boolean = true): DataFrame = {
    val postings = keyed(positionalGrams(docs, idCol, textCol, k), hashKeys)
    val hot = hotGrams(docs, idCol, textCol, k, minDocs, hashKeys)
      .select(col("__key"), lit(1).as("__hot"))
    statsFromPostings(postings, hot, idCol, k)
  }

  private def statsFromPostings(
      postings: DataFrame, hot: DataFrame,
      idCol: String, k: Int): DataFrame = {
    val perDoc = postings.join(hot, Seq("__key"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("total_kgrams"),
        count(col("__hot")).as("dup_kgrams"),
        sort_array(collect_list(when(col("__hot").isNotNull,
          col("__pos")))).as("__dup_pos"))
    // Merged-interval fold: positions ascend, acc = (covered, end); each
    // span [p, p+k) adds p+k − max(p, end) new tokens (clamped — a span
    // wholly inside the previous one adds none).
    val covered = aggregate(col("__dup_pos"),
      struct(lit(0L).as("cov"), lit(0L).as("end")),
      (acc, p) => {
        val pL = p.cast("long")
        struct(
          (acc.getField("cov") + greatest(lit(0L),
            pL + k - greatest(pL, acc.getField("end")))).as("cov"),
          greatest(acc.getField("end"), pL + k).as("end"))
      }).getField("cov")
    perDoc.select(col(idCol), col("total_kgrams"), col("dup_kgrams"),
      (col("dup_kgrams").cast("double") /
        col("total_kgrams").cast("double")).as("dup_ratio"),
      covered.as("covered_tokens"))
  }

  /** Per-gram distinct-doc counts (__key, n_docs) — the index a
    * continuous-ingest caller persists between batches (the
    * [[Dedup.incrementalMinhashNearDups]] contract, restated for
    * substring dedup). */
  def gramIndex(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, hashKeys: Boolean = true): DataFrame =
    keyed(positionalGrams(docs, idCol, textCol, k), hashKeys)
      .groupBy(col("__key"))
      .agg(countDistinct(col(idCol)).as("n_docs"))

  /** Index refresh after a batch: old index + the batch's gram counts.
    * Doc ids are assumed unique across batches, so the counts ADD
    * exactly — the merged index equals [[gramIndex]] over the full
    * corpus, whatever the batch boundaries. */
  def mergeGramIndex(
      oldIndex: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String,
      k: Int, hashKeys: Boolean = true): DataFrame =
    oldIndex.union(gramIndex(newDocs, idCol, textCol, k, hashKeys))
      .groupBy(col("__key"))
      .agg(sum(col("n_docs")).as("n_docs"))

  /** Incremental [[dupStats]]: the duplication roll-up for a NEW batch
    * against an already-indexed corpus, without rescanning the corpus —
    * per-batch cost scales with the BATCH. A gram is hot when its
    * combined distinct-doc count (batch + index) reaches `minDocs`;
    * counts add exactly (unlike the LSH guardrail there is no
    * approximation here), so the result EQUALS the full-corpus
    * [[dupStats]] restricted to the batch's documents — the equality
    * RepeatedSpansSpec asserts. Existing docs whose grams a new batch
    * just made hot are the caller's re-score set; their keys are exactly
    * the index rows the merge bumped across the threshold. */
  def incrementalDupStats(
      newDocs: DataFrame, gramIdx: DataFrame,
      idCol: String, textCol: String,
      k: Int, minDocs: Int = 2, hashKeys: Boolean = true): DataFrame = {
    val postings = keyed(positionalGrams(newDocs, idCol, textCol, k),
      hashKeys)
    val newCounts = postings
      .groupBy(col("__key"))
      .agg(countDistinct(col(idCol)).as("__n_new"))
    val hot = newCounts.join(gramIdx, Seq("__key"), "left")
      .filter(col("__n_new") +
        coalesce(col("n_docs"), lit(0L)) >= minDocs)
      .select(col("__key"), lit(1).as("__hot"))
    statsFromPostings(postings, hot, idCol, k)
  }

  /** Corpus with heavily-duplicated documents removed: drops documents
    * whose duplicated-span coverage exceeds `maxDupRatio` of their
    * k-gram positions. Anti-join back on the id — original rows pass
    * through untouched. */
  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2, maxDupRatio: Double = 0.5,
      hashKeys: Boolean = true): DataFrame = {
    val flagged = dupStats(docs, idCol, textCol, k, minDocs, hashKeys)
      .filter(col("dup_ratio") > maxDupRatio)
      .select(col(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** Span EXCISION — Lee et al. 2021's actual remedy: cut the
    * duplicated substring out, KEEP the document, and keep ONE
    * canonical copy of every span (the LOWEST doc id among a hot
    * gram's holders keeps its tokens; every other holder loses the
    * k-token windows). Returns one row per input document:
    * (idCol, text_clean, n_tokens, n_excised), text rebuilt in
    * original token order.
    *
    * Shape: the postings shuffle [[dupStats]] already pays, plus a
    * per-gram (owner = min id) aggregate, a k-wide `sequence` explode
    * of the FLAGGED positions only (∝ duplicated volume, not corpus),
    * an anti join on (id, token idx), and one per-doc rebuild. Docs
    * shorter than k tokens pass through whole. */
  def excise(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2, hashKeys: Boolean = true): DataFrame = {
    val postings = keyed(positionalGrams(docs, idCol, textCol, k), hashKeys)
    val owners = postings.groupBy(col("__key"))
      .agg(countDistinct(col(idCol)).as("__n"),
        min(col(idCol)).as("__owner"))
      .filter(col("__n") >= minDocs)
      .select(col("__key"), col("__owner"))
    val flagged = postings.join(owners, Seq("__key"))
      .filter(col(idCol) =!= col("__owner"))
      .select(col(idCol), col("__pos"))
    val cut = flagged
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(k - 1)))
          .as("__ti"))
      .distinct()

    val toks = docs.select(col(idCol),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("__ti", "__tok")))
    val rebuilt = toks.join(cut, Seq(idCol, "__ti"), "left_anti")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__ti"), col("__tok"))))
        .as("__o"),
        count(lit(1)).as("__n_kept"))
      .select(col(idCol),
        array_join(transform(col("__o"), _.getField("__tok")), " ")
          .as("text_clean"),
        col("__n_kept"))

    docs.select(col(idCol),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_excised"))
  }
}
