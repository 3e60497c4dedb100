package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Okapi BM25 retrieval scoring over a document corpus — the ranking
  * signal a training-data pipeline uses for query-targeted corpus
  * selection (e.g. "pull the top-k docs per seed query" curation passes)
  * and for building weak-supervision relevance labels.
  *
  * Scale shape (the point, at 100 TB):
  *   - tokenize + doc-length are map-side (no shuffle);
  *   - the exploded token stream is filtered to the query-term set
  *     BEFORE any shuffle, so the per-(doc, term) tf aggregation
  *     shuffles only matching tokens (∝ hits, not corpus size);
  *   - document frequencies live in a |Q|-row table that is
  *     broadcast back (never a shuffle join against the corpus);
  *   - corpus statistics (N, total token count) are one scalar
  *     aggregate — a 1-row collect, both exact integers.
  *
  * Determinism (oracle parity): per-term partial scores are rounded to
  * DECIMAL(22,9) and summed as decimals, so Spark's partial-aggregation
  * order cannot change the per-document sum; the only cross-engine
  * divergence is ln()'s last ulp inside idf, absorbed by the final
  * round(6) (the q131/q132 precedent).
  *
  * Reference behavior reproduced: the reference engine's corpus ranking
  * is plain tf scoring; BM25 is the standard strengthening of that
  * surface (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework: BM25 and Beyond"), with the Lucene-style non-negative
  * idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
  */
object Retrieval {

  /** BM25 scores for `queryTerms` over `docs`. Returns one row per
    * document that matches at least one query term:
    * (idCol, bm25 double rounded to 6 dp, n_terms matched).
    *
    * `k1` tunes tf saturation, `b` tunes length normalization (the
    * universal defaults 1.2 / 0.75). Terms are matched lowercase against
    * [[TF.tokens]] whitespace tokens.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    require(terms.nonEmpty, "queryTerms must be non-empty")

    // map-side: tokens + per-doc length (dl), carried through the explode
    val toks = docs.select(col(idCol),
      TF.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))

    // corpus stats — exact integers, one 1-row collect
    val statsRow = toks.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens")).head()
    val nDocs = statsRow.getLong(0)
    val totalTokens = statsRow.getLong(1)
    // IEEE division of two exact integers — bit-identical in any engine
    val avgdl = totalTokens.toDouble / nDocs.toDouble

    // filter to query terms BEFORE the shuffle: hits only
    val hits = toks
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))

    val tf = hits.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))

    // |Q|-row document-frequency table → idf, broadcast back
    val dfTable = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf",
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))

    val perTerm = tf.join(broadcast(dfTable.select("term", "idf")), "term")
      .withColumn("score_term",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))

    // decimal-summed partials: aggregation order cannot move the result
    perTerm.groupBy(col(idCol))
      .agg(
        sum(col("score_term").cast("decimal(22,9)")).cast("double")
          .as("bm25_raw"),
        count(lit(1)).as("n_terms"))
      .select(col(idCol), round(col("bm25_raw"), 6).as("bm25"),
        col("n_terms"))
  }

  /** Top-k documents by BM25 with a total order (score desc, then id) —
    * the curation-pass shape. k rows survive the per-partition TopK
    * (Spark plans this as TakeOrderedAndProject: no global sort). */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
}
