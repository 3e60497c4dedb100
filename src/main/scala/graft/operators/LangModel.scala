package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus language-model quality scoring — the CCNet recipe's central
  * signal (Wenzek et al. 2020 score documents by KenLM perplexity; a
  * doc that a corpus-fitted model finds surprising is noise, one it
  * finds too predictable is boilerplate). This is the honest
  * Spark-native core of that idea: an interpolated unigram/bigram model
  * with add-one smoothing over a top-V vocabulary + `<unk>` bucket —
  * exactly replayable in SQL (every probability is a ratio of exact
  * integer counts; ln()'s last ulp is the only divergence, absorbed by
  * the q131/q132 round(6) convention). A 5-gram KenLM would change the
  * table sizes, not the plan shape.
  *
  * Scale shape:
  *   - training: one token explode (map-side) + one unigram count
  *     shuffle + one bigram count shuffle; the top-V vocab cut is a
  *     V-row `orderBy.limit` (TakeOrderedAndProject, no global sort);
  *   - scoring: tokens explode map-side, vocab/unigram tables join
  *     BROADCAST (V+1 rows), the bigram table joins by (sym, next) —
  *     broadcast under AQE while it fits, shuffle-hash beyond (the
  *     table is bounded by observed bigrams, ≤ (V+1)²);
  *   - the per-doc window (lead) and the final per-doc aggregate share
  *     one hash partitioning on the doc id — Spark reuses the exchange.
  *
  * Determinism: per-token log-probs are DECIMAL(24,10)-rounded then
  * decimal-summed, so aggregation order cannot move a document's score.
  */
object LangModel {

  /** Trained model tables: `unigrams` = (sym, c1) over top-V tokens
    * plus `<unk>` (c1 = summed out-of-vocab count), `bigrams` =
    * (sym, next_sym, c2), plus the corpus token total and V. */
  final case class Model(
      unigrams: DataFrame, bigrams: DataFrame, nTokens: Long, v: Int)

  val Unk = "<unk>"

  /** Per-(doc, pos) symbol stream: tokens mapped through the vocab,
    * out-of-vocab → `<unk>`. The vocab side is always broadcast. */
  private def symbols(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    docs.select(col(idCol),
        posexplode(TF.tokens(col(textCol))).as(Seq("pos", "tok")))
      .join(broadcast(vocab.select(col("sym").as("tok"))
        .withColumn("__in", lit(1))), Seq("tok"), "left")
      .select(col(idCol), col("pos"),
        when(col("__in").isNotNull, col("tok")).otherwise(lit(Unk))
          .as("sym"))

  /** Fit the model: top-`vocabSize` tokens by (count desc, token asc)
    * form the vocabulary; everything else folds into `<unk>`. */
  def train(
      docs: DataFrame, textCol: String, vocabSize: Int,
      idCol: String = "doc_id"): Model = {
    val toks = docs.select(col(idCol),
      posexplode(TF.tokens(col(textCol))).as(Seq("pos", "tok")))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nTokens = counts.agg(sum(col("c"))).head().getLong(0)
    val vocab = counts.orderBy(col("c").desc, col("tok"))
      .limit(vocabSize).select(col("tok").as("sym"), col("c"))

    // unigrams: vocab counts + the folded <unk> mass
    val unkCount = nTokens -
      vocab.agg(sum(col("c"))).head().getLong(0)
    val unigrams = vocab.unionByName(
      docs.sparkSession.range(1).select(lit(Unk).as("sym"),
        lit(unkCount).as("c")))
      .select(col("sym"), col("c").as("c1"))

    // bigrams over the symbol stream (adjacent positions per doc)
    val sy = symbols(docs, idCol, textCol,
      vocab.select(col("sym")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bigrams = sy
      .withColumn("next_sym", lead(col("sym"), 1).over(w))
      .filter(col("next_sym").isNotNull)
      .groupBy(col("sym"), col("next_sym"))
      .agg(count(lit(1)).as("c2"))
    Model(unigrams, bigrams, nTokens, vocabSize)
  }

  /** Score every document: mean interpolated bigram log-prob over
    * positions 2..n and the corresponding perplexity. Documents with
    * fewer than 2 tokens keep a row with n_scored = 0 and null scores.
    *
    * lp(a→b) = ln( λ·(c2(a,b)+1)/(c1(a)+V+1)
    *             + (1−λ)·(c1(b)+1)/(N+V+1) )
    */
  def scoreDocs(
      docs: DataFrame, idCol: String, textCol: String, model: Model,
      lambda: Double = 0.7): DataFrame = {
    val vPlus1 = model.v + 1
    val sy = symbols(docs, idCol, textCol,
      model.unigrams.filter(col("sym") =!= Unk))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val pairs = sy
      .withColumn("next_sym", lead(col("sym"), 1).over(w))
      .filter(col("next_sym").isNotNull)

    val withCounts = pairs
      .join(broadcast(model.unigrams
        .select(col("sym"), col("c1").as("c1a"))), Seq("sym"))
      .join(broadcast(model.unigrams
        .select(col("sym").as("next_sym"), col("c1").as("c1b"))),
        Seq("next_sym"))
      .join(model.bigrams, Seq("sym", "next_sym"), "left")
      .withColumn("c2", coalesce(col("c2"), lit(0L)))

    val lp = log(
      lit(lambda) * ((col("c2") + lit(1)) / (col("c1a") + lit(vPlus1))) +
        lit(1.0 - lambda) *
          ((col("c1b") + lit(1)) / (lit(model.nTokens) + lit(vPlus1))))

    val perDoc = withCounts
      .groupBy(col(idCol))
      .agg(
        sum(lp.cast("decimal(24,10)")).as("lp_sum"),
        count(lit(1)).as("n_scored"))
      .withColumn("mean_logprob",
        round(col("lp_sum").cast("double") / col("n_scored"), 6))
      .withColumn("pplx",
        round(exp(-(col("lp_sum").cast("double") / col("n_scored"))), 6))

    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        col("mean_logprob"), col("pplx"))
  }
}
