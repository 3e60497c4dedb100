package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Boilerplate, Chunking, Decontaminate, Dedup,
  LangModel, Packing, RepeatedSpans, Sampling, Scoring}

/** End-to-end training-corpus curation: the composition a 100 TB text
  * pipeline actually runs, as one declarative plan per stage —
  *
  *   annotate (lang, tokens, quality, repetition) → quality gate →
  *   exact dedup → near-dup removal (MinHash-LSH) → eval-set
  *   decontamination → deterministic train/holdout split →
  *   [toTrainingBatches] context chunking → sequence packing
  *
  * Each stage is a pure DataFrame transform from the operator library;
  * nothing here collects to the driver. Near-dup removal keeps the
  * lowest-id member of each duplicate pair-component (greedy by pair,
  * which for near-dup clusters removes every doc that is similar to a
  * lower-id survivor candidate — the standard one-pass policy).
  */
object CorpusPipeline {

  final case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.5,
      minTokens: Int = 5,
      nearDupShingle: Int = 3,
      nearDupThreshold: Double = 0.8,
      maxRepetition: Double = 0.5,
      decontamN: Int = 8, // matches Decontaminate.clean and the 8–13-gram
      // overlap practice from published LLM decontamination recipes;
      // 3-gram overlap ≥ 0.5 over-blocks clean documents

      decontamMaxOverlap: Double = 0.5,
      trainFraction: Double = 0.9,
      chunkSize: Int = 512,
      chunkStride: Int = 384,
      packCapacity: Long = 4096L,
      // near-dup survivor policy: false = each cluster's lowest id (the
      // round-1 behavior), true = the cluster's HIGHEST-quality member
      // (ties to lowest id) via Dedup.keepBestPerCluster
      keepBestQuality: Boolean = false,
      // near-dup handling: true = remove non-survivors (default); false =
      // RETAIN near-dups but split them leakage-safely (every cluster
      // lands wholly in train or wholly in holdout,
      // Sampling.leakageSafeSplit)
      dropNearDups: Boolean = true,
      // optional per-source document ceiling (docs-per-domain cap),
      // applied after exact dedup
      maxPerSource: Option[Int] = None,
      sourceCol: String = "source",
      // char-entropy gate (bits/code point): natural language sits
      // ~3.5–4.5; low = repetitive boilerplate, high = base64/minified
      // noise. Defaults keep the gate open.
      minEntropy: Double = 0.0,
      maxEntropy: Double = Double.MaxValue,
      // optional learned quality filter (Scoring.score): hashed-feature
      // weights + bias from an offline-trained linear classifier; docs
      // below `minClassifierProb` are gated out
      classifierWeights: Option[(Array[Double], Double)] = None,
      minClassifierProb: Double = 0.5,
      // optional substring-level dedup (RepeatedSpans.clean): drop docs
      // whose cross-corpus duplicated-k-gram ratio exceeds the cap —
      // catches boilerplate/quoted passages whole-doc dedup misses
      maxSubstringDupRatio: Option[Double] = None,
      substringK: Int = 6,
      // optional writing-system gate (TextFunctions.dominantScript):
      // keep only docs whose dominant script is in the set — the robust
      // complement to lang_pred where marker words are absent
      allowedScripts: Option[Set[String]] = None,
      // optional PII ceiling (TextFunctions.piiCounts): drop docs with
      // more than this many emails + IPv4s + Luhn-valid card numbers
      // (None = open; Some(0) = zero-tolerance before redaction)
      maxPiiHits: Option[Long] = None,
      // optional zlib-compression-ratio band (Gopher-family heuristic:
      // prose ~0.3–0.6; far below = repetition, near/above 1 = noise).
      // Defaults keep the gate open; spec-gated signal (not DuckDB-
      // expressible), see functions.CompressionRatioUtil
      minCompressionRatio: Double = 0.0,
      maxCompressionRatio: Double = Double.MaxValue,
      // optional LM-perplexity band (the CCNet recipe: fit a small LM
      // on a REFERENCE corpus — lmRef — and gate crawl docs whose
      // perplexity under it falls outside [min, max]; too high =
      // noise, too low = degenerate/templated). Docs with no scorable
      // bigram (< 2 tokens) are dropped when a band is set.
      lmRef: Option[DataFrame] = None,
      lmPplxBand: (Double, Double) = (0.0, Double.MaxValue),
      lmVocabSize: Int = 512,
      lmLambda: Double = 0.75,
      // optional line-level boilerplate pre-stage
      // (Boilerplate.removeBoilerplate keyed by `sourceCol`): template
      // lines are deleted BEFORE any signal is computed, so headers and
      // footers can neither poison fingerprints/shingles nor prop up
      // token counts
      stripBoilerplate: Boolean = false,
      boilerplateMinFrac: Double = 0.5)

  /** Stage 1: annotate every doc with analysis columns (single pass —
    * every signal here is a map-only codegen expression, including the
    * optional learned-classifier probability). */
  def annotate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val base = docs
      .withColumn("lang_pred", TextFunctions.langId(col(cfg.textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(cfg.textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(cfg.textCol)))
      .withColumn("repetition",
        TextFunctions.repetitionScore(col(cfg.textCol), 3))
      .withColumn("char_entropy",
        TextFunctions.charEntropy(col(cfg.textCol)))
      .withColumn("fp", TextFunctions.fingerprint(col(cfg.textCol)))
    val withCompression =
      if (cfg.minCompressionRatio == 0.0 &&
        cfg.maxCompressionRatio == Double.MaxValue) base
      else base.withColumn("compression_ratio",
        TextFunctions.compressionRatio(col(cfg.textCol)))
    val withScript =
      if (cfg.allowedScripts.isEmpty && cfg.maxPiiHits.isEmpty)
        withCompression
      else {
        val pc = TextFunctions.piiCounts(col(cfg.textCol))
        withCompression
          .withColumn("script",
            TextFunctions.dominantScript(col(cfg.textCol)))
          .withColumn("pii_hits",
            pc.getField("n_email") + pc.getField("n_ipv4") +
              pc.getField("n_card_valid"))
      }
    cfg.classifierWeights.fold(withScript) { case (w, bias) =>
      withScript.withColumn("classifier_prob",
        Scoring.score(col(cfg.textCol), w, bias))
    }
  }

  /** Stage 2: quality gate (cheap filters before any shuffle) —
    * heuristic score, token count, repetition, entropy band, and the
    * learned classifier probability when weights are configured. */
  def qualityGate(annotated: DataFrame, cfg: Config = Config()): DataFrame = {
    val heuristic = annotated.filter(
      col("quality") >= cfg.minQuality && col("n_tokens") >= cfg.minTokens &&
        col("repetition") <= cfg.maxRepetition &&
        col("char_entropy").between(cfg.minEntropy, cfg.maxEntropy))
    val compressed =
      if (cfg.minCompressionRatio == 0.0 &&
        cfg.maxCompressionRatio == Double.MaxValue) heuristic
      else heuristic.filter(col("compression_ratio")
        .between(cfg.minCompressionRatio, cfg.maxCompressionRatio))
    val scripted = cfg.allowedScripts.fold(compressed)(ok =>
      compressed.filter(col("script").isin(ok.toSeq: _*)))
    val piiGated = cfg.maxPiiHits.fold(scripted)(cap =>
      scripted.filter(col("pii_hits") <= cap))
    if (cfg.classifierWeights.isDefined)
      piiGated.filter(col("classifier_prob") >= cfg.minClassifierProb)
    else piiGated
  }

  /** Stage 3: exact dedup on normalized fingerprint (lowest id wins). */
  def exactDedup(gated: DataFrame, cfg: Config = Config()): DataFrame =
    Dedup.exactByFingerprint(gated, cfg.idCol, cfg.textCol)

  /** Verified MinHash-LSH near-dup pairs for the configured thresholds. */
  def nearDupPairs(df: DataFrame, cfg: Config = Config()): DataFrame =
    Dedup.minhashNearDups(df, cfg.idCol, cfg.textCol,
      shingleSize = cfg.nearDupShingle, threshold = cfg.nearDupThreshold)

  /** Stage 4: near-dup removal — verified MinHash-LSH pairs → connected
    * components (transitive closure) → keep one per cluster: the lowest
    * id, or with `cfg.keepBestQuality` the highest-`quality` member
    * (requires the [[annotate]] columns). */
  def nearDedup(deduped: DataFrame, cfg: Config = Config()): DataFrame = {
    val pairs = nearDupPairs(deduped, cfg)
    if (cfg.keepBestQuality)
      Dedup.keepBestPerCluster(deduped, cfg.idCol, pairs, "quality")
    else Dedup.keepClusterRepresentatives(deduped, cfg.idCol, pairs)
  }

  /** Stage 5: eval-set decontamination — drop docs whose n-grams overlap
    * the benchmark corpus (no-op when `evalDocs` is None). */
  def decontaminate(
      curated: DataFrame, evalDocs: Option[DataFrame],
      cfg: Config = Config()): DataFrame =
    evalDocs match {
      case Some(ev) => Decontaminate.clean(curated, ev,
        cfg.idCol, cfg.textCol, cfg.decontamN, cfg.decontamMaxOverlap)
      case None => curated
    }

  /** Stage 6: deterministic split flag. */
  def split(curated: DataFrame, cfg: Config = Config()): DataFrame =
    curated.withColumn("is_train",
      Sampling.isTrain(col(cfg.idCol), cfg.trainFraction))

  /** Stage 6 (retain-near-dups policy): leakage-safe split — every
    * near-dup cluster lands wholly in train or wholly in holdout, so
    * retained near-duplicates can never leak training text into eval. */
  def leakageSafeSplitStage(
      curated: DataFrame, pairs: DataFrame,
      cfg: Config = Config()): DataFrame =
    Sampling.leakageSafeSplit(curated, cfg.idCol, pairs, cfg.trainFraction)
      .withColumn("is_train", col("split") === "train")
      .drop("split", "split_key")

  /** The whole pipeline. Near-dups are either removed (default) or
    * retained-but-co-split per `cfg.dropNearDups`; an optional
    * per-source cap bounds any single domain's share. */
  def curate(docs: DataFrame, cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None): DataFrame = {
    // line-level boilerplate removal runs FIRST when configured:
    // template lines must not reach fingerprints, shingles, or counts
    val input =
      if (!cfg.stripBoilerplate) docs
      else {
        val cleaned = Boilerplate.removeBoilerplate(docs, cfg.idCol,
          cfg.textCol, cfg.sourceCol, minFrac = cfg.boilerplateMinFrac)
          .select(col(cfg.idCol), col("text_clean"))
        docs.drop(cfg.textCol)
          .join(cleaned, cfg.idCol)
          .withColumnRenamed("text_clean", cfg.textCol)
      }
    val gated = qualityGate(annotate(input, cfg), cfg)
    // LM-perplexity band: model fitted on the reference corpus, scores
    // joined back per doc (broadcast vocab tables; see LangModel)
    val lmGated = cfg.lmRef.fold(gated) { ref =>
      val model = LangModel.train(ref, cfg.textCol, cfg.lmVocabSize,
        cfg.idCol)
      val scores = LangModel.scoreDocs(gated, cfg.idCol, cfg.textCol,
        model, cfg.lmLambda)
        .select(col(cfg.idCol), col("pplx"))
      gated.join(scores, cfg.idCol)
        .filter(col("pplx").between(cfg.lmPplxBand._1, cfg.lmPplxBand._2))
    }
    val exact = exactDedup(lmGated, cfg)
    // substring-level dedup sits between exact and near-dup: it removes
    // boilerplate-dominated docs, shrinking the LSH stage's input
    val subClean = cfg.maxSubstringDupRatio.fold(exact)(r =>
      RepeatedSpans.clean(exact, cfg.idCol, cfg.textCol,
        k = cfg.substringK, maxDupRatio = r))
    val capped = cfg.maxPerSource.fold(subClean)(k =>
      Sampling.capPerGroup(subClean, cfg.idCol, cfg.sourceCol, k))
    if (cfg.dropNearDups)
      split(decontaminate(nearDedup(capped, cfg), evalDocs, cfg), cfg)
    else {
      val cleaned = decontaminate(capped, evalDocs, cfg)
      // pairs over the SPLIT input: decontamination may drop docs, and a
      // pair endpoint outside the frame would dangle in the components
      leakageSafeSplitStage(cleaned, nearDupPairs(cleaned, cfg), cfg)
    }
  }

  /** Post-curation batch prep: overlapping context chunks, then packed
    * into fixed token budgets (shard = hash bucket of the doc id so the
    * prefix-sum window parallelizes; see [[Packing.assignPacks]]). */
  def toTrainingBatches(
      curated: DataFrame, cfg: Config = Config()): DataFrame = {
    val chunks = Chunking.chunkTokens(curated, cfg.idCol, cfg.textCol,
      cfg.chunkSize, cfg.chunkStride)
      .withColumn("__shard", Sampling.hashBucket(col(cfg.idCol), 32))
    Packing.assignPacks(chunks, "__shard", cfg.idCol, "n_chunk_tokens",
      cfg.packCapacity, tieCols = Seq("chunk_id"))
  }

  /** Epoch ordering: deterministic global shuffle of the packed batches
    * by md5(seed ++ pack shard/id) — different seed per epoch, same seed
    * reproduces the exact order on any cluster layout (distributed range
    * sort, no single-partition stage; see
    * [[graft.operators.Sampling.deterministicShuffle]]). */
  def epochOrder(batches: DataFrame, epoch: Int,
      cfg: Config = Config()): DataFrame =
    Sampling.deterministicShuffle(
      batches.withColumn("__pack_key", // (doc, chunk) is globally unique —
        concat_ws(":", col(cfg.idCol), col("chunk_id"))), // a total order,
      "__pack_key", s"epoch$epoch:") //   no nondeterministic key ties
      .drop("__pack_key", "shuffle_key") // order is the row order of the
      // returned frame; dropping the helper keys keeps the batch schema
      // clean and makes epochOrder(epochOrder(b, 1), 2) chains legal

  /** Corpus report: per-language doc/token/quality stats of a curated
    * frame — the monitoring output a curation run publishes. */
  def report(curated: DataFrame): DataFrame =
    curated.groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("total_tokens"),
        (sum(col("quality").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("avg_quality"),
        sum(when(col("is_train"), 1).otherwise(0)).cast("bigint")
          .as("n_train"))
      .orderBy(col("lang_pred"))
}
