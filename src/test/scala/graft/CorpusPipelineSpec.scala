package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.pipeline.CorpusPipeline

class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("curate: gates, dedups, and splits the synthetic corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (3L, "THE QUICK  BROWN fox jumps over the lazy dog near the river bank"),
      (4L, "tiny"), // fails minTokens
      (5L, "word word word word word word word word word word word word"), // pure repetition
      (6L, "an entirely different document about spark query planning today")
    ).toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(
      minQuality = 0.5, minTokens = 5,
      nearDupShingle = 2, nearDupThreshold = 0.5)
    val out = CorpusPipeline.curate(docs, cfg).cache()
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(4L)) // token gate
    assert(!ids.contains(5L)) // repetition gate (rep3 = 0.9 > 0.5)
    assert(!ids.contains(3L)) // exact dup of 1 (normalized)
    assert(!ids.contains(2L)) // near-dup of 1
    assert(ids.contains(1L) && ids.contains(6L))
    assert(out.columns.contains("is_train"))
    val rep = CorpusPipeline.report(out)
    assert(rep.columns.toSeq ==
      Seq("lang_pred", "n_docs", "total_tokens", "avg_quality", "n_train"))
    assert(rep.agg(sum("n_docs")).head().getLong(0) == out.count())
    out.unpersist()
  }

  test("decontaminate + toTrainingBatches complete the recipe") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val evalSet = docs.filter(col("doc_id") % 50 === 0)
    val cfg = CorpusPipeline.Config(chunkSize = 32, chunkStride = 24,
      packCapacity = 128L)
    val curated = CorpusPipeline.curate(docs, cfg, Some(evalSet)).cache()
    // every eval doc (overlap 1.0 with itself) is gone from training
    assert(curated.filter(col("doc_id") % 50 === 0).count() == 0)
    assert(curated.count() > 0)
    val batches = CorpusPipeline.toTrainingBatches(curated, cfg)
    assert(batches.columns.contains("pack_id"))
    // packing preserves every chunk token
    val chunkTokens = batches.agg(sum("n_chunk_tokens")).head().getLong(0)
    assert(chunkTokens > 0)
    // packs respect the capacity up to one straddling chunk (chunk size
    // 32 <= capacity 128, so utilization stays bounded)
    val over = graft.operators.Packing
      .packReport(batches, "__shard", "n_chunk_tokens", 128L)
      .filter(col("n_tokens") > 128L + 32L).count()
    assert(over == 0)
    curated.unpersist()
  }

  test("epochOrder: reproducible per seed, different across epochs") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id") < 100)
    val cfg = CorpusPipeline.Config(chunkSize = 32, chunkStride = 24,
      packCapacity = 128L)
    val batches = CorpusPipeline.toTrainingBatches(
      CorpusPipeline.curate(docs, cfg), cfg).cache()
    def order(df: org.apache.spark.sql.DataFrame, epoch: Int) =
      CorpusPipeline.epochOrder(df, epoch)
        .select(col("doc_id"), col("chunk_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val e1 = order(batches, 1)
    val e1again = order(batches.repartition(9), 1)
    val e2 = order(batches, 2)
    assert(e1 == e1again) // same epoch: identical order on any layout
    assert(e1 != e2) // different epoch: different order
    assert(e1.sorted == e2.sorted) // same multiset of chunks
    // helper keys don't leak, so multi-epoch chains are legal
    val chained = CorpusPipeline.epochOrder(
      CorpusPipeline.epochOrder(batches, 1), 2)
    assert(!chained.columns.contains("shuffle_key"))
    assert(chained.count() == batches.count())
    batches.unpersist()
  }

  test("curate on testdata: LSH removes exactly the true near-dups") {
    // the generator PLANTS near-duplicate docs (distinct strings, 3-gram
    // Jaccard >= 0.8); ground truth via brute-force all-pairs Jaccard
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val gated = CorpusPipeline.qualityGate(CorpusPipeline.annotate(docs))
    val sets = gated
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text"))
        .as("__toks"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.shinglesOf(col("__toks"), 3).as("st"))
    val a = sets.select(col("doc_id").as("id_a"), col("st").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("st").as("sb"))
    val truePairs = a.join(b, col("id_a") < col("id_b"))
      .filter(size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))).cast("double") >= 0.8)
      .select(col("id_a"), col("id_b"))
    // cluster ground truth: drop everything but each component's min id
    val trueLosers = graft.operators.Dedup.connectedComponents(truePairs)
      .filter(col("id") =!= col("component"))
      .collect().map(_.getLong(0)).toSet
    assert(trueLosers.nonEmpty) // the corpus really has planted near-dups

    val out = CorpusPipeline.curate(docs)
    val keptIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val gatedIds = gated.select("doc_id").collect().map(_.getLong(0)).toSet
    // LSH + verify removed exactly the true near-dup losers: 100% recall
    // (16 bands × 4 rows at J>=0.8 -> P(detect) ~ 0.9997) and no false
    // positives (exact-Jaccard verification)
    assert(keptIds == gatedIds -- trueLosers)
  }

  test("retain-near-dups policy co-splits every cluster leakage-safely") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val cfg = CorpusPipeline.Config(dropNearDups = false)
    val out = CorpusPipeline.curate(docs, cfg).cache()
    val gated = CorpusPipeline.exactDedup(CorpusPipeline.qualityGate(
      CorpusPipeline.annotate(docs, cfg), cfg), cfg)
    // near-dups are RETAINED (nothing removed beyond exact dedup)...
    assert(out.count() == gated.count())
    val pairs = CorpusPipeline.nearDupPairs(out, cfg)
    assert(pairs.count() > 0)
    // ...but no verified pair straddles the split boundary
    val flags = out.select(col("doc_id"), col("is_train"))
    val straddle = pairs
      .join(flags.toDF("id_a", "t_a"), Seq("id_a"))
      .join(flags.toDF("id_b", "t_b"), Seq("id_b"))
      .filter(col("t_a") =!= col("t_b"))
    assert(straddle.count() == 0)
    out.unpersist()
  }

  test("keepBestQuality policy keeps each cluster's quality argmax") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val cfg = CorpusPipeline.Config(keepBestQuality = true)
    val annotated = CorpusPipeline.exactDedup(CorpusPipeline.qualityGate(
      CorpusPipeline.annotate(docs, cfg), cfg), cfg)
    val pairs = CorpusPipeline.nearDupPairs(annotated, cfg)
    val comp = graft.operators.Dedup.connectedComponents(pairs)
    val kept = CorpusPipeline.nearDedup(annotated, cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // each component's kept member has the max quality (ties: min id)
    val byComp = comp.join(annotated.withColumnRenamed("doc_id", "id"),
        Seq("id"))
      .select(col("component"), col("id"), col("quality"))
      .collect().groupBy(_.getLong(0))
    byComp.foreach { case (_, rows) =>
      val winner = rows.map(r => (r.getLong(1), r.getDouble(2)))
        .minBy { case (id, q) => (-q, id) }
      val keptInComp = rows.map(_.getLong(1)).filter(kept)
      assert(keptInComp.toSeq == Seq(winner._1))
    }
  }

  test("maxPerSource caps any one domain's share of the corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val cfg = CorpusPipeline.Config(maxPerSource = Some(5))
    val out = CorpusPipeline.curate(docs, cfg)
    val sizes = out.groupBy("source").count().collect().map(_.getLong(1))
    assert(sizes.nonEmpty && sizes.forall(_ <= 5))
  }

  test("round-8 gates: entropy band, classifier threshold, substring cap") {
    // 16-token boilerplate run: in a 20-token doc that is 11 of 15
    // 6-gram positions duplicated (0.73 > the 0.5 cap)
    val boiler = "standard license header text granted free of charge to " +
      "any person obtaining a copy of this"
    val docs = Seq(
      (1L, "a genuinely informative document about query planning in spark"),
      (2L, s"$boiler plus trailing words one"),
      (3L, s"$boiler and differing suffix two"),
      (4L, "zzzz zzzz zzzz zzzz zzzz zzzz") // near-zero entropy
    ).toDF("doc_id", "text")
    val w = graft.operators.Scoring.dyadicWeights(64)
    val cfg = CorpusPipeline.Config(
      minQuality = 0.0, minTokens = 3, maxRepetition = 1.0,
      nearDupThreshold = 0.95,
      minEntropy = 2.0, // kills doc 4 (few distinct chars)
      classifierWeights = Some((w, 4.0)), // bias 4 -> everyone passes
      minClassifierProb = 0.5,
      maxSubstringDupRatio = Some(0.5), substringK = 6)
    val out = CorpusPipeline.curate(docs, cfg)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(4L)) // entropy gate
    // docs 2,3 share an 8-token boilerplate run: >50% of their 6-gram
    // positions are duplicated -> substring cap drops BOTH
    assert(!ids.contains(2L) && !ids.contains(3L))
    assert(ids.contains(1L))
    assert(out.columns.contains("char_entropy"))
    assert(out.columns.contains("classifier_prob"))
    // a hostile classifier bias gates everything
    val strict = CorpusPipeline.curate(docs,
      cfg.copy(classifierWeights = Some((w, -4.0))))
    assert(strict.count() == 0L)
  }

  test("round-8 late gates: script allowlist, PII ceiling, boilerplate") {
    val docs = Seq(
      (1L, "s1", "NAVBAR\nan informative document about query planning\nFOOTER"),
      (2L, "s1", "NAVBAR\nanother genuinely useful document body here\nFOOTER"),
      (3L, "s1", "NAVBAR\nthird body text with enough distinct words\nFOOTER"),
      (4L, "s1", "NAVBAR\nПривет мир Привет мир Привет мир документ\nFOOTER"),
      (5L, "s1", "NAVBAR\ncontact me at a@b.org or 10.0.0.1 with card " +
        "4111111111111111 attached\nFOOTER")
    ).toDF("doc_id", "source", "text")
    val cfg = CorpusPipeline.Config(
      minQuality = 0.0, minTokens = 3, maxRepetition = 1.0,
      nearDupThreshold = 0.95,
      allowedScripts = Some(Set("latin")),
      maxPiiHits = Some(0L),
      stripBoilerplate = true)
    val out = CorpusPipeline.curate(docs, cfg).cache()
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(4L)) // cyrillic-dominant under latin allowlist
    assert(!ids.contains(5L)) // 3 PII hits > 0 ceiling
    assert(ids === Set(1L, 2L, 3L))
    // the template lines were stripped BEFORE signals: no NAVBAR/FOOTER
    out.select("text").collect().foreach { r =>
      assert(!r.getString(0).contains("NAVBAR"))
      assert(!r.getString(0).contains("FOOTER"))
    }
    // and without stripping, the same corpus keeps its templates
    val keep = CorpusPipeline.curate(docs,
      cfg.copy(stripBoilerplate = false))
    assert(keep.filter(col("text").contains("NAVBAR")).count() > 0)
    out.unpersist()
  }

  test("compression-ratio band gates repetition below and noise above") {
    val rnd = new scala.util.Random(42) // seeded: deterministic spec
    val noise =
      (0 until 200).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    // prose long enough for deflate history to engage — very short docs
    // sit near ratio 1 regardless of quality, so a band gate belongs
    // after a minTokens floor in practice
    val docs = Seq(
      (1L, "a genuinely informative document about query planning today, " +
        "covering how the optimizer pushes filters toward the scan, why " +
        "broadcast joins beat shuffles for small dimensions, and when " +
        "adaptive execution re-plans a skewed exchange at runtime; the " +
        "closing section compares partition pruning strategies across " +
        "several storage layouts and their maintenance costs"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam " +
        "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, s"noise payload $noise")
    ).toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(
      minQuality = 0.0, minTokens = 1, maxRepetition = 1.0,
      nearDupThreshold = 0.95,
      minCompressionRatio = 0.25, maxCompressionRatio = 0.75)
    val out = CorpusPipeline.curate(docs, cfg)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L))
    assert(out.columns.contains("compression_ratio"))
  }

  test("LM-perplexity band: reference-fitted model gates rare-word noise") {
    val ref = spark.read.parquet(s"$sf001/documents.parquet")
    val docs = Seq(
      (1L, "table join hash row scan batch window group order value data"),
      (2L, "xylophone quixotic zephyr bandersnatch vorpal jabberwock " +
        "galumphing frabjous borogoves mimsy")).toDF("doc_id", "text")
    // calibrate the band from the corpus-typical doc's own pplx
    val m = graft.operators.LangModel.train(ref, "text", 512)
    val typical = graft.operators.LangModel
      .scoreDocs(docs, "doc_id", "text", m)
      .filter(col("doc_id") === 1).head().getDouble(3)
    val cfg = CorpusPipeline.Config(
      minQuality = 0.0, minTokens = 3, maxRepetition = 1.0,
      nearDupThreshold = 0.95,
      lmRef = Some(ref), lmPplxBand = (0.0, typical * 2.0))
    val out = CorpusPipeline.curate(docs, cfg)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L))
    assert(out.columns.contains("pplx"))
  }

  test("annotate + quality gates run UNCHANGED on a file stream") {
    // every annotate signal and every round-8 gate (script, PII,
    // compression band) is a stateless map — so the same code is legal
    // in Structured Streaming with no rewrite. (Boilerplate, LM, and
    // dedup stages aggregate/join across docs and stay batch/foreachBatch.)
    val dir = java.nio.file.Files
      .createTempDirectory("gates_stream").toString
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(200)
    docs.write.mode("overwrite").parquet(dir)
    val cfg = CorpusPipeline.Config(
      allowedScripts = Some(Set("latin")),
      maxPiiHits = Some(5L),
      minCompressionRatio = 0.05, maxCompressionRatio = 0.99)
    val stream = spark.readStream
      .schema(docs.schema).parquet(dir)
    val gated = CorpusPipeline.qualityGate(
      CorpusPipeline.annotate(stream, cfg), cfg)
    assert(gated.isStreaming)
    val q = gated.writeStream.format("memory").queryName("gates_mem")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("gates_mem")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = CorpusPipeline.qualityGate(
      CorpusPipeline.annotate(docs, cfg), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("multimodal decode features flow into embedding near-dup") {
    // cross-module integration: decoded media features are an embedding
    // column like any other — dedup operators apply unchanged
    val media = Multimodal.syntheticMedia(spark, 20)
    val feats = Multimodal.decode(media).toDF()
      .select(col("media_id"), col("feature"))
    val doubled = feats.union(
      feats.withColumn("media_id", col("media_id") + 1000))
    val pairs = graft.operators.Dedup.embeddingNearDups(
      doubled, "media_id", "feature", dim = 8,
      threshold = 0.999999, numPlanes = 6)
    val found = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted copy pair (i, i+1000) must be found
    assert((0L until 20L).forall(i => found.contains((i, i + 1000))))
  }
}
