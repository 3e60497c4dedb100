package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling / splitting operators for training-data pipelines.
  *
  * The core primitive is HASH-based assignment (`md5` of a key column):
  * deterministic across runs, engines, and cluster layouts — unlike
  * `df.sample`/`randomSplit`, whose partition-seeded RNG changes with the
  * physical plan. Hash splits are reproducible lineage: a row's split
  * never changes when data is re-partitioned, backfilled, or re-ordered.
  */
object Sampling {

  /** Bucket in [0, buckets) from the md5 of the key — stable everywhere.
    * (First 4 hex chars → 16 bits → modulo; md5 is uniform enough for
    * split purposes and exists in every engine.) */
  def hashBucket(key: Column, buckets: Int): Column =
    (graft.functions.PortableHash.md5Prefix(key.cast("string"), 4)
      .cast("int") % buckets + buckets) % buckets

  /** Deterministic train/holdout flag: true ≈ trainFraction of rows. */
  def isTrain(key: Column, trainFraction: Double = 0.8,
      buckets: Int = 1000): Column =
    hashBucket(key, buckets) < (trainFraction * buckets).toInt

  /** Leakage-safe train/holdout split: a near-duplicate of a training
    * doc in the holdout set leaks training data into evaluation, so the
    * split must be decided per near-dup CLUSTER, not per doc. The split
    * key is the doc's connected-component label over the verified
    * near-dup `pairs` graph (its cluster representative), falling back
    * to the doc's own id for unpaired docs; assignment is then the same
    * deterministic md5 bucket as [[trainTestSplit]], so every member of
    * a cluster lands in the SAME split by construction.
    *
    * Plan: components over the (tiny) verified-pair graph, one left
    * equi-join of the corpus against the component map, and the
    * stateless hash flag — a single corpus shuffle.
    *
    * @return df plus (split_key, split) columns, split ∈ {train, eval}.
    */
  def leakageSafeSplit(
      df: DataFrame, idCol: String, pairs: DataFrame,
      trainFraction: Double = 0.8): DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "__cc_id")
    df.join(comp, df(idCol) === comp("__cc_id"), "left")
      .withColumn("split_key", coalesce(col("component"), col(idCol)))
      .withColumn("split",
        when(isTrain(col("split_key"), trainFraction), "train")
          .otherwise("eval"))
      .drop("__cc_id", "component")
  }

  /** Leakage-safe k-fold assignment for cross-validation: adds a
    * `fold` column in [0, k) from the md5 bucket of `groupCol`, so
    * EVERY row sharing the group key (a user id, a domain, a dedup
    * cluster representative — for the cluster-aware form pass
    * [[leakageSafeSplit]]'s split_key) lands in the SAME fold and no
    * fold ever trains on another fold's near-duplicate or
    * same-entity rows. Deterministic and layout/engine-independent
    * like every sampler here (md5 of the key string), approximately
    * equal-sized folds at high key cardinality, and MAP-ONLY — no
    * shuffle; fold-filtered scans stay embarrassingly parallel at any
    * corpus size. A null group key yields a null fold (kept visible,
    * not silently dropped — the caller decides). */
  def kFold(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn("fold", hashBucket(col(groupCol), k))
  }

  /** Split a frame into (train, holdout) on a key column. */
  def trainTestSplit(
      df: DataFrame, keyCol: String,
      trainFraction: Double = 0.8): (DataFrame, DataFrame) = {
    val flag = isTrain(col(keyCol), trainFraction)
    (df.filter(flag), df.filter(!flag))
  }

  /** Weighted deterministic sampling: keep each row with probability
    * `weight` (a per-row column in [0,1]), decided by the row's hash
    * bucket — reproducible Bernoulli without RNG state. Standard use:
    * quality-weighted corpus downsampling. */
  def weightedSample(
      df: DataFrame, keyCol: String, weight: Column,
      buckets: Int = 1000000): DataFrame =
    df.filter(
      hashBucket6(col(keyCol), buckets) <
        least(greatest(weight, lit(0.0)), lit(1.0)) * buckets)

  /** hashBucket with 6 hex chars (24 bits) for fine-grained weights. */
  def hashBucket6(key: Column, buckets: Int): Column =
    (graft.functions.PortableHash.md5Prefix(key.cast("string"), 6)
      % buckets + buckets) % buckets

  /** Deterministic global shuffle for training-order randomization: a
    * total order by md5(seed ++ key). The sort is Spark's distributed
    * range-partitioned sort — no global window, no single-partition
    * stage — and the position of a row depends only on (seed, key), never
    * on physical layout, so epochs are reproducible across clusters.
    * Different seeds give independent epoch orders.
    *
    * CONTRACT: `keyCol` values must be UNIQUE. Rows sharing a key get
    * identical sort keys, and their relative order then depends on
    * physical layout — exactly the nondeterminism this operator exists
    * to remove. Build a composite key first when no natural unique key
    * exists (see [[graft.pipeline.CorpusPipeline.epochOrder]]). */
  def deterministicShuffle(
      df: DataFrame, keyCol: String, seed: String): DataFrame = {
    require(!df.columns.contains("shuffle_key"),
      "deterministicShuffle adds a shuffle_key column; input already has one")
    df.withColumn("shuffle_key",
      md5(concat(lit(seed), col(keyCol).cast("string"))))
      .orderBy(col("shuffle_key"))
  }

  /** Per-group cap: keep at most `k` rows of every group (the
    * docs-per-domain / docs-per-source ceiling of a data recipe —
    * protects the mixture from a single crawled site dominating it).
    * Which rows survive is decided by 60-bit md5-prefix hash order on
    * the key (ties by key) — deterministic, layout-independent, and
    * replayable in SQL as
    * `('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT`.
    * Same keyCol-uniqueness contract as [[balanceClasses]]; keyCol must
    * be castable to string and carry an exact order-preserving tie
    * mapping (integral, string, decimal p ≤ 18, date/timestamp,
    * boolean — see [[samplerTie]]; anything else fails fast, validated
    * up front so the failure is data-independent). Rows with a NULL key
    * are DROPPED — a null key already violates the uniqueness contract
    * (every null ties), and the hash-ordered survivor set would be
    * nondeterministic for them; the drop is counted by a
    * `graft.sampling.cap_per_group.N` observe metric
    * (`null_key_rows_dropped`), never silent.
    *
    * Rides the heap-based [[graft.plans.TopKPerGroupExec]]: O(n log k)
    * per partition, no sort, one exchange on the group column. The
    * previous `row_number` window formulation SORTED every group in
    * full — on a dup-heavy crawl a single hot domain is exactly where
    * the cap matters and exactly where that sort hurts. */
  def capPerGroup(
      df: DataFrame, keyCol: String, groupCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tie = samplerTie(df, keyCol)
    // The null-key drop is deliberate (see scaladoc) but must not be
    // silent: a paired observe metric reports the dropped count per run
    // (read it via ObservedLog / QueryExecutionListener), same
    // no-silent-caps contract as the fuzzy-join caps.
    ObservedLog.ensure(df.sparkSession)
    val n = samplerMetricSeq.incrementAndGet()
    val nonNull = df
      .observe(s"graft.sampling.cap_per_group.$n",
        sum(when(col(keyCol).isNull, 1L).otherwise(0L))
          .as("null_key_rows_dropped"))
      .filter(col(keyCol).isNotNull)
    // TopK ranks order DESC; negate the 60-bit hash for ascending order
    val hashed = nonNull
      .withColumn("__ord",
        -graft.functions.PortableHash.md5Prefix(col(keyCol).cast("string"), 15))
      .withColumn("__tie", tie)
    graft.plans.TopKPerGroup
      .perKey(hashed, Seq(groupCol), "__ord", "__tie", k)
      .drop("__ord", "__tie")
  }

  /** Per-invocation suffix for observe() metric names (Spark rejects two
    * CollectMetrics nodes sharing a name in one plan). */
  private val samplerMetricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Tie mapping for the hash-ordered samplers, validated UP FRONT so a
    * bad key type fails data-independently (the same call must not
    * succeed or throw depending on which arm the data volume selects).
    * Accepts every type with an exact order-preserving mapping
    * ([[graft.plans.TopKPerGroup.tieExpr]]): integral, string,
    * decimal p ≤ 18, date/timestamp, boolean. */
  private def samplerTie(df: DataFrame, keyCol: String): Column =
    graft.plans.TopKPerGroup.tieExpr(df, keyCol).getOrElse(
      throw new IllegalArgumentException(
        s"sampler key column $keyCol has type " +
          s"${df.schema(keyCol).dataType.sql}, which has no exact " +
          "order-preserving tie mapping (supported: integral, string, " +
          "decimal(p<=18), date, timestamp, boolean) — build a " +
          "composite/string key first"))

  /** Heap-vs-window cutover for [[balanceClasses]]: the TopK heap holds
    * k row copies PER LABEL PER PARTITION in executor memory, which is
    * right when k is cap-sized and wrong when k is itself huge — the
    * window's sort spills, the heap cannot. 2²⁰ kept rows per class per
    * partition (~tens of MB of heap at typical row widths) is well
    * inside executor budgets; past it, the spillable sort wins. */
  private val balanceHeapMaxK = 1 << 20

  /** Keep exactly min-class-count rows of every class — the standard
    * rebalance before training a classifier on skewed labels — chosen
    * by 60-bit md5-prefix hash order on the key, ties by key (same
    * replayable order as [[capPerGroup]]): deterministic and
    * layout-independent, like every sampler here.
    *
    * Contract: `keyCol` must be UNIQUE within each label (like
    * [[deterministicShuffle]]'s key contract) — rows sharing a key tie
    * on the full sort key and which survives the cutoff becomes
    * layout-dependent; build a composite key first when no natural
    * unique key exists. Rows with a NULL key are excluded from BOTH the
    * class counts and the kept set (same reason as [[capPerGroup]]; and
    * counting them while not keeping them would leave classes short of
    * the advertised min count).
    *
    * EAGER: the cutoff (one scalar — the smallest class's count) is
    * collected at call time. Plan: when the EXPECTED per-partition kept
    * volume (cutoff × labels-per-shuffle-partition) is cap-sized
    * (≤ [[balanceHeapMaxK]]) the keep rides the heap-based
    * [[graft.plans.TopKPerGroup]] exec — the skewed-label case no
    * longer full-sorts its biggest class; past that (where heaps of k
    * row copies would not fit executor memory, and where
    * `row_number`'s spillable per-class sort is the right tool) it
    * falls back to the window form. The window arm ranks with the same
    * 60-bit order, so both arms keep the identical set. (Ranks are
    * Int-typed, so a single class beyond 2³¹ rows is outside either
    * arm's envelope.) */
  def balanceClasses(
      df: DataFrame, keyCol: String, labelCol: String): DataFrame = {
    // Key-type validation happens HERE, before the arm choice: the heap
    // arm's tie contract must not surface only when the data volume
    // happens to select it (the same call succeeding or throwing
    // depending on min class count × labels/partition is a
    // data-dependent failure). Both arms then rank the identical
    // mapped order.
    val tie = samplerTie(df, keyCol)
    // Reserved internal names, validated UP FRONT and for BOTH arms
    // (review catch, round 17): each arm adds its own helper columns,
    // so a collision would corrupt silently or throw ambiguity only
    // when the data volume selects that arm — the data-dependent
    // failure mode the tie validation above already refuses.
    // CASE-INSENSITIVE match (round-18 review catch, same fix as
    // quantileNormalize's guard): the default analyzer resolves
    // case-insensitively, so "__Ord"/"__TIE" would be silently
    // replaced by the helper withColumns if matched by exact string.
    val reserved = Seq("__ord", "__tie", "__rk",
      "__bsalt", "__bslt2", "__blbl", "__boff", "__bc")
    df.columns.filter(c => reserved.exists(_.equalsIgnoreCase(c)))
      .foreach { c =>
        throw new IllegalArgumentException(
          s"balanceClasses: input column name $c collides " +
            "(case-insensitively, the analyzer's default resolution) " +
            "with an internal helper column — rename it first")
      }
    // same no-silent-drops contract as capPerGroup: the null-key drop
    // is deliberate but observable — a paired observe metric reports
    // the dropped count per run
    ObservedLog.ensure(df.sparkSession)
    val nonNull = df
      .observe(
        s"graft.sampling.balance_classes.${samplerMetricSeq.incrementAndGet()}",
        sum(when(col(keyCol).isNull, 1L).otherwise(0L))
          .as("null_key_rows_dropped"))
      .filter(col(keyCol).isNotNull)
    val counts = nonNull.groupBy(col(labelCol))
      .agg(count(lit(1)).as("__class_n"))
      .agg(min(col("__class_n")).as("__min_n"),
        count(lit(1)).as("__labels"))
      .collect()
    // no rows → no classes → empty result, same as the window form
    if (counts.isEmpty || counts.head.isNullAt(0)) return df.limit(0)
    val minN = counts.head.getLong(0)
    val numLabels = counts.head.getLong(1)
    // The heap's memory is k row copies PER LABEL per partition, so the
    // cutover must bound k × labels-per-partition, not k alone — 1 000
    // labels of 10⁶ kept rows each would put several label heaps on one
    // partition. Expected labels/partition under hash distribution =
    // labels / shuffle partitions (skew adds a small factor; the 2²⁰
    // budget leaves headroom for it).
    val numPart =
      df.sparkSession.sessionState.conf.numShufflePartitions.toLong
    val perPartitionKept =
      minN * math.max(1L, (numLabels + numPart - 1) / numPart)
    // keep the SMALLEST hashes: window ranks the positive hash asc;
    // the heap (which keeps the LARGEST order values) gets its negation
    val hashAsc =
      graft.functions.PortableHash.md5Prefix(col(keyCol).cast("string"), 15)
    if (perPartitionKept > balanceHeapMaxK.toLong)
      // Salted two-phase rank (round 17 — measured, not presumed: the
      // r16 verdict asked for this site's own receipt either way).
      // The plain partitionBy(label) window ranks each label on ONE
      // task, and the arm only triggers when minN is huge — exactly
      // when a hot label is task-breaking. 100× lineitem probe
      // (x100only=qbalance_skewlabel, ~60M rows, hot label = 50 %):
      // unsalted vs salted receipts in SCALING.md round 17. The q182
      // counter-receipt (a second corpus md5 pass can beat its
      // parallelism win) doesn't transfer here: what the salt removes
      // is a corpus-sized single-task SORT (the q187 shape), not a
      // bounded-frame cumsum.
      balanceKeepWindow(nonNull, keyCol, labelCol, hashAsc, minN,
        hintBroadcastOffsets = numLabels <= 4096L)
    else
      graft.plans.TopKPerGroup
        .perKey(nonNull.withColumn("__ord", -hashAsc)
            .withColumn("__tie", tie),
          Seq(labelCol), "__ord", "__tie", minN.toInt)
        .drop("__ord", "__tie")
  }

  /** Big-minN arm of [[balanceClasses]]: keep the `minN` first rows of
    * every label in (`hashAsc` asc, key asc) order, ranked by the
    * salted two-phase form ([[Selection.curriculumSchedule]]'s round-16
    * rework, applied here round 17 with its own 100× receipt —
    * SCALING.md): salt = the top 6 bits of the 60-bit order key, which
    * is MONOTONE in the key (every row of salt s sorts before every row
    * of salt s+1, and equal keys share a salt), so
    *
    *   rank = Σ counts(label, salts below) + rank within (label, salt)
    *
    * is bit-identical to the single-partition `row_number` while
    * ranking on |labels| × 64 tasks instead of one task per label. The
    * per-(label, salt) counts cost one extra map-combined corpus pass
    * (bounded |labels| × 64 output); what they buy is removing the
    * corpus-sized single-task sort of the hottest label. The offsets
    * frame is broadcast-hinted only when the CALLER knows |labels| is
    * small (`hintBroadcastOffsets`) — it is data-dependent, so an
    * unconditional hint could melt the driver on a high-cardinality
    * label column (the q190 no-hint lesson).
    *
    * Package-visible so the parity spec can pin salted == plain
    * single-window rank without manufacturing 2²⁰-row classes. */
  private[graft] def balanceKeepWindow(
      nonNull: DataFrame, keyCol: String, labelCol: String,
      hashAsc: Column, minN: Long,
      hintBroadcastOffsets: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = nonNull
      .withColumn("__bsalt", shiftright(hashAsc, 54).cast("int"))
    val offW = Window.partitionBy(col(labelCol)).orderBy(col("__bsalt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // bounded frame: ≤ |labels| × 64 rows; the cumulative window over
    // it partitions by label (≤ 64 rows per partition by construction).
    // The label side is RENAMED and joined NULL-SAFELY below: a null
    // label is a legal class (both sibling arms rank it — the heap
    // exec hash-clusters nulls, the old window partitioned on them),
    // and a plain using-join's null-rejecting equality silently
    // dropped the whole null-label class in exactly one arm (review
    // catch, round 17 — an arm-dependent answer divergence, the class
    // this file's own up-front validation exists to prevent).
    val offsetsRaw = salted.groupBy(col(labelCol), col("__bsalt"))
      .agg(count(lit(1)).as("__bc"))
      .withColumn("__boff", coalesce(sum(col("__bc")).over(offW), lit(0L)))
      .select(col(labelCol).as("__blbl"), col("__bsalt").as("__bslt2"),
        col("__boff"))
    val offsets =
      if (hintBroadcastOffsets) broadcast(offsetsRaw) else offsetsRaw
    val rankW = Window.partitionBy(col(labelCol), col("__bsalt"))
      .orderBy(hashAsc.asc, col(keyCol))
    salted.join(offsets,
        col(labelCol) <=> col("__blbl") && col("__bsalt") === col("__bslt2"))
      .withColumn("__rk",
        row_number().over(rankW).cast("long") + col("__boff"))
      .filter(col("__rk") <= minN)
      // the join widens the frame; restore the input columns and order
      // (the heap arm and the old single-window arm both preserve it)
      .select(nonNull.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic per-stratum downsampling: keep ≈`fraction(stratum)` of
    * rows inside each stratum, hash-assigned on the key. */
  def stratifiedSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double],
      buckets: Int = 1000): DataFrame = {
    val keep = fractions.foldLeft(lit(false)) {
      case (acc, (stratum, frac)) =>
        acc || (col(stratumCol) === stratum &&
          hashBucket(col(keyCol), buckets) < (frac * buckets).toInt)
    }
    df.filter(keep)
  }

  /** Neyman optimal allocation (Neyman 1934): split a sample `budget`
    * across strata ∝ N_h·σ_h — the allocation that minimizes the
    * variance of the stratified mean for a fixed total n. The survey-
    * sampling answer to "this quality-probe budget is fixed; how many
    * docs do I audit per source?" — high-variance strata earn more than
    * their population share.
    *
    * `valueCol` must be INTEGRAL (token/char counts — the pipeline
    * case); everything up to the square root is then exact DECIMAL(38,0)
    * integer arithmetic, immune to partial-aggregation order. The Neyman
    * weight is w_h = N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) — one correctly-
    * rounded sqrt per stratum on an exactly-computed integer, scaled to
    * ppm and floored back to integers, so the final floor-divided
    * allocation is bit-deterministic across engines.
    *
    * Scale shape: ONE map-combined groupBy over the corpus (count, Σx,
    * Σx² per stratum — three longs of state); the allocation itself is
    * window math over the |strata|-row frame (single-partition window on
    * a bounded frame — documented, like budgetWaterfill's solve).
    * Zero-variance strata get alloc 0 (the Neyman optimum — their mean
    * is known from any single row); an all-constant corpus (total weight
    * 0) allocates 0 everywhere rather than dividing by zero.
    *
    * Rows with a NULL value are EXCLUDED before the aggregate (a row
    * with no measurement carries no variance information): counting
    * them in N while the sums skip them would inflate N·Σx² − (Σx)²
    * and grant unmeasured strata budget they haven't earned. n_rows is
    * therefore the MEASURED row count; a stratum with only null values
    * vanishes from the allocation (nothing to audit-sample by length).
    *
    * Output per stratum: (stratumCol, n_rows, sigma, alloc) — sigma is
    * the population σ_h floored to 6 decimals from the ppm integer the
    * allocation actually used (w_ppm DIV N), so the reported σ and the
    * allocation can never disagree. */
  def neymanAllocation(
      df: DataFrame, stratumCol: String, valueCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val perStratum = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(38,0)")).as("__s1"),
        sum((col(valueCol).cast("decimal(19,0)") *
          col(valueCol).cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("__s2"))
      // N·Σx² − (Σx)² = N²·Var (population) — exact in DECIMAL(38,0)
      .withColumn("__varnum",
        expr("CAST(n_rows AS DECIMAL(38,0)) * __s2 - __s1 * __s1"))
      // w_ppm = round(10⁶·sqrt(varnum)) = round(10⁶·N·σ): ONE double
      // sqrt of an exactly-represented integer (exact for varnum <
      // 2⁵³; beyond that both engines see the same correctly-rounded
      // double), then back to integer ppm for the division below.
      .withColumn("__w_ppm",
        round(sqrt(col("__varnum").cast("double")) * 1e6, 0)
          .cast("decimal(38,0)"))
    val totalW = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perStratum
      .withColumn("__tot", sum(col("__w_ppm")).over(totalW))
      .withColumn("alloc",
        when(col("__tot") === 0, lit(0L)).otherwise(
          expr(s"CAST($budget AS DECIMAL(38,0)) * __w_ppm DIV __tot")
            .cast("long")))
      .withColumn("sigma",
        (expr("__w_ppm DIV n_rows").cast("long").cast("double") / 1e6))
      .select(col(stratumCol), col("n_rows"), col("sigma"), col("alloc"))
  }
}
