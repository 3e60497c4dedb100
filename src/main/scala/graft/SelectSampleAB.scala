package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B receipt for VERDICT r15 finding #2: when a caller runs DSIR
  * select-AND-sample in ONE job (keep the high-weight docs *and* draw a
  * Gumbel top-k sample — both consumers of the same scored frame), does
  * localCheckpointing the scored frame beat re-executing the scoring
  * chain per consumer?
  *
  * The scored frame is per-doc (idCol, n_grams, log_w) — corpus-CARDINAL
  * but 3 columns wide, so materializing it is cheap relative to the two
  * gram-explode aggregates + broadcast-scoring pass that produce it.
  * Variant `rerun` executes that chain once per consumer (Spark's
  * default for a shared lazy frame); variant `ckpt` executes it once
  * into a localCheckpoint and feeds both consumers from the
  * materialized blocks.
  *
  * Consumers mirror the real recipe: (a) SELECT — count docs above a
  * log-weight threshold (the q179-style keep decision), (b) SAMPLE —
  * Gumbel top-k (q183's resample). Alternating A/B order per rep, warm
  * JVM, median-of-reps printed for SCALING.md.
  */
object SelectSampleAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // absorb scan warm-up

    def scored(): DataFrame = graft.operators.Selection.importanceWeights(
      docs, docs.filter(col("source") === "src13").select(col("text")),
      "doc_id", "text", numBuckets = 1024)

    // Content-bearing answers, not counts (ADVICE r16: the sample
    // count is min(k, n) for both variants regardless of WHICH ids were
    // drawn, so a count-only identity check validated nothing about
    // the sampled set). kept rides a crc32-of-id checksum folded with
    // sum (order-free, one aggregate over the kept slice); the 50
    // sampled ids are small enough to compare verbatim, sorted.
    def consume(frame: DataFrame): (Long, Long, String) = {
      val keptRow = frame.filter(col("log_w") > 0)
        .agg(count(lit(1)), sum(crc32(col("doc_id").cast("string"))))
        .collect()(0)
      val kept = keptRow.getLong(0)
      val keptCksum = if (keptRow.isNullAt(1)) 0L else keptRow.getLong(1)
      val sampledIds = graft.operators.Selection
        .gumbelTopK(frame, "doc_id", "log_w", 50, "q183")
        .select(col("doc_id").cast("string"))
        .collect().map(_.getString(0)).sorted.mkString(",")
      (kept, keptCksum, sampledIds)
    }

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    var rerunTimes = Vector.empty[Double]
    var ckptTimes = Vector.empty[Double]
    var answers = Set.empty[(Long, Long, String)]
    (1 to reps).foreach { rep =>
      val order = if (rep % 2 == 1) Seq("rerun", "ckpt") else Seq("ckpt", "rerun")
      order.foreach {
        case "rerun" =>
          val (t, a) = time(consume(scored()))
          rerunTimes :+= t; answers += a
          println(f"[ab] rep=$rep rerun=$t%6.3f s (kept=${a._1}, " +
            f"kept_cksum=${a._2}, sampled_ids=${a._3.hashCode})")
        case "ckpt" =>
          // measure the SHIPPED helper, not an inline re-implementation
          // — if importanceWeightsShared's materialization strategy
          // ever changes, this receipt must track it
          val (t, a) = time {
            val ck = graft.operators.Selection.importanceWeightsShared(
              docs, docs.filter(col("source") === "src13")
                .select(col("text")),
              "doc_id", "text", numBuckets = 1024)
            val r = consume(ck)
            ck.unpersist(true)
            r
          }
          ckptTimes :+= t; answers += a
          println(f"[ab] rep=$rep ckpt =$t%6.3f s (kept=${a._1}, " +
            f"kept_cksum=${a._2}, sampled_ids=${a._3.hashCode})")
      }
    }
    def med(v: Vector[Double]): Double = {
      val s = v.sorted; s(s.length / 2)
    }
    println(f"[ab] MEDIAN rerun=${med(rerunTimes)}%6.3f s  " +
      f"ckpt=${med(ckptTimes)}%6.3f s  " +
      f"ratio=${med(ckptTimes) / med(rerunTimes)}%5.3f  " +
      s"answer_sets=${answers.size} (must be 1)")
    // self-checking receipt: a divergence must FAIL the run, not scroll
    // by above a plausible-looking MEDIAN line
    require(answers.size == 1,
      s"rerun and ckpt variants disagreed: $answers")
    spark.stop()
  }
}
