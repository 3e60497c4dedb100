package graft

import org.apache.spark.sql.SparkSession

/** First-run-cost attribution probe for bench tail spikes. Runs ONE
  * declared query N times in THIS (fresh) JVM and prints, per run, the
  * costs that are invisible to stage metrics:
  *
  *  - wall seconds
  *  - Janino compile count + total ms delta (CodegenMetrics — the
  *    synchronous, driver-side generated-code compile cost)
  *  - JVM JIT compilation-time delta (CompilationMXBean — background
  *    C1/C2 threads; large deltas mean the run competed with the JIT
  *    for cores, the "first sweep of a 171-query bench" effect)
  *  - GC seconds delta
  *
  * A spike that is (run1 − run2) ≈ janino_ms + jit_ms is cold-start
  * compile cost, not a plan regression — the class the round-13
  * spread_flag mechanism over-reported (all 14 flagged worsts sat on
  * sweep 1). Usage:
  *   runMain graft.TailProbe <sfDir> <queryName> [runs=3] [context]
  * `context` first executes every declared query that PRECEDES
  * queryName in bench order once (untimed), reproducing the bench's
  * sweep-1 JVM state (compile backlog, heap pressure) so the probed
  * first run is comparable to the flagged one. */
object TailProbe {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).filter(_ >= 0).sum
  }

  private def jitMillis(): Long = {
    val c = java.lang.management.ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported)
      c.getTotalCompilationTime
    else -1L
  }

  // Janino compile totals from Spark's codegen metrics source. The
  // histogram reservoir holds up to 1028 raw values: summing snapshot
  // values and diffing across runs is exact ONLY while the JVM's total
  // compile count stays under that — true for a standalone probed
  // query (tens of compiles), FALSE in `context` mode, where the ~178
  // preceding queries blow past the reservoir and each insert evicts a
  // random prior value (a sum delta can even go negative). The count
  // is a plain Counter and stays exact always; callers get ms = -1
  // once the sum is reservoir-corrupted rather than a wrong number.
  private def janino(): (Long, Long) = {
    val h = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    (h.getCount, h.getSnapshot.getValues.sum)
  }
  private val reservoirSize = 1028L

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    // runs is the first NUMERIC trailing arg — `<sfDir> <query> context`
    // must not feed "context" to toInt (positional parsing crashed it)
    val runs = args.drop(2).find(_.forall(_.isDigit)).map(_.toInt)
      .getOrElse(3)
    val context = args.contains("context")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.silenceKnownBoundedWindowWarn()
    if (context) {
      val names = SparkEntry.queries.keys.toSeq
      val before = names.takeWhile(_ != name)
      println(s"[tailprobe] context: running ${before.size} " +
        "preceding queries once")
      before.foreach { n =>
        try SparkEntry.queries(n)(spark, dir).count()
        catch { case _: Throwable => () }
      }
    }
    for (i <- 1 to runs) {
      val (jn0, jm0) = janino()
      val jit0 = jitMillis(); val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (jn1, jm1) = janino()
      // -1 = reservoir-corrupted (see janino()): past 1028 total
      // compiles the snapshot sum is no longer a faithful total
      val janinoMs = if (jn1 <= reservoirSize) jm1 - jm0 else -1L
      println(f"""{"query":"$name","run":$i,"context":$context,""" +
        f""""wall_s":$wall%.3f,"rows":$n,""" +
        f""""janino_n":${jn1 - jn0},"janino_ms":$janinoMs,""" +
        f""""jit_ms":${jitMillis() - jit0},""" +
        f""""gc_s":${(gcMillis() - gc0) / 1e3}%.3f}""")
    }
    spark.stop()
  }
}
