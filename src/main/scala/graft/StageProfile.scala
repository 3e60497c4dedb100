package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one declared query: per-stage wall time, task
  * count, total executor time, max/sum task skew, and shuffle volume —
  * the "which stage is the bottleneck, and is it parallel?" answer that
  * a wall-clock total hides. Usage:
  *   runMain graft.StageProfile <sfDir> <queryName> [runs]
  * Env: SPARK_GRAFT_CPUS (default 32). Prints a CSV sorted by total
  * executor time, worst first. A stage whose maxTask ≈ wallMs while
  * sumTaskMs ≈ maxTask is a ONE-TASK stage — the 1000-executor cluster
  * would idle through it. */
object StageProfile {

  private final case class St(
      name: String, wallMs: Long, tasks: Int, sumTaskMs: Long,
      maxTaskMs: Long, shufReadRec: Long, shufWriteRec: Long,
      shufWriteMb: Double)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT", "128m"))
      // match Bench's AQE coalescing floor so profiles see bench plans
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "256k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_EXPLAIN_EXEC: print the executed plan of EVERY query
    // execution via a listener — unlike SPARK_GRAFT_EXPLAIN (which must
    // switch the action to collect to finalize the retained
    // queryExecution), this captures the plan of the COUNT action the
    // bench actually times, whose column pruning can differ enough to
    // change exchange reuse (the q175 round-20 finding).
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN_EXEC"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            println(s"=== executed ($funcName) ===\n" +
              qe.executedPlan.toString)
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
    val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAccumulator]()
    val stages = java.util.Collections.synchronizedList(
      new java.util.ArrayList[St]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val d = t.taskInfo.duration
        taskMs.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.atomic.LongAdder).add(d)
        taskMax.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.atomic.LongAccumulator(Math.max _, 0L))
          .accumulate(d)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(0L)
        stages.add(St(
          i.name.takeWhile(_ != '\n').take(70), wall, i.numTasks,
          Option(taskMs.get(i.stageId)).map(_.sum).getOrElse(0L),
          Option(taskMax.get(i.stageId)).map(_.get).getOrElse(0L),
          m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten,
          m.shuffleWriteMetrics.bytesWritten / 1e6))
      }
    })
    // warm-up so JIT/codegen doesn't land on the profiled run
    spark.read.parquet(s"$dir/documents.parquet").count()
    var wall = 0.0
    for (_ <- 0 until runs) {
      stages.clear(); taskMs.clear(); taskMax.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      // The driving action is part of the plan being profiled, so make
      // it explicit: count() (default) matches what Bench times — its
      // pruned final projection / dropped top-level sort is exactly the
      // plan behind every BENCH number this profiler explains.
      // SPARK_GRAFT_PROFILE_ACTION=collect instead materializes full
      // rows like Verify's parquet dump (tail selects and global sorts
      // included) — use it when profiling the verify path, but note a
      // pair-report query at the 10× synthesis can return tens of
      // millions of rows, which count() absorbs and a driver collect
      // does not. EXPLAIN mode forces collect: count() runs a SEPARATE
      // internal query execution, leaving the retained
      // df.queryExecution un-executed (its AQE plan never finalizes),
      // so printing it after a count would show an isFinalPlan=false
      // initial plan that matches nothing that ran.
      val collectRows =
        sys.env.get("SPARK_GRAFT_PROFILE_ACTION").contains("collect") ||
          sys.env.contains("SPARK_GRAFT_EXPLAIN")
      val n = if (collectRows) df.collect().length.toLong else df.count()
      wall = (System.nanoTime() - t0) / 1e9
      println(f"== $name on $dir: $n rows, $wall%.2f s")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(df.queryExecution.executedPlan.toString)
    }
    Thread.sleep(500) // let the async listener bus drain
    println("stage,wallMs,tasks,sumTaskMs,maxTaskMs,shufReadRec," +
      "shufWriteRec,shufWriteMb")
    import scala.jdk.CollectionConverters._
    stages.asScala.sortBy(-_.sumTaskMs).take(20).foreach { s =>
      println(s"${s.name.replace(',', ';')},${s.wallMs},${s.tasks}," +
        s"${s.sumTaskMs},${s.maxTaskMs},${s.shufReadRec}," +
        s"${s.shufWriteRec},${f"${s.shufWriteMb}%.1f"}")
    }
  }
}
