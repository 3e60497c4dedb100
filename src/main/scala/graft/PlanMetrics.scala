package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Executed-plan metric harvesting: run a frame, then read the REAL
  * executor-side SQL metrics off the (AQE-final) physical plan — shuffle
  * bytes/records actually moved, not plan-shape guesses. This is the
  * number that decides whether an operator survives a 100 TB run: a plan
  * with 3 exchanges that move 1% of the input beats a 1-exchange plan
  * that moves everything.
  */
object PlanMetrics {

  final case class ShuffleSummary(
      exchanges: Int, shuffleBytes: Long, shuffleRecords: Long)

  /** Execute `df` (full plan, nothing collected to the driver beyond
    * metric values) and sum shuffle-write metrics across all exchanges,
    * including those hidden inside AQE query stages. */
  def shuffleSummary(df: DataFrame): ShuffleSummary = {
    val qe = df.queryExecution
    qe.executedPlan.execute().foreach(_ => ()) // run to populate metrics
    var exchanges = 0
    var bytes = 0L
    var records = 0L
    // An exchange reused across AQE stages appears once per consumer in the
    // tree (wrapped in ReusedExchangeExec) but moves data exactly once —
    // count by object identity so reuse-heavy plans aren't inflated.
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case r: ReusedExchangeExec => walk(r.child)
        case sh: ShuffleExchangeLike =>
          if (seen.add(sh)) {
            exchanges += 1
            sh.metrics.get("shuffleBytesWritten")
              .orElse(sh.metrics.get("bytesWritten"))
              .foreach(m => bytes += m.value)
            sh.metrics.get("shuffleRecordsWritten")
              .orElse(sh.metrics.get("recordsWritten"))
              .foreach(m => records += m.value)
            sh.children.foreach(walk)
          }
        case other => other.children.foreach(walk)
      }
    }
    walk(qe.executedPlan)
    ShuffleSummary(exchanges, bytes, records)
  }
}
