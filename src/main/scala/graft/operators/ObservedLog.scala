package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Lazily-logged dataset metrics: operators that drop rows by contract
  * (output caps, truncation guards) attach a named `observe` aggregate to
  * the frame they return, and this listener logs every `graft.`-prefixed
  * observation when the consuming action completes. The metric piggybacks
  * on the action's own execution — no extra job, and no eager driver-side
  * count on the build path (a plan-time count would execute the whole
  * upstream chain twice, which at 100 TB doubles the query). */
object ObservedLog {
  private val sessions =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Register the graft.* observation logger once per session (idempotent,
    * thread-safe). Listener survives for the session's lifetime — it holds
    * no per-query state. */
  def ensure(spark: SparkSession): Unit =
    if (sessions.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(
            funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft.")) log.info(s"$name: $row")
          }
        override def onFailure(
            funcName: String, qe: QueryExecution, exception: Exception): Unit =
          ()
      })
    }
}
