package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Plan-quality audit across the whole declared surface: one markdown
  * table row per query with the physical-plan facts that matter at scale —
  * shuffle count, broadcasts, scan column pruning, pushed filters, and
  * whole-stage-codegen coverage. `runMain graft.PlanAudit > PLANS.md`
  * style usage (it prints the table to stdout).
  */
object PlanAudit {

  private def count(plan: String, token: String): Int =
    token.r.findAllMatchIn(plan).length

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | shuffles | broadcasts | scans | pushed filters | codegen stages | shuffled records | shuffled KiB |")
    println("|---|---|---|---|---|---|---|---|")
    // Plan-SIZE regression guard (round 13): q129's 23 s bench tail was
    // an O(k²·dim) expression tree whose 344 KB executed plan cost ~2 s
    // of driver time per run — a pathology completely invisible to the
    // shuffle/scan counters above. Flag any query whose FINAL plan text
    // exceeds this bound so the next literal-tree blowup is caught at
    // audit time, not by bench-tail archaeology.
    val planSizeBound = 100 * 1024
    val oversized = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var unmeasured = 0 // audit-failed queries: their plan size is UNKNOWN
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // ONE execution serves both outputs: shuffleSummary runs the plan
        // (finalizing AQE) and harvests the measured shuffle volume; the
        // plan-string parse below then reads the same finalized plan
        val m = PlanMetrics.shuffleSummary(df)
        // AQE's root is a leaf node (children hidden) → parse the final
        // plan string rather than traversing
        val planStr = df.queryExecution.executedPlan.toString
        val finalPart = // only the final plan section, not "Initial Plan"
          planStr.split("== Initial Plan ==").head
        if (finalPart.length > planSizeBound)
          oversized += name -> finalPart.length
        val shuffles =
          count(finalPart, "Exchange (hashpartitioning|rangepartitioning|SinglePartition)")
        val bcasts = count(finalPart, "BroadcastExchange")
        val scans = count(finalPart, "FileScan parquet")
        val pushed = count(finalPart, "PushedFilters: \\[\\w") // non-empty
        val codegen = "\\*\\((\\d+)\\)".r
          .findAllMatchIn(finalPart).map(_.group(1)).toSet.size
        // a plan with no scan AND no exchange is rooted at blocks the
        // query materialized EAGERLY at construction (cache/checkpoint
        // chains — q122's per-iteration checkpoints, q41's guardrail):
        // the real shuffles ran in eager jobs this harvest can't see.
        // Mark the row so zeros read as "measured elsewhere", not
        // "free" (the eager stories live in SCALING.md).
        // ASCII on purpose: the marker survives log pipes that mangle
        // multibyte glyphs
        val marker =
          if (scans == 0 && shuffles == 0 && bcasts == 0) " (eager)" else ""
        println(s"| $name$marker | $shuffles | $bcasts | $scans | $pushed " +
          s"| $codegen | ${m.shuffleRecords} | ${m.shuffleBytes / 1024} |")
      } catch {
        case e: Throwable =>
          unmeasured += 1
          println(s"| $name | audit failed: ${e.getClass.getSimpleName} | | | | | | |")
      }
    }
    if (oversized.isEmpty) {
      val caveat =
        if (unmeasured == 0) ""
        else s" CAVEAT: $unmeasured quer${if (unmeasured == 1) "y" else "ies"} " +
          "failed the audit — their plan sizes are unmeasured, not clean."
      println(s"\nPlan-size guard: every MEASURED final plan under " +
        s"${planSizeBound / 1024} KiB of text (largest-tree pathology " +
        s"class of q129-r12 — see SCALING.md round 13 — not present).$caveat")
    }
    else {
      println(s"\nPlan-size guard: ${oversized.size} FINAL plan(s) over " +
        s"${planSizeBound / 1024} KiB — likely a literal/per-constant " +
        "expression-tree blowup; driver pays O(plan size) per run:")
      oversized.sortBy(-_._2).foreach { case (n, b) =>
        println(s"  $n: ${b / 1024} KiB")
      }
      // the unmeasured caveat applies to THIS branch too — without it,
      // a run with one oversized plan and three audit failures reads
      // as "exactly one pathology"
      if (unmeasured > 0)
        println(s"  CAVEAT: $unmeasured additional quer" +
          s"${if (unmeasured == 1) "y" else "ies"} failed the audit — " +
          "their plan sizes are unmeasured and could hide more.")
    }
    spark.stop()
  }
}
