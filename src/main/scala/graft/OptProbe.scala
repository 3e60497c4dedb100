package graft

import org.apache.spark.sql.SparkSession

/** Round-20 conf A/B probe: times named queries warm under the Bench
  * session config plus arbitrary overrides from SPARK_GRAFT_CONF
  * ("k=v;k=v"), so a proposed session-level optimization is measured
  * against the exact bench methodology (same master/partitions/action)
  * before it is shipped into Bench/Verify. Usage:
  *   SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.minPartitionSize=64k" \
  *     sbt "runMain graft.OptProbe q157_xxhash_exact_dups 5"
  * Multiple query names may be comma-separated; `runs` applies to each.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args(0).split(",").toSeq
    val runs = if (args.length > 1) args(1).toInt else 5
    var b = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "256k"))
    sys.env.get("SPARK_GRAFT_CONF").foreach { s =>
      s.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b = b.config(k.trim, v.trim)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.silenceKnownBoundedWindowWarn()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      val ts = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // plan-only time: analysis + optimization + physical planning of
      // a fresh frame, no execution — isolates the Catalyst share of
      // the wall from AQE orchestration + task time
      val tp0 = System.nanoTime()
      q(spark, sfDir).queryExecution.executedPlan
      val planOnly = (System.nanoTime() - tp0) / 1e9
      val s = ts.sorted
      val med = s(s.size / 2)
      println(f"[opt] $name%-28s med=$med%7.3f plan=$planOnly%6.3f " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
