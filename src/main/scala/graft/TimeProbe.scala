package graft

import org.apache.spark.sql.SparkSession

/** Scratch micro-profiler: times named SparkEntry queries cold+warm at
  * sf0.1 under the Bench session config (round-2 perf work). */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // absorb session warm-up before any measured query
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q28_fuzzy_levenshtein", "q36_jaccard_pairs",
        "q35_minhash_neardup", "q57_minhash_portable")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      var t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      q(spark, sfDir).count()
      val warm = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-24s cold=$cold%7.3f warm=$warm%7.3f rows=$n")
    }
    spark.stop()
  }
}
