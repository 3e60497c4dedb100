package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for quantileNormalize's GRID construction at the
  * `maxRefRows` contract ceiling (VERDICT r18 #5): a 10M-row reference
  * (the default bound) against a 2M-row, 20-source crawl. The round-18
  * form cross-joined all m ranked reference rows against the k+1 grid
  * indices and filtered — a (k+1)×m ≈ 110M-row pass — where the
  * round-19 form broadcast-joins a driver-computed (i, rank) local
  * relation against the ranked reference in one m-row pass. Run the
  * same main in a round-18 worktree and at HEAD for the receipt; the
  * plain-arm crawl side is identical in both, so the delta isolates
  * the grid. Reports 1 cold + 3 timed reps (seconds) and the result
  * row count + a checksum so both trees prove answer identity.
  */
object QnormRefProbe {
  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toLong).getOrElse(10000000L)
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // deterministic synthetic frames: scores are a fixed multiplicative
    // hash so ranks are scrambled relative to ids on both trees
    val ref = spark.range(m)
      .select(col("id"), ((col("id") * 2654435761L) % 1000000007L)
        .as("score"))
    val cur = spark.range(n)
      .select(col("id"), ((col("id") * 40503L) % 999983L).as("score"),
        concat(lit("s"), (col("id") % 20).cast("string")).as("source"))
    def rep(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val out = graft.operators.Normalize.quantileNormalize(
        cur, ref, "id", "score", "source", k = k,
        maxRefRows = 20000000L)
      val row = out.agg(count(lit(1)), sum(col("normalized"))).head()
      ((System.nanoTime() - t0) / 1e9, row.getLong(0), row.getLong(1))
    }
    val cold = rep()
    val warm = Vector.fill(3)(rep())
    println(f"QNORM_REF_PROBE m=$m n=$n k=$k cold=${cold._1}%.2f warm=" +
      warm.map(w => f"${w._1}%.2f").mkString(",") +
      s" rows=${warm.head._2} checksum=${warm.head._3}")
    spark.stop()
  }
}
