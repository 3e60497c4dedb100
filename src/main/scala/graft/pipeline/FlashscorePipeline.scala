package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.io.FlashscoreIO
import graft.transform.FlashscoreTransforms._

/** The end-to-end pipeline (`ETL_pipeline`, reference dags/utils.py:350-365)
  * re-structured for Spark: ONE read, one cached keyed plan, four
  * projections, four writes — versus the reference's three re-parses of the
  * same JSON per file (utils.py:81,150,174; SURVEY.md §4) and per-row
  * INSERTs.
  */
object FlashscorePipeline {

  /** The four output tables (names from env in the reference,
    * utils.py:22-25). */
  val factTable = "MATCH_FINISHED"
  val homeLineupTable = "HOME_STARTING_LINEUP"
  val awayLineupTable = "AWAY_STARTING_LINEUP"
  val oddsTable = "ODDS"

  /** Transform a raw Flashscore batch into the four output frames.
    * Filter + key generation happen once; the three branches are
    * projections of the shared keyed plan (fix for the positional zip,
    * SURVEY.md §2.3 N7). */
  def transformAll(
      raw: DataFrame,
      deterministicKeys: Boolean,
      loadTs: Column = current_timestamp())
      : Map[String, DataFrame] = {
    val keyed = withMatchKey(finished(raw), deterministicKeys)
    Map(
      factTable -> matchFacts(keyed, loadTs),
      homeLineupTable -> startingLineup(keyed, Home),
      awayLineupTable -> startingLineup(keyed, Away),
      oddsTable -> odds(keyed))
  }

  /** Batch run: read dir → 4 Parquet tables. One scan; the keyed frame is
    * cached because four actions consume it. */
  def runBatch(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      deterministicKeys: Boolean = false): Unit = {
    val raw = FlashscoreIO.readJson(spark, inputDir).cache()
    try {
      transformAll(raw, deterministicKeys).foreach { case (table, df) =>
        FlashscoreIO.writeTable(df, outDir, table)
      }
    } finally raw.unpersist()
  }

  /** Streaming run: file source + foreachBatch + checkpoint. Exactly-once
    * per file (checkpoint) + archive-on-consume (`cleanSource`), replacing
    * the reference's at-most-once move-to-used-bucket (utils.py:31-52) and
    * its duplicate-on-retry window (SURVEY.md §3 E1). */
  def runStream(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      checkpointDir: String,
      archiveDir: Option[String] = None,
      deterministicKeys: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = FlashscoreIO.readJsonStream(spark, inputDir, archiveDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.cache()
        try {
          transformAll(cached, deterministicKeys).foreach {
            case (table, df) => FlashscoreIO.writeTable(df, outDir, table)
          }
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
