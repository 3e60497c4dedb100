package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout writers — the difference between scanning 100 TB and
  * scanning the 1% a query needs:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning; predicates
  *    on the partition columns become PartitionFilters (whole directories
  *    skipped, no file even opened);
  *  - [[writeSortedFiles]]: range-repartition + sort-within-partitions on
  *    a clustering key before writing; parquet row-group min/max stats
  *    then let non-partition predicates skip row groups inside files.
  */
object Layout {

  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def writeSortedFiles(
      df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(mode).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
