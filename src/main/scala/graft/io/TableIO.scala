package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic batch table IO: parquet / json / csv with pinned schemas.
  *
  * Policy (SURVEY.md §1.4): schema is always DECLARED on read — inference
  * re-reads data, costs a pass, and drifts silently. Writers default to
  * snappy parquet; csv/json exist for interchange, not for the hot path
  * (row formats lose pushdown, pruning, and encoding).
  */
object TableIO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-evolution read: union the schemas of ALL files (mergeSchema)
    * so a table whose later files gained columns reads as one frame —
    * rows from older files carry nulls in the new columns. Costs a
    * footer-read per file at planning time (that's why it is not the
    * default); at 100 TB, prefer evolving through an explicit declared
    * schema once the new columns stabilize. */
  def readParquetEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def writeParquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** ORC — the other columnar format Spark ships natively; same
    * pushdown/pruning behavior as parquet (predicate pushdown, column
    * pruning, stripe-level stats). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def readJsonLines(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def writeJsonLines(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Warehouse sink over JDBC — the engine counterpart of the reference's
    * Snowflake load (dags/utils.py:184-224), which INSERTed one row at a
    * time with a 2 s sleep and a read-back per row (≤ 0.5 rows/s). Spark's
    * JDBC writer batches `batchsize` rows per statement from every
    * partition in parallel; `numPartitions` caps concurrent connections so
    * a 1000-executor job doesn't open 1000 sessions against the warehouse.
    * `repartition`, not `coalesce`: coalesce has no shuffle barrier, so it
    * would collapse the whole upstream stage to `numPartitions` tasks —
    * capping compute parallelism, not just connections. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      properties: java.util.Properties = new java.util.Properties(),
      batchSize: Int = 10000,
      numPartitions: Int = 8): Unit =
    df.repartition(numPartitions)
      .write.mode(mode)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, properties)

  /** JDBC table read (partition the scan with `predicates`/options at the
    * call site when the table is large). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      properties: java.util.Properties = new java.util.Properties())
      : DataFrame =
    spark.read.jdbc(url, table, properties)
}
