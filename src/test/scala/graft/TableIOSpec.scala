package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.TableIO
import graft.operators.Sampling

class TableIOSpec extends SparkTestBase {

  private lazy val nation =
    spark.read.parquet(s"$sf001/nation.parquet")

  test("csv and jsonl round-trip with pinned schema") {
    val tmp = Files.createTempDirectory("graft_io").toString
    TableIO.writeCsv(nation, s"$tmp/csv")
    TableIO.writeJsonLines(nation, s"$tmp/json")
    val csvBack = TableIO.readCsv(spark, s"$tmp/csv", nation.schema)
    val jsonBack = TableIO.readJsonLines(spark, s"$tmp/json", nation.schema)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(asSet(csvBack) == asSet(nation))
    assert(asSet(jsonBack) == asSet(nation))
  }

  test("orc round-trips and pushes filters to the scan") {
    val tmp = Files.createTempDirectory("graft_orc").toString
    TableIO.writeOrc(nation, s"$tmp/nation_orc")
    val back = TableIO.readOrc(spark, s"$tmp/nation_orc")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    val filtered = back.filter(col("n_regionkey") === 1)
      .select("n_name")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      plan) // predicate reaches the ORC scan, same as parquet
  }

  test("schema-evolution read unions old and new file schemas") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_evolve").toString
    // epoch 1: two columns; epoch 2: a third column appears
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$tmp/t/epoch=1")
    Seq((3L, "c", 0.9)).toDF("id", "name", "quality")
      .write.parquet(s"$tmp/t/epoch=2")
    val evolved = TableIO.readParquetEvolved(spark, s"$tmp/t")
    assert(evolved.columns.toSet == Set("id", "name", "quality", "epoch"))
    val rows = evolved.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality"))) // old file
    assert(rows(2).getDouble(rows(2).fieldIndex("quality")) == 0.9)
  }

  test("jdbc sink round-trips through embedded Derby") {
    // warehouse stand-in: Derby embedded (in Spark's own classpath) — the
    // same df.write.jdbc path a Snowflake/Postgres URL would take
    val dbDir = Files.createTempDirectory("graft_derby").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val nation = spark.read.parquet(s"$sf001/nation.parquet")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    TableIO.writeJdbc(nation, url, "NATION", numPartitions = 2)
    val back = TableIO.readJdbc(spark, url, "NATION")
    // Derby surfaces BIGINT columns back through whatever width the JDBC
    // dialect picks; compare values numerically, not by boxed class
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Number](0).longValue(),
        r.getString(1), r.getAs[Number](2).longValue())).toSet
    assert(asSet(back) == asSet(nation))
    // append mode appends, not replaces
    TableIO.writeJdbc(nation.limit(5), url, "NATION", numPartitions = 1)
    assert(TableIO.readJdbc(spark, url, "NATION").count() ==
      nation.count() + 5)
  }

  test("hash split is deterministic, disjoint, and ~fraction sized") {
    val c = spark.read.parquet(s"$sf001/customer.parquet")
    val (train, test) = Sampling.trainTestSplit(c, "c_custkey", 0.8)
    val (nTrain, nTest) = (train.count(), test.count())
    assert(nTrain + nTest == c.count())
    assert(math.abs(nTrain.toDouble / c.count() - 0.8) < 0.1)
    // deterministic across evaluations
    assert(Sampling.trainTestSplit(c, "c_custkey", 0.8)._1.count() == nTrain)
    // disjoint
    assert(train.join(test, "c_custkey").count() == 0)
  }

  test("stratified sample keeps only configured strata at their rates") {
    val c = spark.read.parquet(s"$sf001/customer.parquet")
    val seg = c.select("c_mktsegment").distinct()
      .collect().map(_.getString(0)).sorted
    val target = Map(seg.head -> 1.0, seg.last -> 0.5)
    val out = Sampling.stratifiedSample(c, "c_custkey", "c_mktsegment", target)
    val bySeg = out.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySeg.keySet == Set(seg.head, seg.last))
    val fullCounts = c.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySeg(seg.head) == fullCounts(seg.head)) // fraction 1.0
    assert(bySeg(seg.last) < fullCounts(seg.last)) // downsampled
  }

  test("class balance keeps exactly min-class-count rows per label") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val minN = e.groupBy("label").count()
      .agg(org.apache.spark.sql.functions.min("count")).head().getLong(0)
    val out = Sampling.balanceClasses(e, "vec_id", "label")
    val perLabel = out.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val labels = e.select("label").distinct().count()
    assert(perLabel.size == labels)
    assert(perLabel.values.forall(_ == minN), perLabel)
    // kept rows are a subset of the input and deterministic across runs
    assert(out.join(e, Seq("vec_id"), "left_anti").count() == 0)
    val ids1 = out.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.balanceClasses(e, "vec_id", "label")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }
}
