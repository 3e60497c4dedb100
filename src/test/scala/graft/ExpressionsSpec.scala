package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import graft.functions.{RollingHash, VectorFunctions => VF}

class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def cosOf(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(VF.cosineFast(
        col("a").cast("array<float>"), col("b").cast("array<float>")).as("c"))
    val r = df.head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("CosineSimilarity: identical, orthogonal, opposite, degenerate") {
    assert(math.abs(cosOf(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)).get - 1.0) < 1e-12)
    assert(math.abs(cosOf(Seq(1f, 0f), Seq(0f, 1f)).get) < 1e-12)
    assert(math.abs(cosOf(Seq(1f, 0f), Seq(-1f, 0f)).get + 1.0) < 1e-12)
    assert(cosOf(Seq(1f, 2f), Seq(1f, 2f, 3f)).isEmpty) // length mismatch
    assert(cosOf(Seq(0f, 0f), Seq(1f, 2f)).isEmpty) // zero norm
    assert(cosOf(Seq.empty, Seq.empty).isEmpty) // empty
  }

  test("CosineSimilarity interpreted eval matches codegen") {
    val df = spark.read.parquet(s"$sf001/embeddings.parquet").limit(50)
    val q = df.orderBy(col("vec_id")).head().getSeq[Float](1)
    val fused = df.select(col("vec_id"),
      VF.cosineFast(col("embedding"), VF.floatVec(q)).as("c"))
    val builtin = df.select(col("vec_id"),
      VF.cosine(col("embedding"), VF.floatVec(q)).as("c"))
    val a = fused.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = builtin.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("SimHash64: deterministic; near-identical token sets are close") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (2L, Seq("a", "b", "c", "d", "e", "f", "g", "x")),
      (3L, Seq("q", "w", "r", "t", "y", "u", "i", "o"))
    ).toDF("id", "toks")
      .select(col("id"), VF.simhash(col("toks")).as("sk"))
    val sk = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sk(1L), sk(2L)) < ham(sk(1L), sk(3L)))
    // deterministic across evaluations
    val again = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk == again)
  }

  test("custom expressions are SQL-callable after registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(CAST(array(1.0, 0.0) AS array<float>),
        |                         CAST(array(1.0, 0.0) AS array<float>)) AS c,
        |       rolling_hash('ab') AS rh,
        |       simhash64(array('a', 'b')) AS sh,
        |       euclidean_dist_sq(CAST(array(0.0, 0.0) AS array<float>),
        |                         CAST(array(3.0, 4.0) AS array<float>)) AS d
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) == 'a'.toLong * 31 + 'b'.toLong)
    assert(math.abs(r.getDouble(3) - 25.0) < 1e-12)
  }

  test("RollingHash matches the reference polynomial") {
    val got = Seq("ab").toDF("s")
      .select(Shims.column(RollingHash(Shims.expression(col("s")))))
      .head().getLong(0)
    assert(got == 'a'.toLong * 31 + 'b'.toLong)
    val empty = Seq("").toDF("s")
      .select(Shims.column(RollingHash(Shims.expression(col("s")))))
      .head().getLong(0)
    assert(empty == 0L)
  }
}
