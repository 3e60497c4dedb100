package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("brute-force topK: self similarity ranks first") {
    val q = emb.filter(col("vec_id") === 7).head().getSeq[Float](1)
    val top = Similarity.topK(emb, "vec_id", "embedding", q, 5).collect()
    assert(top.head.getLong(0) == 7L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse) // descending
  }

  test("topKForQueries returns k rows per query") {
    val queries = emb.filter(col("vec_id") < 3)
    val out = Similarity.topKForQueries(emb, queries,
      "vec_id", "embedding", "vec_id", k = 4)
    assert(out.columns.toSeq == Seq("query_id", "vec_id", "cosine"))
    val byQuery = out.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    assert(byQuery.values.forall(_.length == 4))
    // each query's own vector ranks first with cosine ~ 1
    byQuery.foreach { case (q, rows) =>
      val best = rows.maxBy(_.getDouble(2))
      assert(best.getLong(1) == q)
    }
  }

  test("IVF index: assignments cover corpus; probe recall vs brute force") {
    val idx = Similarity.buildIvf(spark, emb, "vec_id", "embedding",
      nCentroids = 4, iterations = 2)
    assert(idx.centroids.length == 4)
    assert(idx.assigned.count() == emb.count())
    // all assignments land on a valid centroid id
    val cids = idx.assigned.select("__centroid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf((0 until 4).map(_.toLong).toSet))
    val q = emb.filter(col("vec_id") === 7).head().getSeq[Float](1)
    // full probe == brute force (sanity: IVF with nProbe=all is exact)
    val ivfAll = Similarity.searchIvf(idx, "vec_id", "embedding",
      q, k = 5, nProbe = 4).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.topK(emb, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(ivfAll == brute)
    // partial probe still finds the exact-self match
    val ivf2 = Similarity.searchIvf(idx, "vec_id", "embedding",
      q, k = 5, nProbe = 2).collect().map(_.getLong(0)).toSeq
    assert(ivf2.contains(7L))
  }
}
