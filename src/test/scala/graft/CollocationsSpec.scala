package graft

import graft.operators.Collocations

class CollocationsSpec extends SparkTestBase {
  import spark.implicits._

  test("bigramLift computes exact lift from one bigram table") {
    // bigrams: doc1 "a b a b" -> (a,b),(b,a),(a,b); doc2 "a b c" ->
    // (a,b),(b,c). Counts: (a,b)=3,(b,a)=1,(b,c)=1, N=5. Marginals:
    // n_a·(a)=3, n_a·(b)=2, n_·b(b)=3, n_·b(a)=1, n_·b(c)=1. So
    // lift(a,b)=3*5/(3*3), lift(b,a)=1*5/(2*1), lift(b,c)=1*5/(2*1);
    // the 2.5 tie resolves lexicographically on (w1,w2).
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Collocations.topCollocations(d, "text", minCount = 1L, k = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("b", "a", 1L, 2.5),
      ("b", "c", 1L, 2.5),
      ("a", "b", 3L, 1.666667)))
  }

  test("skipgramRows emits exactly the forward arcs within the window") {
    val d = Seq((1L, "a b c d"), (2L, "x")).toDF("doc_id", "text")
    val got = Collocations.skipgramRows(d, "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // from "a b c d": (a,b),(a,c),(b,c),(b,d),(c,d); "x" contributes none
    assert(got == Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "d")))
  }

  test("minCount guards rare pairs; single-token docs contribute nothing") {
    val d = Seq((1L, "x y x y x y"), (2L, "z"), (3L, "")).toDF("doc_id", "text")
    val out = Collocations.bigramLift(d, "text", minCount = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (x,y)=3 survives, (y,x)=2 is guarded out
    assert(out.toSeq == Seq(("x", "y", 3L)))
  }
}
