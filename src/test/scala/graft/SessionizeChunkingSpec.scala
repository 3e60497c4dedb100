package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Sessionize}

class SessionizeChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("sessionize splits at gaps strictly greater than the threshold") {
    val events = Seq(
      // user 1: gaps 10, 31 (split), 5 → sessions [a,b][c,d]
      (1L, 100L, 0L), (1L, 110L, 1L), (1L, 141L, 2L), (1L, 146L, 3L),
      // user 2: single event
      (2L, 500L, 4L),
      // user 3: gap exactly == threshold stays in-session
      (3L, 0L, 5L), (3L, 30L, 6L)
    ).toDF("user_id", "ts", "event_id")
    val got = Sessionize.assign(events, "user_id", "ts", 30L,
        tieCols = Seq("event_id"))
      .select("event_id", "session_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L,
      4L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("sessionize numbering is deterministic under equal timestamps") {
    val events = Seq(
      (1L, 100L, 2L), (1L, 100L, 1L), (1L, 200L, 3L)
    ).toDF("user_id", "ts", "event_id")
    val stats = Sessionize.sessionStats(
      Sessionize.assign(events, "user_id", "ts", 50L,
        tieCols = Seq("event_id")), "user_id", "ts")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // ties share ts=100 → one session of 2, then gap 100 > 50 → new session
    assert(stats == Set((0L, 2L), (1L, 1L)))
  }

  test("chunking covers every token with the configured overlap") {
    val docs = Seq(
      (1L, (1 to 54).map(i => s"t$i").mkString(" ")), // 54 tokens → 3 chunks
      (2L, "a b c"),                                  // shorter than a chunk
      (3L, (1 to 48).map(i => s"t$i").mkString(" ")), // exact stride boundary
      (4L, "   ")                                     // no tokens → no rows
    ).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, "doc_id", "text", 32, 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).toList.sortBy(t => (t._1, t._2))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(_._2) == List(0, 1, 2))
    assert(byDoc(1L).map(_._3) == List(32, 30, 6)) // 0..31, 24..53, 48..53
    assert(byDoc(1L)(1)._4.startsWith("t25 ")) // stride 24 → starts at t25
    assert(byDoc(2L) == List((2L, 0, 3, "a b c")))
    assert(byDoc(3L).map(_._3) == List(32, 24)) // 0..31, 24..47
    assert(!byDoc.contains(4L))
    // overlap reconstruction: stitching chunk 0's first 24 tokens + chunk
    // 1's first 24 + chunk 2 rebuilds doc 1 exactly
    val c = byDoc(1L).map(_._4.split(" ").toList)
    val rebuilt = c(0).take(24) ++ c(1).take(24) ++ c(2)
    assert(rebuilt == (1 to 54).map(i => s"t$i").toList)
  }
}
