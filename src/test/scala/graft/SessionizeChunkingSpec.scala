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

  test("sessionize agrees with Spark's built-in session_window") {
    // Independent implementations of gap sessionization must agree.
    // Spark's session merge is INCLUSIVE at the boundary (an event at
    // exactly start+gap extends the session — verified empirically: ticks
    // 0 and 10 merge under a 10s gap), i.e. a new session starts only
    // when the gap is strictly greater — the same contract as
    // Sessionize's `> gapTicks`, so the thresholds map 1:1.
    val rng = new scala.util.Random(11)
    val events = (0 until 400).map { i =>
      (rng.nextInt(8).toLong, rng.nextInt(300).toLong, i.toLong)
    }.toDF("user_id", "sec", "event_id")
      .dropDuplicates("user_id", "sec") // unique ticks per user
    val gapSec = 10L
    val ours = Sessionize.sessionStats(
      Sessionize.assign(events, "user_id", "sec", gapSec),
      "user_id", "sec")
      .select("user_id", "start_ts", "end_ts", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val builtin = events
      .withColumn("ts", timestamp_seconds(col("sec")))
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds"))
      .agg(min(col("sec")).as("start_ts"), max(col("sec")).as("end_ts"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_ts", "end_ts", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(ours == builtin)
    assert(ours.nonEmpty)
  }

  test("batch sessionization agrees with the streaming sessionizer") {
    import graft.streaming.EventStreams
    val s = 1000000000L // 1s in ns
    val rng = new scala.util.Random(3)
    val base = 7200L * s
    // random event times for 6 users, gaps straddling the 60s threshold
    val rows: Seq[(Long, Long, Long, String, Double, String)] =
      (0 until 120).map { i =>
        val user = 10L + i % 6
        val ts = base + (i / 6) * (rng.nextInt(90) + 5) * s +
          user * 7 * s // desync users
        (i.toLong, ts, user, "click", 1.0, "{}")
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_parity").toString
    val src = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/data")
    val f = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(src, "all.parquet"))
    // flusher: a far-future event from an excluded user advances the
    // watermark so every real session times out and is emitted
    Seq((999L, base + 100000L * s, 99L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/flush")
    val q = EventStreams.sessionize(
      EventStreams.readEventStream(spark, src), gapNs = 60 * s)
      .writeStream.format("memory").queryName("parity")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val f2 = new java.io.File(s"$dir/flush").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f2.toPath,
        java.nio.file.Paths.get(src, "flush.parquet"))
      q.processAllAvailable()
      // second flush batch so registered timeouts fire
      java.nio.file.Files.copy(f2.toPath,
        java.nio.file.Paths.get(src, "flush2.parquet"))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, start_ns, end_ns, n_events FROM parity " +
          "WHERE user_id < 99")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      val batch = Sessionize.sessionStats(
        Sessionize.assign(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value",
            "props"),
          "user_id", "ts", 60 * s, tieCols = Seq("event_id")),
        "user_id", "ts")
        .collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
          r.getLong(2).toInt))
        .toSet
      assert(streamed == batch)
      assert(batch.size > 12) // the fixture actually exercises splits
    } finally q.stop()
  }

  test("chunking runs unchanged on a stream (stateless map-only op)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chunkstream").toString
    val src = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val docs = Seq((1L, (1 to 54).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"))
    docs.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/data")
    val f = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(src, "d.parquet"))
    val schema = "doc_id LONG, text STRING"
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = Chunking.chunkTokens(stream, "doc_id", "text", 32, 24)
      .writeStream.format("memory").queryName("chunkstream")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, chunk_id, chunk_text FROM chunkstream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val batch = Chunking.chunkTokens(
        docs.toDF("doc_id", "text"), "doc_id", "text", 32, 24)
        .select("doc_id", "chunk_id", "chunk_text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(streamed == batch)
      assert(streamed.size == 4) // 3 chunks + 1
    } finally q.stop()
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
