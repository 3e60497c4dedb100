package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  test("media table matches the canonical schema shape") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() == 30)
  }

  test("decode stage: batched per-partition, deterministic output") {
    val decoded = Multimodal.decode(media)
    val rows = decoded.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(r => r.width >= 64 && r.height >= 64))
    // deterministic: re-running the stage yields identical features
    val again = Multimodal.decode(media).collect()
    assert(rows.map(r => r.media_id -> r.feature.toSeq).toMap ==
      again.map(r => r.media_id -> r.feature.toSeq).toMap)
    // images have no duration; videos have frames
    assert(rows.filter(_.kind == "image").forall(_.duration_ms == 0))
    assert(rows.filter(_.kind == "video").forall(_.n_frames >= 1))
  }

  test("frame sampling fans out only video rows") {
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, everyN = 10)
    assert(frames.select("media_id").distinct().count() ==
      decoded.filter(col("kind") === "video").count())
    // frame indices step by everyN
    val idx = frames.filter(col("media_id") === 2)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(idx.zipWithIndex.forall { case (v, i) => v == i * 10 })
  }

  test("resize plan preserves aspect ratio and caps the long side") {
    val plan = Multimodal.resizePlan(Multimodal.decode(media), maxSide = 256)
    plan.collect().foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      val (ow, oh) = (r.getInt(3), r.getInt(4))
      assert(ow <= 256 && oh <= 256 || (w <= 256 && h <= 256))
      assert(ow <= w && oh <= h) // never upscale
    }
  }
}
