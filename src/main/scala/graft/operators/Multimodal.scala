package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark side — schema, partition sizing, batch iteration shape,
  * output contract — is real and tested. The media DECODE itself is a
  * STUB (`decodeStub`): this container has no image/audio codecs, so the
  * stub derives deterministic fake features from the bytes. Swapping in a
  * real decoder (JNI/javacv or a Python `mapInPandas` stage on a cluster
  * with codecs) changes only the body of `decodeStub`.
  */
object Multimodal {

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType), // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      source: String, mime: String)

  final case class DecodedMedia(
      media_id: Long, kind: String,
      width: Int, height: Int, n_frames: Int, duration_ms: Long,
      feature: Array[Float])

  implicit private val decodedEnc: Encoder[DecodedMedia] =
    Encoders.product[DecodedMedia]

  /** ==== STUB ====
    * Deterministic fake decode: "dimensions" and a 8-dim "feature" are
    * derived from the payload bytes (stable across runs), standing in for
    * a real codec. Real implementation: decode bytes → pixels/samples,
    * extract features. */
  private[operators] def decodeStub(
      id: Long, kind: String, payload: Array[Byte]): DecodedMedia = {
    val n = if (payload == null) 0 else payload.length
    var h = 1469598103934665603L // FNV-1a over the payload
    var i = 0
    while (i < n) { h = (h ^ (payload(i) & 0xffL)) * 1099511628211L; i += 1 }
    val w = 64 + (math.abs(h % 1024)).toInt
    val ht = 64 + (math.abs((h >> 10) % 1024)).toInt
    val frames = if (kind == "video") 1 + (math.abs(h >> 20) % 300).toInt else 1
    val feat = Array.tabulate(8)(d =>
      (((h >> (d * 8)) & 0xff).toFloat - 128f) / 128f)
    DecodedMedia(id, kind, w, ht, frames,
      if (kind == "image") 0L else math.abs(h % 600000L), feat)
  }

  /** Decode/feature-extract stage: batched per-partition iteration (the
    * Scala analogue of `mapInPandas` — one partition = one batch stream,
    * codec state initialized once per partition, not per row). */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"),
      col("meta.source"), col("meta.mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init (real impl: open codec context here, once)
        rows.map(r => decodeStub(r.media_id, r.kind, r.payload))
      }
  }

  /** Frame sampling for video rows: every `everyN`-th frame index becomes
    * a row (explode of a generated index range) — the Spark-native shape
    * for per-frame fan-out. */
  def sampleFrames(decoded: Dataset[DecodedMedia], everyN: Int): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(everyN))))
      .select(col("media_id"), col("frame_idx"), col("width"), col("height"))

  /** Resize metadata transform (pure column math over decoded dims). */
  def resizePlan(decoded: Dataset[DecodedMedia],
      maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"), lit(1.0))
    decoded.toDF().select(
      col("media_id"),
      col("width"), col("height"),
      round(col("width") * scale).cast("int").as("out_width"),
      round(col("height") * scale).cast("int").as("out_height"))
  }

  /** Deterministic synthetic media table for tests (no codecs needed). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.tabulate[Byte](32 + i % 64)(j => ((i * 31 + j) % 251).toByte)
      MediaRow(i.toLong, kind, payload, s"src${i % 5}", s"fake/$kind")
    }.toDF()
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("source"), col("mime"),
          length(col("payload")).cast("long").as("n_bytes")).as("meta"))
  }
}
