package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `BINARY` columns with typed metadata, processed in partition-sized
  * batches. The Spark-side contract (schema, batch iteration,
  * partitioning, output shape) is real and tested; the actual codec
  * calls are STUBBED with a deterministic fake because this environment
  * ships no image/audio libraries — swap [[MediaCodec.decodeImageStub]]
  * for a real decoder (JavaCPP/FFmpeg/ImageIO) without touching any
  * plumbing.
  */
object Multimodal {

  /** One media asset: payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  /** Decoded features emitted per asset. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      // image path: resized dims; audio path: resampled rate; video: sampled frames
      out_width: Int,
      out_height: Int,
      feature: Array[Float])

  /** The codec boundary. Every function is pure bytes->values so it can
    * run inside `mapPartitions` on executors with no driver round trip.
    */
  object MediaCodec {
    /** STUB decode: a real build calls the native decoder here. The fake
      * derives deterministic "pixels" from the payload hash so tests can
      * assert end-to-end stability.
      */
    def decodeImageStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Float] = {
      val seed = java.util.Arrays.hashCode(payload)
      val out = new Array[Float](8)
      var i = 0
      while (i < out.length) {
        out(i) = ((seed * (i + 1)) & 0xffff) / 65535.0f
        i += 1
      }
      out
    }

    def frameSampleStub(payload: Array[Byte], everyN: Int): Int =
      math.max(1, payload.length / math.max(1, everyN))
  }

  /** Decode + feature-extract + resize over partition-sized batches:
    * the Scala-idiomatic analogue of a Pandas-UDF `mapInPandas` stage.
    * One task per input partition, codec state initialized once per
    * partition (the `mapPartitions` closure), no per-row setup cost.
    */
  def extractFeatures(media: Dataset[MediaRecord], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would happen here (native handles etc.)
      it.map { m =>
        val feats = m.kind match {
          case "image" => MediaCodec.decodeImageStub(m.payload, targetW, targetH)
          case "audio" => MediaCodec.decodeImageStub(m.payload, m.sample_rate, 1)
          case _       => MediaCodec.decodeImageStub(m.payload, m.n_frames, 1)
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length, targetW, targetH, feats)
      }
    }
  }

  /** Resized copy of an image batch: output dims are clamped to the
    * target aspect box; the pixel work is the stubbed codec call. Shape
    * of a real resize stage: pure `mapPartitions`, metadata recomputed,
    * payload replaced.
    */
  def resizeImages(media: Dataset[MediaRecord], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "image") m
        else {
          val scale = math.min(targetW.toDouble / math.max(m.width, 1),
            targetH.toDouble / math.max(m.height, 1))
          val w = math.max(1, (m.width * scale).toInt)
          val h = math.max(1, (m.height * scale).toInt)
          // stub: a real resize would transcode payload here
          m.copy(width = w, height = h,
            payload = m.payload.take(math.max(1, (m.payload.length * scale).toInt)))
        }
      }
    }
  }

  /** Frame sampling for video assets: keep every `everyN`-th frame
    * (stub counts frames from the payload). Emits one row per sampled
    * frame — the explode shape a real video pipeline produces.
    */
  final case class Frame(media_id: Long, frame_no: Int, byte_len: Int)

  def sampleFrames(media: Dataset[MediaRecord], everyN: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { m =>
        (0 until m.n_frames by math.max(1, everyN)).iterator
          .map(f => Frame(m.media_id, f, m.payload.length / math.max(m.n_frames, 1)))
      }
    }
  }

  /** Size/validity stats per kind — metadata-only pass that never
    * deserializes payloads beyond `length()` (column pruning keeps the
    * binary column out of the scan when the source stores lengths in
    * metadata).
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy("kind").agg(
      count("*").as("n_assets"),
      sum(length(col("payload"))).as("total_bytes"),
      avg(length(col("payload"))).as("avg_bytes"))

  /** Synthesize a deterministic media table from the documents corpus —
    * the test/bench stand-in for a real binary source: payload bytes are
    * the document text, kind round-robins by doc_id.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(640)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (pmod(col("doc_id"), lit(300)) + 1).cast("int").as("n_frames"))
}
