package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 E12): image/audio/video
  * as opaque `binary` columns with typed metadata, batch-wise decode /
  * feature extraction via `mapPartitions` over a typed Dataset (the
  * Scala analogue of `mapInPandas` — one iterator per partition, so a
  * real decoder would amortize model/codec init per batch, not per
  * row).
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * container): `decodeFeatures` derives a deterministic fake feature
  * vector from the payload bytes. The Spark-side contract — schema,
  * encoders, partition batching, metadata math — is real and tested.
  */
object Multimodal {

  /** An opaque media payload: what an image/audio/video column looks
    * like at rest. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  /** Decoded representation: metadata + fixed-dim feature vector. */
  final case class MediaFeatures(
      doc_id: Long, media_len: Int, frame_count: Int,
      feature_dim: Int, features: Array[Float])

  val FeatureDim = 16
  /** Stub "frame rate": one frame per 100 payload bytes. */
  def frameCount(mediaLen: Int): Int = mediaLen / 100 + 1

  /** Pack any table with a text column into media rows (the test
    * stand-in for real binary payloads). */
  def toMediaRows(spark: SparkSession, df: DataFrame,
                  idCol: String, payloadCol: String,
                  mediaType: String = "image/stub"): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(payloadCol).cast("binary").as("media"),
        lit(mediaType).as("media_type"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would decode the codec here
    * (e.g. JPEG → pixels → model features). The fake is deterministic:
    * feature i = byte[i] / 255 (zero-padded). Batch shape is the real
    * one — one partition-iterator per task. */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (decoder/model handle)
      rows.map { r =>
        val len = r.media.length
        val feats = Array.tabulate(FeatureDim) { i =>
          if (i < len) (r.media(i) & 0xff) / 255.0f else 0.0f
        }
        MediaFeatures(r.doc_id, len, frameCount(len), FeatureDim, feats)
      }
    }
  }

  /** Frame sampling stub for video-like payloads: every `stride`-th
    * frame index, capped at `maxFrames` — the plumbing a real frame
    * sampler needs (explode → per-frame rows). */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int, maxFrames: Int): DataFrame =
    features.toDF()
      .withColumn("frame_idx",
        explode(expr(s"slice(sequence(0, frame_count - 1, $stride), 1, $maxFrames)")))
      .select(col("doc_id"), col("frame_idx"), col("media_len"))

  /** Real media ingestion path: a directory of opaque media files →
    * MediaRow, via Spark's distributed `binaryFile` source (the
    * listing and the reads are executed on executors, so a
    * 100M-object media bucket never touches the driver). doc_id is a
    * deterministic hash of the file path; the extension becomes the
    * media type. */
  def fromBinaryFiles(spark: SparkSession, dir: String,
                      glob: String = "*"): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("content").as("media"),
        concat(lit("media/"),
          element_at(split(col("path"), "\\."), -1)).as("media_type"))
      .as[MediaRow]
  }
}
