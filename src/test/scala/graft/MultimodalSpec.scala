package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing (SURVEY.md §2 E12): binaryFile ingestion,
  * stubbed decode, frame sampling. */
class MultimodalSpec extends SparkSpec {

  test("binaryFile ingestion round-trips opaque payloads with type tags") {
    val dir = Files.createTempDirectory("graft_media").toString
    val png = Array[Byte](0x50, 0x4e, 0x47, 1, 2, 3)
    val wav = Array.tabulate(250)(i => (i % 127).toByte)
    Files.write(Paths.get(dir, "a.png"), png)
    Files.write(Paths.get(dir, "b.wav"), wav)
    Files.write(Paths.get(dir, "skip.txt"), "not media".getBytes)

    val media = Multimodal.fromBinaryFiles(spark, dir, glob = "*.{png,wav}")
    val rows = media.collect().map(r => r.media_type -> r.media.length).toMap
    assert(rows == Map("media/png" -> png.length, "media/wav" -> wav.length))
    // ids are deterministic and distinct per path
    assert(media.select("doc_id").distinct().count() == 2)

    // decode stub: metadata derived from payload, fixed feature dim
    val feats = Multimodal.decodeFeatures(spark, media).collect()
    assert(feats.forall(_.feature_dim == Multimodal.FeatureDim))
    val byLen = feats.map(f => f.media_len -> f.frame_count).toMap
    assert(byLen(png.length) == 1)  // 6 bytes → 1 frame
    assert(byLen(wav.length) == 3)  // 250 bytes → 3 frames
  }

  test("frame sampling explodes capped, strided frame indexes") {
    val media = Multimodal.toMediaRows(spark,
      Tables.documents(spark, sf).limit(5), "doc_id", "text")
    val sampled = Multimodal.sampleFrames(
      Multimodal.decodeFeatures(spark, media), stride = 2, maxFrames = 3)
    val perDoc = sampled.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 3))
    // frame indexes respect the stride
    assert(sampled.filter(col("frame_idx") % 2 =!= 0).count() == 0)
  }
}
