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

  test("planted PNGs decode to real pixel dimensions and luminance features") {
    import spark.implicits._
    val media = spark.range(0, 20).as[Long]
      .map(id => Multimodal.MediaRow(id,
        Multimodal.syntheticPng(1 + (id % 16).toInt, 1 + (id % 8).toInt, id),
        "image/png"))
    val feats = Multimodal.decodeFeatures(spark, media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.width == 1 + (f.doc_id % 16).toInt, s"doc ${f.doc_id} width")
      assert(f.height == 1 + (f.doc_id % 8).toInt, s"doc ${f.doc_id} height")
      assert(f.frame_count == 1)
      assert(f.features.length == Multimodal.FeatureDim)
      assert(f.features.forall(v => v >= 0.0f && v <= 1.0f))
    }
    // luminance features are a pure function of the pixels: the same
    // payload decodes to the same vector on any executor
    val again = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.doc_id) == f.features.toSeq))
  }

  test("an undecodable image payload falls back to the stub, not a crash") {
    import spark.implicits._
    val junk = Array.tabulate(250)(i => (i * 7).toByte)
    val media = spark.range(0, 1).as[Long]
      .map(id => Multimodal.MediaRow(id, junk, "image/png"))
    val f = Multimodal.decodeFeatures(spark, media).collect()(0)
    assert(f.width == 0 && f.height == 0)
    assert(f.media_len == 250 && f.frame_count == 3) // stub metadata math
  }

  test("planted WAVs decode to real frame counts, rate, channels, RMS features") {
    import spark.implicits._
    val media = spark.range(0, 20).as[Long]
      .map(id => Multimodal.MediaRow(id,
        Multimodal.syntheticWav(800 + (id % 800).toInt, 8000, id), "audio/wav"))
    val feats = Multimodal.decodeFeatures(spark, media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.frame_count == 800 + (f.doc_id % 800).toInt, s"doc ${f.doc_id} frames")
      assert(f.sample_rate == 8000 && f.channels == 1)
      assert(f.width == 0 && f.height == 0)
      assert(f.features.length == Multimodal.FeatureDim)
      // RMS of full-range noise-like PCM: inside (0, 1]
      assert(f.features.forall(v => v > 0.0f && v <= 1.0f))
    }
    // decode is a pure function of the payload
    val again = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.doc_id) == f.features.toSeq))
  }

  test("an undecodable audio payload falls back to the stub, not a crash") {
    import spark.implicits._
    val junk = Array.tabulate(250)(i => (i * 13).toByte)
    val media = spark.range(0, 1).as[Long]
      .map(id => Multimodal.MediaRow(id, junk, "audio/wav"))
    val f = Multimodal.decodeFeatures(spark, media).collect()(0)
    assert(f.sample_rate == 0 && f.channels == 0)
    assert(f.media_len == 250 && f.frame_count == 3) // stub metadata math
  }

  test("planted MP4s decode to real duration and presentation geometry") {
    import spark.implicits._
    val media = spark.range(0, 20).as[Long]
      .map(id => Multimodal.MediaRow(id,
        Multimodal.syntheticMp4(16 * (1 + (id % 16)).toInt,
          16 * (1 + (id % 8)).toInt, 1000 + (id % 5000).toInt, id),
        "video/mp4"))
    val feats = Multimodal.decodeFeatures(spark, media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.width == 16 * (1 + (f.doc_id % 16)).toInt, s"doc ${f.doc_id} width")
      assert(f.height == 16 * (1 + (f.doc_id % 8)).toInt, s"doc ${f.doc_id} height")
      assert(f.duration_ms == 1000 + (f.doc_id % 5000).toInt, s"doc ${f.doc_id} duration")
      assert(f.frame_count == 0 && f.sample_rate == 0 && f.channels == 0)
      assert(f.features.length == Multimodal.FeatureDim)
    }
  }

  test("an undecodable video payload falls back to the stub, not a crash") {
    import spark.implicits._
    // junk bytes, a truncated real MP4, and a moov-less MP4 must all
    // quarantine to the stub path
    val real = Multimodal.syntheticMp4(32, 16, 2000, 1L)
    val payloads = Seq(
      Array.tabulate(250)(i => (i * 11).toByte),
      real.take(real.length / 2),
      real.take(24)) // ftyp only
    val media = spark.range(0, 3).as[Long]
      .map(id => Multimodal.MediaRow(id, payloads(id.toInt), "video/mp4"))
    val feats = Multimodal.decodeFeatures(spark, media).collect()
    feats.foreach { f =>
      assert(f.width == 0 && f.height == 0 && f.duration_ms == 0, s"doc ${f.doc_id}")
      assert(f.frame_count == f.media_len / 100 + 1) // stub metadata math
    }
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
