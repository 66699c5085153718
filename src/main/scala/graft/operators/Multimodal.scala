package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 E12): image/audio/video
  * as opaque `binary` columns with typed metadata, batch-wise decode /
  * feature extraction via `mapPartitions` over a typed Dataset (the
  * Scala analogue of `mapInPandas` — one iterator per partition, so a
  * real decoder would amortize model/codec init per batch, not per
  * row).
  *
  * IMAGE decode is REAL: `javax.imageio` (JDK-only, headless-safe)
  * reads PNG/JPEG/BMP/GIF payloads into pixels, and the feature vector
  * is a 4×4 luminance grid. AUDIO decode is REAL for WAV/PCM:
  * `javax.sound.sampled` (also JDK-only) reads the container, yielding
  * true frame count / sample rate / channel count and a 16-segment RMS
  * energy vector. VIDEO METADATA decode is REAL for MP4/ISO BMFF
  * (public box layout, ISO/IEC 14496-12): a pure-JVM walk of the
  * `moov`/`mvhd`/`tkhd` boxes recovers duration (ms), presentation
  * width and height — both 32- and 64-bit box sizes and version-0/1
  * headers. Frame PIXEL decode would need a video codec no stock JDK
  * ships, so video feature vectors stay byte-derived and frame_count
  * stays 0 (a metadata-only moov has no sample tables); undecodable
  * payloads quarantine to the stub path. The Spark-side contract —
  * schema, encoders, partition batching, metadata math — is identical
  * for all paths.
  */
object Multimodal {

  /** An opaque media payload: what an image/audio/video column looks
    * like at rest. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  /** Decoded representation: metadata + fixed-dim feature vector.
    * width/height are the decoded pixel dimensions for images;
    * sample_rate (Hz) and channels are the decoded audio geometry;
    * each is 0 where the modality doesn't apply or the payload was
    * undecodable. */
  final case class MediaFeatures(
      doc_id: Long, media_len: Int, frame_count: Int,
      feature_dim: Int, features: Array[Float], width: Int, height: Int,
      sample_rate: Int = 0, channels: Int = 0, duration_ms: Int = 0)

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

  /** Deterministic tiny PNG: pixel (x,y) = RGB derived from (seed,x,y).
    * JDK-only encode; used to plant real image payloads in tests and
    * the driver query. */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (seed * 31 + x * 7 + y * 13) & 0xffffff
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 4×4 point-sampled luminance grid (Rec. 601 weights), row-major:
    * cell (i,j) samples pixel (⌊j·w/4⌋, ⌊i·h/4⌋). Deterministic and
    * resolution-independent — the image analogue of a pooled feature
    * map. */
  private def luminanceGrid(img: BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    Array.tabulate(FeatureDim) { k =>
      val x = math.min(w - 1, (k % 4) * w / 4)
      val y = math.min(h - 1, (k / 4) * h / 4)
      val rgb = img.getRGB(x, y)
      val lum = 0.299f * ((rgb >> 16) & 0xff) + 0.587f * ((rgb >> 8) & 0xff) +
        0.114f * (rgb & 0xff)
      lum / 255.0f
    }
  }

  /** Deterministic tiny WAV: 16-bit signed PCM mono, little-endian,
    * `nFrames` frames at `sampleRateHz`, sample i derived from
    * (seed, i). JDK-only encode; used to plant real audio payloads in
    * tests and the driver query. */
  def syntheticWav(nFrames: Int, sampleRateHz: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (Math.floorMod(seed * 31 + i.toLong * 2654435761L, 65536L) - 32768L).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRateHz.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real audio decode: WAV/PCM container via `javax.sound.sampled` —
    * true frame count, sample rate, and channel count, plus a
    * 16-segment RMS energy vector over the PCM samples (the audio
    * analogue of the image luminance grid). None = not decodable as
    * 16-bit signed PCM → caller quarantines to the stub path. */
  private def audioFeatures(r: MediaRow): Option[MediaFeatures] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.media))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val frames = ais.getFrameLength.toInt
          val bytes = ais.readAllBytes()
          val nSamples = bytes.length / 2
          val feats = new Array[Float](FeatureDim)
          if (nSamples > 0) {
            val sums = new Array[Double](FeatureDim)
            val counts = new Array[Long](FeatureDim)
            var i = 0
            while (i < nSamples) {
              val v =
                if (fmt.isBigEndian) ((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)
                else ((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)
              val s = v.toShort.toDouble / 32768.0
              val seg = (i.toLong * FeatureDim / nSamples).toInt
              sums(seg) += s * s
              counts(seg) += 1
              i += 1
            }
            var k = 0
            while (k < FeatureDim) {
              feats(k) = if (counts(k) > 0) math.sqrt(sums(k) / counts(k)).toFloat else 0.0f
              k += 1
            }
          }
          Some(MediaFeatures(r.doc_id, r.media.length, frames, FeatureDim,
            feats, 0, 0, fmt.getSampleRate.toInt, fmt.getChannels))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Byte-derived feature vector: feature i = byte[i] / 255 (zero-
    * padded). Used by the stub path and as the video feature fallback
    * (no stock-JDK codec can reach video pixels). */
  private def byteFeatures(media: Array[Byte]): Array[Float] =
    Array.tabulate(FeatureDim) { i =>
      if (i < media.length) (media(i) & 0xff) / 255.0f else 0.0f
    }

  /** Stub features for non-decodable payloads: byte-derived vector,
    * frame count from the byte length. */
  private def stubFeatures(r: MediaRow): MediaFeatures = {
    val len = r.media.length
    MediaFeatures(r.doc_id, len, frameCount(len), FeatureDim,
      byteFeatures(r.media), 0, 0)
  }

  // ----- ISO BMFF (MP4) metadata: public box layout, ISO/IEC 14496-12

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def rd32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def rd64(b: Array[Byte], o: Int): Long =
    (rd32(b, o) << 32) | rd32(b, o + 4)

  /** Top-level scan of the boxes in b[from, to): (type, payloadStart,
    * payloadEnd). Handles 32-bit sizes, 64-bit `largesize`, and
    * size==0 (to end-of-enclosure); stops cleanly on malformed sizes
    * so corrupt payloads quarantine instead of crashing. */
  private def boxScan(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    var o = from
    var ok = true
    while (ok && o + 8 <= to) {
      var size = rd32(b, o)
      var hdr = 8
      if (size == 1L && o + 16 <= to) { size = rd64(b, o + 8); hdr = 16 }
      else if (size == 0L) size = (to - o).toLong
      if (size < hdr || size > (to - o).toLong) ok = false
      else {
        out += ((new String(b, o + 4, 4, "US-ASCII"), o + hdr, o + size.toInt))
        o += size.toInt
      }
    }
    out.toSeq
  }

  /** Deterministic minimal MP4: `ftyp` + metadata-only `moov`
    * (version-0 `mvhd` at millisecond timescale, one `trak`/`tkhd`
    * with 16.16 fixed-point presentation size) + a small seed-derived
    * `mdat`. Used to plant real video payloads in tests and the
    * driver query. */
  def syntheticMp4(width: Int, height: Int, durationMs: Int, seed: Long): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(body.length + 8L) ++ tpe.getBytes("US-ASCII") ++ body
    }
    val matrix = Array(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .flatMap(be32)
    val mvhd = box("mvhd",
      be32(0),                       // version 0 + flags
      be32(0), be32(0),              // creation, modification
      be32(1000),                    // timescale: 1 tick = 1 ms
      be32(durationMs.toLong),       // duration
      be32(0x00010000L),             // rate 1.0
      Array[Byte](0x01, 0x00, 0, 0), // volume 1.0 + reserved(2)
      new Array[Byte](8),            // reserved
      matrix,
      new Array[Byte](24),           // pre_defined
      be32(2))                       // next_track_ID
    val tkhd = box("tkhd",
      be32(7),                       // version 0, flags enabled|in_movie|in_preview
      be32(0), be32(0),              // creation, modification
      be32(1),                       // track_ID
      be32(0),                       // reserved
      be32(durationMs.toLong),       // duration (movie timescale)
      new Array[Byte](8),            // reserved
      new Array[Byte](8),            // layer, alternate_group, volume, reserved
      matrix,
      be32(width.toLong << 16), be32(height.toLong << 16)) // 16.16 fixed
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))
    val mdat = box("mdat", Array.tabulate(32)(i =>
      ((seed * 31 + i.toLong * 2654435761L) & 0xff).toByte))
    ftyp ++ box("moov", mvhd, box("trak", tkhd)) ++ mdat
  }

  /** Real video metadata decode: walk `moov`/`mvhd` for timescale +
    * duration (version 0 and 1 layouts) and the first `trak`/`tkhd`
    * for the 16.16 fixed-point presentation width/height. frame_count
    * stays 0 — a metadata decode reads no sample tables — and the
    * feature vector is byte-derived (pixels need a codec). None = not
    * ISO BMFF or malformed → caller quarantines to the stub path. */
  private def videoFeatures(r: MediaRow): Option[MediaFeatures] =
    try {
      val b = r.media
      val top = boxScan(b, 0, b.length)
      if (!top.exists(_._1 == "ftyp")) None
      else top.find(_._1 == "moov").flatMap { case (_, ms, me) =>
        val kids = boxScan(b, ms, me)
        val movie = kids.find(_._1 == "mvhd").map { case (_, s, _) =>
          if ((b(s) & 0xff) == 1) (rd32(b, s + 20), rd64(b, s + 24))
          else (rd32(b, s + 12), rd32(b, s + 16))
        }
        val geom = kids.filter(_._1 == "trak").flatMap { case (_, ts, te) =>
          boxScan(b, ts, te).find(_._1 == "tkhd").map { case (_, s, _) =>
            val off = if ((b(s) & 0xff) == 1) s + 88 else s + 76
            ((rd32(b, off) >> 16).toInt, (rd32(b, off + 4) >> 16).toInt)
          }
        }.headOption
        (movie, geom) match {
          case (Some((timescale, duration)), Some((w, h))) if timescale > 0 =>
            Some(MediaFeatures(r.doc_id, b.length, 0, FeatureDim,
              byteFeatures(b), w, h, 0, 0,
              (duration * 1000L / timescale).toInt))
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode + feature-extract. Image payloads (`image/...` except the
    * explicit `image/stub`) decode for real via ImageIO — width/height
    * are the actual pixel dimensions, one frame, luminance-grid
    * features. Audio payloads (`audio/...` except `audio/stub`) decode
    * for real via javax.sound.sampled — true frame count, sample rate,
    * channels, RMS-segment features. Video payloads (`video/...`
    * except `video/stub`) decode their real ISO BMFF metadata —
    * duration_ms, presentation width/height. Any undecodable payload
    * falls back to the stub path (the quarantine-not-crash behavior a
    * 100 TB media scan needs). Stub payloads take the stub path.
    * Batch shape is the real one — one partition-iterator per task,
    * decoder init amortized per partition, never per row. */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (model handle, video codecs);
      // ImageIO and AudioSystem are stateless so neither needs any
      rows.map { r =>
        if (r.media_type.startsWith("image/") && r.media_type != "image/stub") {
          // NonFatal, not just IOException: ImageIO decoders throw
          // RuntimeExceptions (AIOOBE, IllegalArgument, NegativeArraySize)
          // on corrupt-but-recognized payloads — quarantine, never crash
          val img =
            try Option(ImageIO.read(new ByteArrayInputStream(r.media)))
            catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case Some(i) =>
              MediaFeatures(r.doc_id, r.media.length, 1, FeatureDim,
                luminanceGrid(i), i.getWidth, i.getHeight)
            case None => stubFeatures(r)
          }
        } else if (r.media_type.startsWith("audio/") && r.media_type != "audio/stub") {
          audioFeatures(r).getOrElse(stubFeatures(r))
        } else if (r.media_type.startsWith("video/") && r.media_type != "video/stub") {
          videoFeatures(r).getOrElse(stubFeatures(r))
        } else stubFeatures(r)
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
