package graft.media

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MediaOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("media table: binary payload with typed metadata") {
    val media = MediaOps.mediaFromDocuments(spark, sf)
    val row = media.head()
    assert(row.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(row.kind))
    assert(media.count() == 500)
  }

  test("feature extraction is deterministic and batch-safe") {
    val media = MediaOps.mediaFromDocuments(spark, sf)
    val a = MediaOps.extractFeatures(media, batchSize = 7).collect()
      .sortBy(_.media_id)
    val b = MediaOps.extractFeatures(media, batchSize = 64).collect()
      .sortBy(_.media_id)
    assert(a.toSeq == b.toSeq) // batch shape must not change results
    assert(a.forall(f => f.n_bytes > 0 && f.entropy > 0))
    assert(a.forall(f => f.width >= 64 && f.height >= 64))
  }

  test("real audio decode: WAV header yields rate/channels/frames/duration") {
    // 0.5 s of 16-bit mono PCM at 8 kHz, written through the JDK encoder
    val rate = 8000f
    val nFrames = 4000
    val pcm = new Array[Byte](nFrames * 2)
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    assert(MediaOps.audioMeta(wav).contains((rate, 1, nFrames.toLong)))

    import spark.implicits._
    val media = Seq(MediaOps.MediaRow(1L, "audio", "test", wav)).toDS()
    val f = MediaOps.extractFeatures(media).head()
    assert(f.width == 8000 && f.height == 1 && f.frames == 4000)
    assert(f.duration_s == 0.5)
  }

  test("real image resize: decode, bilinear scale, PNG re-encode") {
    // 8×8 red PNG through the JDK encoder
    val src = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8) src.setRGB(x, y, 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val png = bos.toByteArray

    import spark.implicits._
    val media = Seq(
      MediaOps.MediaRow(1L, "image", "t", png),
      MediaOps.MediaRow(2L, "image", "t", "not an image".getBytes("UTF-8")),
      MediaOps.MediaRow(3L, "audio", "t", png)).toDS()
    val thumbs = MediaOps.resizeImages(media, 4, 4).collect()
    assert(thumbs.length == 1 && thumbs(0)._1 == 1L) // undecodable + non-image dropped
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(thumbs(0)._2))
    assert(back.getWidth == 4 && back.getHeight == 4)
    assert((back.getRGB(2, 2) & 0xffffff) == 0xff0000) // still red
  }

  test("frame sampling fans out n frames per video with spaced timestamps") {
    import spark.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val media = Seq(
      MediaOps.MediaRow(1L, "video", "t", payload),
      MediaOps.MediaRow(2L, "image", "t", payload)).toDS()
    val frames = MediaOps.sampleFrames(media, n = 4).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)                       // images don't fan out
    assert(frames.forall(_.media_id == 1L))
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    assert(frames.head.ts_ms == 0 && frames.last.ts_ms > 0)
    assert(frames.forall(_.frame.nonEmpty))
    // deterministic: same input → same frames
    val again = MediaOps.sampleFrames(media, n = 4).collect().sortBy(_.frame_idx)
    assert(again.map(_.frame.toSeq).toSeq == frames.map(_.frame.toSeq).toSeq)
  }

  test("registered query aggregates per source and kind") {
    val df = MediaOps.multimodalFeatures.fn(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) > 0))
  }
}
