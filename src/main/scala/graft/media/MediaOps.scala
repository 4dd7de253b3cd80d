package graft.media

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches —
  * the Scala analogue of a `mapInPandas` decode/feature-extract stage.
  *
  * IMAGE decode is real: `imageDims` reads width/height/format from the
  * image header via pure-JVM javax.imageio (PNG/JPEG/GIF/BMP readers ship
  * with the JDK) without decoding pixel data. AUDIO metadata is real for
  * WAV/AIFF/AU (javax.sound.sampled) AND for MP3/Ogg via the pure-JVM
  * container probes in MediaMeta (frame-header walk / granule math):
  * sample rate, channels, frames, duration — O(container structure), no
  * sample decode. VIDEO metadata is real for MP4/ISO-BMFF (box walk:
  * dimensions + duration). What remains STUBBED is actual PCM/pixel
  * decode of compressed codecs — that requires codec libraries this
  * container doesn't ship: `decodeStub` derives deterministic fake
  * features from the bytes for unrecognized payloads, and frame
  * EXTRACTION cuts payload slices. Everything around the decode —
  * schema, Dataset plumbing, batched partition processing, feature
  * aggregation — is real and tested, so a production codec drops into
  * `decodeStub` without touching the plan.
  *
  * Scale notes: payloads stay in executor memory only for the duration of
  * one batch; features are narrow columns so downstream aggregation
  * shuffles bytes-per-row ~100, not the payload. At 100 TB the payload
  * column should be read lazily (parquet column pruning means queries not
  * touching `payload` never read those pages).
  */
object MediaOps {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, source: String,
                            payload: Array[Byte])

  /** For audio rows: width = sample rate (Hz), height = channels,
    * frames = sample-frame count, duration_s = frames / rate.
    */
  final case class MediaFeatures(media_id: Long, kind: String, source: String,
                                 n_bytes: Int, entropy: Double,
                                 width: Int, height: Int, frames: Int,
                                 duration_s: Double)

  /** Image dimensions + format from the header via javax.imageio —
    * metadata only, no pixel decode, so cost is O(header) not O(pixels).
    * None when no installed reader recognizes the bytes.
    */
  private[media] def imageDims(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Audio header metadata via javax.sound.sampled (WAV/AIFF/AU readers
    * ship with the JDK): (sampleRate, channels, frameLength). O(header);
    * no sample decode. None for formats without an installed reader.
    */
  private[media] def audioMeta(bytes: Array[Byte]): Option[(Float, Int, Long)] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      Some((fmt.getSampleRate, fmt.getChannels, aff.getFrameLength.toLong))
    } catch { case _: Exception => None }

  /** Compressed-audio metadata via the pure-JVM container probes
    * (MediaMeta): MP3 frame-header walk, then Ogg Vorbis/Opus granule
    * math. Guarded — a probe over arbitrary bytes must never throw.
    */
  private def compressedAudioMeta(bytes: Array[Byte]): Option[MediaMeta.AudioMeta] =
    try MediaMeta.mp3Meta(bytes).orElse(MediaMeta.oggMeta(bytes))
    catch { case _: Exception => None }

  private def mp4Meta(bytes: Array[Byte]): Option[MediaMeta.VideoMeta] =
    try MediaMeta.mp4Meta(bytes) catch { case _: Exception => None }

  /** Decode one row: real header decode for images, JDK-readable audio
    * (WAV/AIFF/AU), MP3/Ogg audio and MP4 video container metadata;
    * stub only for bytes no probe recognizes — and for actual PCM/pixel
    * decode, which requires a codec this container doesn't ship.
    */
  private def decode(r: MediaRow): MediaFeatures = r.kind match {
    case "image" =>
      imageDims(r.payload) match {
        case Some((w, h, _)) =>
          val stub = decodeStub(r) // n_bytes/entropy are real either way
          stub.copy(width = w, height = h, frames = 1)
        case None => decodeStub(r)
      }
    case "audio" =>
      audioMeta(r.payload) match {
        // getFrameLength can be AudioSystem.NOT_SPECIFIED (-1); treat an
        // unknown length as undecodable rather than emitting frames = -1
        // and a negative duration into the aggregates.
        case Some((rate, channels, frameLen)) if frameLen >= 0 =>
          val stub = decodeStub(r)
          val dur = if (rate > 0) frameLen / rate.toDouble else 0.0
          stub.copy(width = rate.toInt, height = channels,
            frames = frameLen.min(Int.MaxValue).toInt,
            duration_s = math.rint(dur * 1e6) / 1e6)
        case _ =>
          compressedAudioMeta(r.payload) match {
            case Some(m) =>
              decodeStub(r).copy(width = m.sampleRate, height = m.channels,
                frames = m.frames.min(Int.MaxValue).toInt, duration_s = m.durationS)
            case None => decodeStub(r)
          }
      }
    case "video" =>
      mp4Meta(r.payload) match {
        // real container metadata: dimensions + duration from the box
        // walk; frame count would need an stts parse + codec, left 0
        case Some(m) =>
          decodeStub(r).copy(width = m.width, height = m.height,
            frames = 0, duration_s = m.durationS)
        case None => decodeStub(r)
      }
    case _ => decodeStub(r)
  }

  /** STUB decode: deterministic pseudo-features from payload bytes.
    * A real implementation would decode audio duration / video frame
    * count here, batch-wise, reusing one codec context per partition —
    * which is exactly the structure below.
    */
  /** One digest instance per executor thread: getInstance per row would
    * pay a JCA provider lookup + allocation for every record in the
    * decode hot path (the same per-partition-init discipline the codec
    * comments call for). reset() happens inside digest().
    */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val hist = new Array[Int](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
    var ent = 0.0
    val n = math.max(1, bytes.length).toDouble
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) { val p = hist(j) / n; ent -= p * math.log(p) / math.log(2) }
      j += 1
    }
    // fake dims derived deterministically from a content hash. The hash
    // is the first 15 hex chars of the payload MD5 (60 bits, always
    // non-negative) — chosen over Arrays.hashCode because BOTH engines
    // can compute it (DuckDB: CAST('0x' || substr(md5(text),1,15) AS
    // BIGINT)), which is what lets video_frame_sample carry a
    // full-replay oracle instead of a rows-only check.
    val h = java.lang.Long.parseLong(
      md5Local.get().digest(bytes)
        .take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
    val frames = if (r.kind == "video") (1 + (h / 11) % 300).toInt else 1
    MediaFeatures(r.media_id, r.kind, r.source, bytes.length,
      math.rint(ent * 1e6) / 1e6,
      width = (64 + h % 1024).toInt, height = (64 + (h / 7) % 1024).toInt,
      frames = frames,
      duration_s = if (r.kind == "video") math.rint(frames / 30.0 * 1e6) / 1e6 else 0.0)
  }

  /** Batched decode over partitions — one "codec context" per partition,
    * rows processed in groups of `batchSize` (the mapInPandas batch-shape
    * analogue; a vectorized decoder would process each batch as one call).
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaFeatures] =
      org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // per-partition init (codec context, model weights, ...) goes here
      javax.imageio.ImageIO.setUseCache(false) // header probe needs no temp file
      it.grouped(batchSize).flatMap { batch => batch.iterator.map(decode) }
    }
  }

  /** Real image resize: full decode (javax.imageio) + bilinear scale to
    * w×h + PNG re-encode, batched per partition like extractFeatures.
    * Rows whose payload no reader decodes are dropped — the thumbnail
    * column of a multimodal training table. Unlike the O(header)
    * feature probe this touches every pixel; at 100 TB it is the
    * classic payload-heavy map stage: no shuffle, output rows are
    * small (w×h PNG), so executors stream archives through at I/O
    * speed.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int = 64, h: Int = 64)
      : Dataset[(Long, Array[Byte])] = {
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Array[Byte])] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY)
    media.mapPartitions { it =>
      // ImageIO defaults to a disk-backed stream cache per call — pure
      // overhead for in-memory byte arrays (one temp file per image)
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        if (r.kind != "image") Iterator.empty
        else try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (img == null) Iterator.empty
          else {
            val scaled = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", bos)
            Iterator.single((r.media_id, bos.toByteArray))
          }
        } catch { case _: Exception => Iterator.empty }
      }
    }
  }

  /** One sampled video frame: opaque frame bytes + its index/timestamp. */
  final case class SampledFrame(media_id: Long, frame_idx: Int,
                                ts_ms: Long, frame: Array[Byte])

  /** Video frame sampling: emit `n` frames per video row at evenly
    * spaced timestamps. The Spark-side shape is real — one input row
    * fans out to n small frame rows inside a batched mapPartitions, the
    * layout a contact-sheet/vision-encoder stage consumes — but the
    * frame DECODE is the disclosed stub (no video codecs in this
    * container): frames are deterministic slices of the payload and the
    * duration model is decodeStub's. A production codec replaces only
    * the body of `cutFrame`.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int = 4): Dataset[SampledFrame] = {
    implicit val enc: org.apache.spark.sql.Encoder[SampledFrame] =
      org.apache.spark.sql.Encoders.product[SampledFrame]
    media.mapPartitions { it =>
      // per-partition init (codec context) goes here, as in extractFeatures
      def cutFrame(payload: Array[Byte], i: Int): Array[Byte] = {
        // STUB decode: deterministic payload slice standing in for a
        // decoded frame; real impl = seek + decode keyframe at ts
        val len = math.max(1, payload.length / math.max(1, n))
        java.util.Arrays.copyOfRange(payload,
          math.min(i * len, math.max(0, payload.length - 1)),
          math.min((i + 1) * len, payload.length))
      }
      it.filter(_.kind == "video").flatMap { r =>
        // real duration when the payload parses as MP4; stub model else
        val durMs = math.round(mp4Meta(r.payload).map(_.durationS)
          .getOrElse(decodeStub(r).duration_s) * 1000)
        (0 until n).iterator.map { i =>
          SampledFrame(r.media_id, i, if (n <= 1) 0 else i * durMs / (n - 1),
            cutFrame(r.payload, i))
        }
      }
    }
  }

  /** Build a media table from the documents corpus (payload = encoded
    * text bytes standing in for image/audio bytes; kind round-robins).
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaRow] =
      org.apache.spark.sql.Encoders.product[MediaRow]
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("kind", element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")))
      .select(col("doc_id").as("media_id"), col("kind"), col("source"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Deterministic real PNG: pixels derived from the text bytes, encoded
    * with the JDK's imageio PNG writer. Gives the resize path genuinely
    * decodable payloads (the text-bytes stand-ins are not an image any
    * reader accepts), so `image_resize` exercises decode → scale →
    * re-encode end to end.
    */
  private[graft] def syntheticPng(seed: Long, text: String,
                                  w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.max(1, bytes.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val b = bytes(java.lang.Math.floorMod(x + y * w + seed, n)) & 0xff
        img.setRGB(x, y, (b << 16) | (((b * 31) & 0xff) << 8) | (seed & 0xff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table whose image rows carry real decodable PNG payloads
    * (every third document, like `mediaFromDocuments`'s round-robin).
    */
  def mediaWithDecodableImages(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaRow] =
      org.apache.spark.sql.Encoders.product[MediaRow]
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp file per encode
        it.collect {
          case (id, source, text) if id % 3 == 0 =>
            MediaRow(id, "image", source, syntheticPng(id, text))
        }
      }
  }

  /** Registered query: decode features and aggregate per (source, kind).
    * The decode is the disclosed stub, but every stub output is pure
    * arithmetic over the payload bytes, so the ORACLE replays it in
    * SQL byte-for-byte: the byte histogram comes from exploding the
    * hex() encoding of the BLOB two chars at a time (byte-exact for
    * any content, not just ASCII), entropy from the same -Σ p·log2 p,
    * frames/duration from the md5-derived hash. Per-doc entropy is
    * rounded to 6dp on both sides before the group avg, so last-ulp
    * log/summation-order differences cannot surface at the rounded
    * 4dp output.
    */
  val multimodalFeatures: QueryDef = QueryDef(
    "multimodal_features",
    (s, dir) => {
      val feats = extractFeatures(mediaFromDocuments(s, dir))
      feats.toDF()
        .groupBy(col("source"), col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          round(avg(col("entropy")), 4).as("avg_entropy"),
          max(col("frames")).as("max_frames"),
          round(sum(col("duration_s")), 4).as("total_duration_s"))
    },
    Some("""WITH d AS (
        SELECT doc_id, source,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS kind,
               octet_length(CAST(text AS BLOB)) AS plen,
               hex(CAST(text AS BLOB)) AS hx,
               CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        FROM documents),
      b AS (SELECT doc_id, plen, hx, unnest(range(0, plen)) AS i FROM d),
      cnt AS (SELECT doc_id, plen, substr(hx, CAST(2 * i + 1 AS INT), 2) AS byte,
                     COUNT(*) AS c
              FROM b GROUP BY doc_id, plen, byte),
      ent AS (SELECT doc_id,
                ROUND(-SUM((c / CAST(plen AS DOUBLE))
                    * ln(c / CAST(plen AS DOUBLE)) / ln(2)) * 1e6, 0) / 1e6 AS entropy
              FROM cnt GROUP BY doc_id),
      feat AS (
        SELECT d.doc_id, d.source, d.kind, d.plen,
               COALESCE(ent.entropy, 0) AS entropy,
               CASE WHEN kind = 'video' THEN 1 + (h // 11) % 300 ELSE 1 END AS frames
        FROM d LEFT JOIN ent ON d.doc_id = ent.doc_id)
      SELECT source, kind, COUNT(*) AS n, CAST(SUM(plen) AS BIGINT) AS total_bytes,
             ROUND(AVG(entropy), 4) AS avg_entropy,
             CAST(MAX(frames) AS INT) AS max_frames,
             ROUND(SUM(CASE WHEN kind = 'video'
                 THEN ROUND(frames / 30.0, 6) ELSE 0.0 END), 4) AS total_duration_s
      FROM feat GROUP BY source, kind"""))

  /** Exact fixed-point bilinear luma resample 32×24 → 16×16. The
    * standard align-corners-false sample grid lands on rational
    * offsets (x frac always 1/2, y frac 1/4 or 3/4 by row parity), so
    * the whole 4-tap lerp is integer arithmetic over eighths with one
    * floor division — bit-replayable in SQL, unlike AWT's
    * Graphics2D bilinear (whose resampler is JDK-internal). Luma per
    * source pixel is the established (77r + 150g + 29b) >> 8.
    */
  private[media] def bilinearLuma16(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    def luma(x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
    }
    val out = new Array[Int](256)
    var dy = 0
    while (dy < 16) {
      val fy4 = 6 * dy + 1 // fy = (dy+0.5)·1.5 − 0.5 in quarter units
      val y0 = fy4 / 4
      val q = fy4 - y0 * 4 // vertical weight of the lower row, in quarters
      val y1 = math.min(y0 + 1, h - 1)
      var dx = 0
      while (dx < 16) {
        val x0 = 2 * dx // fx = (dx+0.5)·2 − 0.5 = 2dx + 1/2: equal x taps
        val x1 = math.min(x0 + 1, w - 1)
        out(dy * 16 + dx) =
          ((4 - q) * (luma(x0, y0) + luma(x1, y0)) +
            q * (luma(x0, y1) + luma(x1, y1))) / 8
        dx += 1
      }
      dy += 1
    }
    out
  }

  /** Registered query: real decode → EXACT bilinear 16×16 luma resample
    * over the synthetic-PNG corpus, aggregated per id bucket. The
    * decode is the real JDK PNG codec; because PNG is lossless and the
    * payload pixels are the deterministic content formula, the ORACLE
    * recomputes the decoded pixels analytically and replays the
    * fixed-point resample tap-for-tap (the image_dedup_phash pattern) —
    * upgrading this query from rows-only to the full hash gate. The
    * byte-level resize-to-PNG API (`resizeImages`, AWT bilinear +
    * re-encode) stays for the thumbnail-output pipeline and its own
    * round-trip spec.
    */
  val imageResize: QueryDef = QueryDef(
    "image_resize",
    (s, dir) => {
      import s.implicits._
      val thumbs = mediaWithDecodableImages(s, dir).mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val img = try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          } catch { case _: Exception => null }
          if (img == null) Iterator.empty
          else Iterator.single((r.media_id, bilinearLuma16(img)))
        }
      }.toDF("media_id", "thumb")
      thumbs
        .groupBy((col("media_id") % 5).as("bucket"))
        .agg(count(lit(1)).as("n_resized"),
          sum(aggregate(col("thumb"), lit(0L), (a, v) => a + v)).as("total_luma"),
          countDistinct(col("thumb")).as("n_distinct_thumbs"))
    },
    Some("""WITH imgs AS (
        SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n,
               hex(CAST(text AS BLOB)) AS hx
        FROM documents WHERE doc_id % 3 = 0),
      g2 AS (SELECT media_id, n, hx, d % 16 AS dx, d // 16 AS dy
        FROM (SELECT media_id, n, hx, unnest(range(0, 256)) AS d FROM imgs)),
      g3 AS (SELECT media_id, n, hx, dy * 16 + dx AS pos,
               2 * dx AS x0, LEAST(2 * dx + 1, 31) AS x1,
               (6 * dy + 1) // 4 AS y0,
               LEAST((6 * dy + 1) // 4 + 1, 23) AS y1,
               (6 * dy + 1) % 4 AS q
        FROM g2),
      taps AS (SELECT media_id, n, hx, pos, t['x'] AS x, t['y'] AS y, t['w'] AS w
        FROM (SELECT media_id, n, hx, pos,
                unnest([{'x': x0, 'y': y0, 'w': 4 - q}, {'x': x1, 'y': y0, 'w': 4 - q},
                        {'x': x0, 'y': y1, 'w': q}, {'x': x1, 'y': y1, 'w': q}]) AS t
              FROM g3)),
      px AS (SELECT media_id, pos,
               w * ((77 * bv + 150 * ((bv * 31) % 256) + 29 * (media_id % 256)) // 256) AS wl
        FROM (SELECT media_id, pos, w,
                CAST(('0x' || substr(hx,
                  CAST(2 * ((x + y * 32 + media_id) % n) + 1 AS INT), 2)) AS INT) AS bv
              FROM taps)),
      tv AS (SELECT media_id, pos, CAST(SUM(wl) // 8 AS INT) AS v
        FROM px GROUP BY media_id, pos),
      per AS (SELECT media_id, CAST(SUM(v) AS BIGINT) AS s,
               list(v ORDER BY pos) AS tl
        FROM tv GROUP BY media_id)
      SELECT media_id % 5 AS bucket, COUNT(*) AS n_resized,
             CAST(SUM(s) AS BIGINT) AS total_luma,
             CAST(COUNT(DISTINCT tl) AS BIGINT) AS n_distinct_thumbs
      FROM per GROUP BY media_id % 5"""))

  /** Registered query: per-frame-index stats of evenly-spaced frame
    * sampling (4 frames per video row). The frame cut is the disclosed
    * stub, but because the stub is pure arithmetic over the payload
    * (slice bounds from the byte length, duration from the md5-derived
    * content hash), the ORACLE replays the whole fan-out in SQL —
    * frame byte accounting, timestamp spacing, and the duration model
    * are all hash-checked, not just row-counted. A production codec
    * changes only the frame BYTES (not the fan-out shape), at which
    * point this oracle narrows back to the shape columns.
    */
  val videoFrameSample: QueryDef = QueryDef(
    "video_frame_sample",
    (s, dir) => {
      val frames = sampleFrames(mediaFromDocuments(s, dir), 4)
      frames.toDF()
        .groupBy(col("frame_idx"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame"))).as("total_frame_bytes"),
          max(col("ts_ms")).as("max_ts_ms"))
    },
    Some("""WITH vids AS (
        SELECT doc_id, octet_length(CAST(text AS BLOB)) AS plen,
               CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        FROM documents WHERE doc_id % 3 = 2),
      v2 AS (SELECT doc_id, plen, 1 + (h // 11) % 300 AS frames FROM vids),
      v3 AS (
        SELECT doc_id, plen,
               CAST(ROUND(ROUND(frames / 30.0, 6) * 1000, 0) AS BIGINT) AS dur_ms,
               GREATEST(1, plen // 4) AS len
        FROM v2),
      f AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS frame_idx, plen, dur_ms, len
            FROM v3),
      g AS (
        SELECT frame_idx, (frame_idx * dur_ms) // 3 AS ts_ms,
               LEAST((frame_idx + 1) * len, plen)
                 - LEAST(frame_idx * len, GREATEST(0, plen - 1)) AS fbytes
        FROM f)
      SELECT CAST(frame_idx AS INT) AS frame_idx, COUNT(*) AS n_frames,
             CAST(SUM(fbytes) AS BIGINT) AS total_frame_bytes,
             MAX(ts_ms) AS max_ts_ms
      FROM g GROUP BY frame_idx"""))

  /** Build an EXIF APP1 segment (TIFF 6.0 structure, chosen endianness):
    * IFD0 carries make/model/orientation/datetime + the Exif-IFD
    * pointer; the sub-IFD carries pixel dimensions (LONG). Strings are
    * always > 4 bytes here so the offset (not inline) path is
    * exercised; entries are tag-sorted per spec.
    */
  private[media] def exifApp1(orientation: Int, make: String, model: String,
                              dateTime: String, px: Int, py: Int,
                              bigEndian: Boolean = false): Array[Byte] = {
    val order = if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val dtB = (dateTime + "\u0000").getBytes("US-ASCII")
    require(makeB.length > 4 && modelB.length > 4 && dtB.length > 4)
    val ifd0Start = 8
    val ifd0Size = 2 + 5 * 12 + 4
    val exifStart = ifd0Start + ifd0Size
    val exifSize = 2 + 2 * 12 + 4
    val dataStart = exifStart + exifSize
    val tiffLen = dataStart + makeB.length + modelB.length + dtB.length
    val bb = java.nio.ByteBuffer.allocate(tiffLen).order(order)
    bb.put((if (bigEndian) "MM" else "II").getBytes("US-ASCII"))
    bb.putShort(42).putInt(ifd0Start)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3) { bb.putShort(v.toShort); bb.putShort(0) } // SHORT inline
      else bb.putInt(v)
    }
    val makeOff = dataStart
    val modelOff = makeOff + makeB.length
    val dtOff = modelOff + modelB.length
    bb.putShort(5)
    entry(0x010f, 2, makeB.length, makeOff)
    entry(0x0110, 2, modelB.length, modelOff)
    entry(0x0112, 3, 1, orientation)
    entry(0x0132, 2, dtB.length, dtOff)
    entry(0x8769, 4, 1, exifStart)
    bb.putInt(0) // no IFD1
    bb.putShort(2)
    entry(0xa002, 4, 1, px)
    entry(0xa003, 4, 1, py)
    bb.putInt(0)
    bb.put(makeB).put(modelB).put(dtB)
    val tiff = bb.array()
    // APP1 marker + 2-byte length (includes itself) + "Exif\0\0" + TIFF
    val app1Len = 2 + 6 + tiff.length
    val seg = java.nio.ByteBuffer.allocate(2 + app1Len)
    seg.put(0xff.toByte).put(0xe1.toByte)
    seg.putShort(app1Len.toShort)
    seg.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    seg.put(tiff)
    seg.array()
  }

  /** Splice an EXIF APP1 right after a JPEG's SOI. */
  private[media] def withExif(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length > 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val out = new Array[Byte](jpeg.length + app1.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }

  /** Registered query: synthesize real JPEGs (JDK encoder) with spliced
    * EXIF whose field values are pure doc_id arithmetic, parse them
    * BACK with MediaMeta.exifMeta, and aggregate. The oracle replays
    * the value synthesis directly from doc_id — a hash match proves the
    * APP1 write → JPEG splice → segment/IFD parse round-trip is
    * lossless, the same replay trick as the LSH oracle. One map stage +
    * one small agg; payload bytes never shuffle.
    */
  val imageExif: QueryDef = QueryDef(
    "image_exif",
    (s, dir) => {
      import s.implicits._
      val parsed = Tables(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          val baseJpeg = bos.toByteArray
          it.collect { case id if id % 3 == 0 =>
            val app1 = exifApp1(
              orientation = (id % 8 + 1).toInt,
              make = "graft",
              model = s"cam${id % 5}",
              dateTime = f"2024:01:${id % 28 + 1}%02d 12:00:00",
              px = (32 + id % 16).toInt, py = 24,
              bigEndian = id % 2 == 0)
            val m = MediaMeta.exifMeta(withExif(baseJpeg, app1))
              .getOrElse(sys.error(s"exif round-trip failed for doc $id"))
            (m.orientation, m.model, m.dateTime, m.pixelX.toLong)
          }
        }.toDF("orientation", "model", "date_time", "px")
      parsed.groupBy(col("orientation"), col("model"))
        .agg(count(lit(1)).as("n"), min(col("date_time")).as("min_dt"),
          sum(col("px")).as("sum_px"))
    },
    Some("""SELECT CAST(doc_id % 8 + 1 AS INT) AS orientation,
        'cam' || CAST(doc_id % 5 AS VARCHAR) AS model,
        COUNT(*) AS n,
        MIN('2024:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
            || ' 12:00:00') AS min_dt,
        CAST(SUM(32 + doc_id % 16) AS BIGINT) AS sum_px
      FROM documents WHERE doc_id % 3 = 0
      GROUP BY doc_id % 8 + 1, doc_id % 5"""))

  val all: Seq[QueryDef] =
    Seq(multimodalFeatures, imageResize, videoFrameSample, imageExif)
}
