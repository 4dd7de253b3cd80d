package graft.media

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic container fixtures built byte-by-byte from the public specs
  * (ISO 11172-3 frame headers, RFC 3533 Ogg framing + Vorbis I ident
  * header, ISO 14496-12 boxes) — no codec library involved on either
  * side, which is the point of the probes.
  */
class MediaMetaSpec extends AnyFunSuite {

  /** One MPEG1 Layer III frame: 128 kbps, 44100 Hz, stereo, no padding.
    * Frame length = 1152/8 * 128000 / 44100 = 417 bytes.
    */
  private def mp3Frame: Array[Byte] = {
    val f = new Array[Byte](417)
    f(0) = 0xff.toByte
    f(1) = 0xfb.toByte // sync + MPEG1 + Layer III + no CRC
    f(2) = 0x90.toByte // bitrate idx 9 (128k), rate idx 0 (44100), no pad
    f(3) = 0x00        // stereo
    f
  }

  test("mp3: frame walk counts frames and derives rate/duration") {
    val bytes = Array.fill(40)(mp3Frame).flatten.toArray
    val m = MediaMeta.mp3Meta(bytes).get
    assert(m.sampleRate == 44100 && m.channels == 2 && m.frames == 40)
    assert(math.abs(m.durationS - 40 * 1152.0 / 44100) < 1e-4)
  }

  test("mp3: ID3v2 prefix is skipped; random text is rejected") {
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10) ++ Array.fill(3)(mp3Frame).flatten
    assert(MediaMeta.mp3Meta(id3).get.frames == 3)
    assert(MediaMeta.mp3Meta("just some document text".getBytes("UTF-8")).isEmpty)
  }

  /** Minimal Ogg page: header + one segment holding `body`. */
  private def oggPage(granule: Long, body: Array[Byte], seq: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII")); out.write(0); out.write(2)
    (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xff).toInt)) // LE64
    (0 until 8).foreach(_ => out.write(0)) // serial + seq (unused by probe)
    (0 until 4).foreach(_ => out.write(0)) // checksum (unchecked)
    require(body.length < 255)
    out.write(1); out.write(body.length) // one lacing segment
    out.write(body)
    out.toByteArray
  }

  test("ogg vorbis: rate from ident header, duration from last granule") {
    val ident = new ByteArrayOutputStream()
    ident.write(1); ident.write("vorbis".getBytes("US-ASCII"))
    (0 until 4).foreach(_ => ident.write(0)) // version
    ident.write(2)                           // channels
    // rate 22050 LE32
    ident.write(22050 & 0xff); ident.write((22050 >> 8) & 0xff); ident.write(0); ident.write(0)
    val bytes = oggPage(0, ident.toByteArray, 0) ++
      oggPage(44100, Array[Byte](0x55), 1) // granule = total samples
    val m = MediaMeta.oggMeta(bytes).get
    assert(m.sampleRate == 22050 && m.channels == 2)
    assert(math.abs(m.durationS - 2.0) < 1e-6) // 44100 samples at 22050 Hz
  }

  test("ogg opus: granules run at 48 kHz regardless of input rate") {
    val head = new ByteArrayOutputStream()
    head.write("OpusHead".getBytes("US-ASCII"))
    head.write(1)  // version
    head.write(1)  // channels
    head.write(0); head.write(0) // pre-skip
    head.write(16000 & 0xff); head.write((16000 >> 8) & 0xff); head.write(0); head.write(0)
    val bytes = oggPage(0, head.toByteArray, 0) ++ oggPage(96000, Array[Byte](1), 1)
    val m = MediaMeta.oggMeta(bytes).get
    assert(m.sampleRate == 16000 && m.channels == 1)
    assert(math.abs(m.durationS - 2.0) < 1e-6) // 96000 granules / 48000
  }

  private def box(name: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val size = 8 + body.length
    out.write((size >> 24) & 0xff); out.write((size >> 16) & 0xff)
    out.write((size >> 8) & 0xff); out.write(size & 0xff)
    out.write(name.getBytes("US-ASCII")); out.write(body)
    out.toByteArray
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("mp4: mvhd duration + tkhd dimensions from the box walk") {
    // mvhd v0: flags + creation + modification + timescale 600 + duration 1800
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(1800))
    // tkhd v0: 76 bytes to the 16.16 width/height
    val tkhdBody = new Array[Byte](76 + 8)
    System.arraycopy(be32(640L << 16), 0, tkhdBody, 76, 4)
    System.arraycopy(be32(360L << 16), 0, tkhdBody, 80, 4)
    val moov = box("moov", mvhd ++ box("trak", box("tkhd", tkhdBody)))
    val bytes = box("ftyp", "isom0000".getBytes("US-ASCII")) ++ moov
    val m = MediaMeta.mp4Meta(bytes).get
    assert(m.width == 640 && m.height == 360)
    assert(math.abs(m.durationS - 3.0) < 1e-6) // 1800 / 600
    assert(MediaMeta.mp4Meta("plain text, not a container".getBytes).isEmpty)
  }

  test("probes feed extractFeatures end to end") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2, 2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    import spark.implicits._
    val rows = Seq(
      MediaOps.MediaRow(1L, "audio", "s", Array.fill(5)(mp3Frame).flatten.toArray),
      MediaOps.MediaRow(2L, "video", "s",
        box("ftyp", "isom0000".getBytes("US-ASCII")) ++
          box("moov", box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(100) ++ be32(250)))))
    val got = MediaOps.extractFeatures(spark.createDataset(rows)).collect()
      .map(f => f.media_id -> f).toMap
    assert(got(1L).width == 44100 && got(1L).frames == 5)
    assert(math.abs(got(2L).duration_s - 2.5) < 1e-6)
  }
}
