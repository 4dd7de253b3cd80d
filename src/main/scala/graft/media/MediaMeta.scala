package graft.media

/** Pure-JVM metadata probes for compressed audio/video containers — the
  * formats the JDK ships no reader for. Each probe parses public
  * container structure only (frame headers / pages / boxes), never
  * codec payloads, so cost is O(header bytes scanned) and no native
  * codec is required:
  *
  *  - MP3: MPEG audio frame-header walk (ISO/IEC 11172-3). Sample rate,
  *    channels, frame count → duration; ID3v2 prefix skipped.
  *  - Ogg Vorbis/Opus: identification header for the sample rate, last
  *    page's granule position for total samples (RFC 3533 framing).
  *  - MP4/ISO-BMFF: box walk to moov/mvhd for timescale+duration and
  *    trak/tkhd for track dimensions (ISO/IEC 14496-12).
  *
  * PCM sample decode / frame pixel decode remain out of scope (that is
  * the codec itself); MediaOps stubs those and documents it.
  */
object MediaMeta {

  final case class AudioMeta(sampleRate: Int, channels: Int, frames: Long,
                             durationS: Double)
  final case class VideoMeta(width: Int, height: Int, durationS: Double)

  // ---- MP3 ----------------------------------------------------------

  // bitrate (kbps) tables, index 1-14; 0/15 invalid (ISO 11172-3 table)
  private val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val SampleRateV1 = Array(44100, 48000, 32000, 0)
  private val SampleRateV2 = Array(22050, 24000, 16000, 0)
  private val SampleRateV25 = Array(11025, 12000, 8000, 0)

  /** Walk MPEG-audio (layer III) frames: returns (rate, channels, frames,
    * duration). None unless ≥2 valid consecutive frames (guards against
    * random byte runs that happen to contain one sync pattern).
    */
  def mp3Meta(bytes: Array[Byte]): Option[AudioMeta] = {
    var pos = 0
    // skip ID3v2: "ID3" + ver(2) + flags + syncsafe 28-bit size
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + sz
    }
    var frames = 0L
    var rate = 0
    var channels = 0
    var seconds = 0.0
    while (pos + 4 <= bytes.length) {
      val b1 = bytes(pos) & 0xff; val b2 = bytes(pos + 1) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) {
        // lost sync: only scan forward before the first valid frame
        if (frames > 0) pos = bytes.length else pos += 1
      } else {
        val versionBits = (b2 >> 3) & 0x3 // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (b2 >> 1) & 0x3   // 1=Layer III
        val b3 = bytes(pos + 2) & 0xff; val b4 = bytes(pos + 3) & 0xff
        val bitrateIdx = (b3 >> 4) & 0xf
        val rateIdx = (b3 >> 2) & 0x3
        val padding = (b3 >> 1) & 0x1
        val chanMode = (b4 >> 6) & 0x3
        val rates = versionBits match {
          case 3 => SampleRateV1
          case 2 => SampleRateV2
          case 0 => SampleRateV25
          case _ => null
        }
        if (rates == null || layerBits != 1 || bitrateIdx == 0 || bitrateIdx == 15 ||
            rates(rateIdx) == 0) {
          if (frames > 0) pos = bytes.length else pos += 1
        } else {
          val sr = rates(rateIdx)
          val kbps = if (versionBits == 3) BitrateV1L3(bitrateIdx) else BitrateV2L3(bitrateIdx)
          val samplesPerFrame = if (versionBits == 3) 1152 else 576
          val frameLen = samplesPerFrame / 8 * kbps * 1000 / sr + padding
          if (frameLen <= 4) { if (frames > 0) pos = bytes.length else pos += 1 }
          else {
            frames += 1
            rate = sr
            channels = if (chanMode == 3) 1 else 2
            seconds += samplesPerFrame.toDouble / sr
            pos += frameLen
          }
        }
      }
    }
    if (frames >= 2) Some(AudioMeta(rate, channels, frames,
      math.rint(seconds * 1e6) / 1e6))
    else None
  }

  // ---- Ogg ----------------------------------------------------------

  /** Ogg framing walk: sample rate from the first packet's Vorbis/Opus
    * identification header, total samples from the highest granule
    * position, duration = granule / rate (Opus granules run at 48 kHz
    * regardless of the input rate, per RFC 7845 §4).
    */
  def oggMeta(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes.length < 58 || bytes(0) != 'O' || bytes(1) != 'g' ||
      bytes(2) != 'g' || bytes(3) != 'S') return None
    var rate = 0
    var channels = 0
    var granuleRate = 0
    var lastGranule = 0L
    var pos = 0
    while (pos + 27 <= bytes.length &&
        bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
        bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S') {
      var granule = 0L
      var i = 7
      while (i >= 0) { granule = (granule << 8) | (bytes(pos + 6 + i) & 0xffL); i -= 1 }
      if (granule > lastGranule) lastGranule = granule
      val nSegs = bytes(pos + 26) & 0xff
      if (pos + 27 + nSegs > bytes.length) return None
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += bytes(pos + 27 + s) & 0xff; s += 1 }
      val body = pos + 27 + nSegs
      if (rate == 0 && body + 16 <= bytes.length) {
        // "\x01vorbis": channels @ +11, rate LE32 @ +12 (Vorbis I §4.2.2)
        if (bytes(body) == 1 && new String(bytes, body + 1, 6, "US-ASCII") == "vorbis") {
          channels = bytes(body + 11) & 0xff
          rate = (bytes(body + 12) & 0xff) | ((bytes(body + 13) & 0xff) << 8) |
            ((bytes(body + 14) & 0xff) << 16) | ((bytes(body + 15) & 0xff) << 24)
          granuleRate = rate
        } else if (new String(bytes, body, 8, "US-ASCII") == "OpusHead") {
          channels = bytes(body + 9) & 0xff
          rate = (bytes(body + 12) & 0xff) | ((bytes(body + 13) & 0xff) << 8) |
            ((bytes(body + 14) & 0xff) << 16) | ((bytes(body + 15) & 0xff) << 24)
          granuleRate = 48000
        }
      }
      pos = body + bodyLen
    }
    if (rate <= 0 || granuleRate <= 0) None
    else Some(AudioMeta(rate, channels, lastGranule,
      math.rint(lastGranule.toDouble / granuleRate * 1e6) / 1e6))
  }

  // ---- MP4 / ISO-BMFF -----------------------------------------------

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long = (be32(b, o) << 32) | be32(b, o + 4)

  /** Box walk: duration from moov/mvhd, dimensions from the first
    * trak/tkhd with non-zero width×height. Requires an ftyp or moov box
    * at the top level to accept the bytes as BMFF at all.
    */
  def mp4Meta(bytes: Array[Byte]): Option[VideoMeta] = {
    var duration = -1.0
    var width = 0
    var height = 0
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        var size = be32(bytes, pos.toInt)
        val name = new String(bytes, pos.toInt + 4, 4, "US-ASCII")
        var header = 8L
        if (size == 1 && pos + 16 <= end) { size = be64(bytes, pos.toInt + 8); header = 16 }
        else if (size == 0) size = end - pos // box runs to end of enclosing
        if (size < header || pos + size > end) return
        val body = pos + header
        name match {
          case "moov" | "trak" if depth < 4 => walk(body, pos + size, depth + 1)
          case "mvhd" if size >= header + 20 =>
            val version = bytes(body.toInt) & 0xff
            val (timescale, dur) =
              if (version == 1) (be32(bytes, body.toInt + 20), be64(bytes, body.toInt + 24))
              else (be32(bytes, body.toInt + 12), be32(bytes, body.toInt + 16))
            if (timescale > 0) duration = math.rint(dur.toDouble / timescale * 1e6) / 1e6
          case "tkhd" if size >= header + 84 && width == 0 =>
            val version = bytes(body.toInt) & 0xff
            val dimOff = body.toInt + (if (version == 1) 88 else 76)
            if (dimOff + 8 <= end) {
              val w = (be32(bytes, dimOff) >> 16).toInt     // 16.16 fixed point
              val h = (be32(bytes, dimOff + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = w; height = h }
            }
          case _ => ()
        }
        pos += size
      }
    }
    if (bytes.length < 12) return None
    val first = new String(bytes, 4, 4, "US-ASCII")
    if (first != "ftyp" && first != "moov") return None
    walk(0, bytes.length.toLong, 0)
    if (duration >= 0) Some(VideoMeta(width, height, duration)) else None
  }

  // ---- JPEG EXIF (TIFF IFD walk) ------------------------------------

  /** EXIF primary-image metadata (TIFF 6.0 / EXIF 2.3 public structure):
    * orientation, camera make/model, capture datetime, and the Exif
    * sub-IFD's pixel dimensions. Byte-level IFD walk, both endiannesses,
    * bounds-checked everywhere — a probe over arbitrary bytes must never
    * throw.
    */
  final case class ExifMeta(orientation: Int, make: String, model: String,
                            dateTime: String, pixelX: Int, pixelY: Int)

  def exifMeta(bytes: Array[Byte]): Option[ExifMeta] = {
    // JPEG segment walk to APP1 "Exif\u0000\u0000"
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    var tiff = -1
    while (tiff < 0 && pos + 4 <= bytes.length && (bytes(pos) & 0xff) == 0xff) {
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) pos += 2
      else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        if (marker == 0xe1 && len >= 8 &&
            bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
            bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
            bytes(pos + 8) == 0 && bytes(pos + 9) == 0)
          tiff = pos + 10
        else if (marker == 0xda) return None // entropy-coded data begins
        pos += 2 + len
      }
    }
    if (tiff < 0 || tiff + 8 > bytes.length) return None
    val le = bytes(tiff) == 'I' && bytes(tiff + 1) == 'I'
    val be = bytes(tiff) == 'M' && bytes(tiff + 1) == 'M'
    if (!le && !be) return None
    def u16(o: Int): Int =
      if (o + 2 > bytes.length) -1
      else if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else if (le) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return None

    var orientation = 0; var make = ""; var model = ""; var dateTime = ""
    var pixelX = 0; var pixelY = 0; var exifIfd = -1L
    def ascii(off: Int, n: Int): String =
      if (n <= 0 || off < 0 || off + n > bytes.length) ""
      else new String(bytes, off, n, "US-ASCII").takeWhile(_ != 0).trim
    def walkIfd(ifdOff: Long, depth: Int): Unit = {
      if (depth > 2 || ifdOff < 0) return
      val base = tiff + ifdOff.toInt
      val n = u16(base)
      if (n < 0 || n > 256) return
      var i = 0
      while (i < n) {
        val e = base + 2 + i * 12
        val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
        // value fits in 4 bytes inline, else the 4 bytes are an offset
        def valOff: Int = {
          val sz = typ match {
            case 1 | 2 | 7 => 1; case 3 => 2; case 4 | 9 => 4; case _ => 8
          }
          if (sz * cnt <= 4) e + 8 else tiff + u32(e + 8).toInt
        }
        def shortOrLong: Int =
          (if (typ == 3) u16(valOff) else u32(valOff).toInt)
        tag match {
          case 0x0112 => orientation = u16(e + 8)
          case 0x010f => make = ascii(valOff, cnt.toInt)
          case 0x0110 => model = ascii(valOff, cnt.toInt)
          case 0x0132 => dateTime = ascii(valOff, cnt.toInt)
          case 0x8769 => exifIfd = u32(e + 8)
          case 0xa002 => pixelX = shortOrLong
          case 0xa003 => pixelY = shortOrLong
          case _ => ()
        }
        i += 1
      }
    }
    walkIfd(u32(tiff + 4), 0)
    if (exifIfd >= 0) walkIfd(exifIfd, 1)
    if (orientation == 0 && make.isEmpty && model.isEmpty && dateTime.isEmpty
        && pixelX == 0 && pixelY == 0) None
    else Some(ExifMeta(orientation, make, model, dateTime, pixelX, pixelY))
  }
}
