package graft.warc

/** In-JVM model of one WARC record (WARC/1.0-1.1, ISO 28500).
  *
  * Mirrors what cc-pyspark consumes from warcio's ArcWarcRecord
  * (reference sparkcc.py:381-410): the WARC header map, the record type,
  * and the raw payload. HTTP parsing is lazy — most jobs filter on record
  * type / identified payload type before ever touching the body.
  *
  * The case class is Spark-encodable (Map + Array[Byte] are supported by
  * the product encoder), so `Dataset[WarcRecord]` works directly.
  */
final case class WarcRecord(
    headers: Map[String, String],
    payload: Array[Byte]) {

  private def h(name: String): Option[String] =
    headers.get(name).orElse {
      val lower = name.toLowerCase
      headers.collectFirst { case (k, v) if k.toLowerCase == lower => v }
    }

  def recType: String = h("WARC-Type").getOrElse("")
  def targetUri: Option[String] = h("WARC-Target-URI")
  def ipAddress: Option[String] = h("WARC-IP-Address")
  def contentType: Option[String] = h("Content-Type")
  def date: Option[String] = h("WARC-Date")
  def recordId: Option[String] = h("WARC-Record-ID")
  def identifiedPayloadType: Option[String] = h("WARC-Identified-Payload-Type")

  /** Parsed HTTP response (for response records); None if not HTTP. */
  lazy val http: Option[HttpResponse] = HttpResponse.parse(payload)

  /** Body after HTTP headers for response records, raw payload otherwise. */
  def contentBytes: Array[Byte] =
    if (recType == "response") http.map(_.body).getOrElse(payload) else payload
}

/** Minimal HTTP/1.x response: status line + repeatable headers + body. */
final case class HttpResponse(
    statusLine: String,
    headers: Seq[(String, String)],
    body: Array[Byte]) {

  def statusCode: Int = {
    val parts = statusLine.split(" ", 3)
    if (parts.length >= 2) parts(1).takeWhile(_.isDigit) match {
      case "" => -1
      case d  => d.toInt
    } else -1
  }

  def header(name: String): Option[String] = {
    val lower = name.toLowerCase
    headers.collectFirst { case (k, v) if k.toLowerCase == lower => v }
  }

  /** All values of a repeatable header, in order (server_count.py:52-67
    * counts *distinct* Server values per response).
    */
  def headerValues(name: String): Seq[String] = {
    val lower = name.toLowerCase
    headers.collect { case (k, v) if k.toLowerCase == lower => v }
  }
}

object HttpResponse {
  private val Crlf2 = "\r\n\r\n".getBytes("US-ASCII")

  /** Split an HTTP message payload into head + body at the first blank
    * line; tolerate bare-LF separators like warcio does.
    */
  def parse(payload: Array[Byte]): Option[HttpResponse] = {
    if (payload.length < 5) return None
    val probe = new String(payload, 0, math.min(5, payload.length), "US-ASCII")
    if (!probe.startsWith("HTTP/")) return None
    var split = indexOf(payload, Crlf2)
    var headLen = split
    var bodyStart = split + 4
    if (split < 0) {
      split = indexOf(payload, "\n\n".getBytes("US-ASCII"))
      if (split < 0) { headLen = payload.length; bodyStart = payload.length }
      else { headLen = split; bodyStart = split + 2 }
    }
    val head = new String(payload, 0, headLen, "ISO-8859-1")
    val lines = head.split("\r?\n").toSeq
    if (lines.isEmpty) return None
    val hdrs = lines.tail.flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None else Some(line.substring(0, i).trim -> line.substring(i + 1).trim)
    }
    Some(HttpResponse(lines.head.trim, hdrs,
      java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)))
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
