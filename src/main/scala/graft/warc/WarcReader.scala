package graft.warc

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

/** Streaming WARC parser: an Iterator[WarcRecord] over a (possibly
  * gzipped, possibly multi-member-gzip) WARC stream.
  *
  * cc-pyspark delegates this to warcio/fastwarc (sparkcc.py:367-392); here
  * it is a hand-rolled JVM scanner. Error semantics mirror the reference:
  * a malformed record or truncated archive terminates iteration for that
  * file (counted by the caller), it never throws out of `hasNext`.
  *
  * Gzip: Common-Crawl WARCs are one gzip member per record;
  * `GZIPInputStream` reads concatenated members natively so the stream is
  * logically one continuous WARC file.
  */
final class WarcReader(in: InputStream) extends Iterator[WarcRecord] {

  private val stream = new BufferedInputStream(in, 1 << 16)
  private var nextRec: WarcRecord = _
  private var done = false
  private var failedRecords = 0

  /** Number of records dropped due to parse errors (accumulator feed). */
  def failures: Int = failedRecords

  override def hasNext: Boolean = {
    if (done) return false
    if (nextRec != null) return true
    try {
      nextRec = readRecord()
    } catch {
      case _: Exception =>
        failedRecords += 1
        done = true
    }
    if (nextRec == null) done = true
    !done
  }

  override def next(): WarcRecord = {
    if (!hasNext) throw new NoSuchElementException
    val r = nextRec
    nextRec = null
    r
  }

  /** Close the underlying stream. Long-lived executors process thousands
    * of archives; an unclosed handle per archive exhausts file descriptors
    * long before GC notices.
    */
  def close(): Unit = {
    done = true
    try stream.close() catch { case _: Exception => () }
  }

  /** Read one record; null at clean EOF. */
  private def readRecord(): WarcRecord = {
    var line = readLine()
    // skip inter-record blank lines
    while (line != null && line.isEmpty) line = readLine()
    if (line == null) return null
    if (!line.startsWith("WARC/"))
      throw new IllegalStateException(s"expected WARC version line, got: $line")
    val headers = Map.newBuilder[String, String]
    var l = readLine()
    var lastKey: String = null
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (l != null && l.nonEmpty) {
      if ((l.startsWith(" ") || l.startsWith("\t")) && lastKey != null) {
        acc(lastKey) = acc(lastKey) + " " + l.trim // folded continuation
      } else {
        val i = l.indexOf(':')
        if (i > 0) {
          lastKey = l.substring(0, i).trim
          acc(lastKey) = l.substring(i + 1).trim
        }
      }
      l = readLine()
    }
    if (l == null) throw new EOFException("EOF in WARC header block")
    val len = acc.getOrElse("Content-Length",
      throw new IllegalStateException("missing Content-Length")).toLong
    if (len > Int.MaxValue - 8)
      throw new IllegalStateException(s"record too large: $len")
    val payload = readFully(len.toInt)
    WarcRecord(acc.toMap, payload)
  }

  /** CRLF/LF-terminated ASCII line; null at EOF before any byte. */
  private def readLine(): String = {
    val sb = new java.lang.StringBuilder(128)
    var b = stream.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') sb.append(b.toChar)
      b = stream.read()
    }
    sb.toString
  }

  private def readFully(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = stream.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"EOF in payload at $off/$n")
      off += r
    }
    buf
  }
}

object WarcReader {

  /** True for URLs the reference fetches over HTTP(S) with urllib
    * (sparkcc.py:320-339, 733) rather than a Hadoop filesystem — Common
    * Crawl's public endpoint is https.
    */
  def isHttpUrl(path: String): Boolean =
    path.startsWith("http://") || path.startsWith("https://")

  /** Open a WARC path: http(s) URLs stream via HttpClient (reference
    * sparkcc.py:733's whole-file HTTP fetch); every other scheme goes
    * through the Hadoop FileSystem API — the same code path serves
    * file:, hdfs:, and s3a: URIs (sparkcc.py:279-365's multi-scheme
    * fetch; in this offline environment only file: and loopback http are
    * exercised). Transparently gunzips.
    */
  def open(path: String): WarcReader = {
    val raw = openRaw(path)
    val in = if (path.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
    new WarcReader(in)
  }

  /** Raw multi-scheme byte stream (no gunzip): http(s) via HttpClient,
    * everything else via the Hadoop FileSystem API (file:, hdfs:, s3a:) —
    * the whole-file fetch seam shared with S8 (sparkcc.py:703-764).
    */
  def openRaw(path: String): InputStream =
    if (isHttpUrl(path)) httpStream(path)
    else {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(hadoopConf).open(p, 1 << 16)
    }

  /** Ranged open: stream positioned at `offset` (FSDataInputStream.seek —
    * a ranged GET on object stores; an HTTP `Range` request on http(s)
    * URLs, sparkcc.py:320-339).
    */
  def openAt(path: String, offset: Long): InputStream = {
    if (isHttpUrl(path)) return httpStream(path, Some(s"bytes=$offset-"))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p, 1 << 16)
    in.seek(offset)
    in
  }

  /** Bounded ranged fetch over http(s): one `Range: bytes=o-(o+len-1)` GET
    * per record, the reference's fetch_warc shape (sparkcc.py:320-339).
    * The record bytes are returned in memory — unlike the reference's
    * >2 MiB temp-file spool, the parsed record's payload must materialize
    * on-heap anyway, so spooling would add a disk round-trip for the same
    * peak footprint.
    */
  def httpRange(url: String, offset: Long, length: Int): Array[Byte] = {
    val resp = httpSend(url, Some(s"bytes=$offset-${offset + length - 1}"))
    val in = resp.body()
    try {
      // a server that ignores Range answers 200 with the full body:
      // skip to the offset so the caller still gets the right bytes
      if (resp.statusCode() == 200 && offset > 0) {
        var toSkip = offset
        while (toSkip > 0) {
          val sk = in.skip(toSkip)
          if (sk <= 0) throw new EOFException(s"http skip underrun fetching $url")
          toSkip -= sk
        }
      }
      val buf = new Array[Byte](length)
      var off = 0
      var r = 0
      while (off < length && { r = in.read(buf, off, length - off); r >= 0 })
        off += r
      if (off < length)
        throw new EOFException(s"http range underrun: $off/$length from $url")
      buf
    } finally in.close()
  }

  private def httpStream(url: String, range: Option[String] = None): InputStream =
    httpSend(url, range).body()

  private def httpSend(url: String, range: Option[String])
      : java.net.http.HttpResponse[InputStream] = {
    var attempt = 0
    while (true) {
      // request timeout bounds the wait for response headers — a server
      // that accepts the connection but never answers would otherwise
      // hang the Spark task forever (the reference's urllib path runs
      // under socket timeouts). Transient 5xx on the ranged-GET path
      // gets a short bounded retry before failing the record.
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMinutes(5)).GET()
      range.foreach(b.header("Range", _))
      val resp = httpClient.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofInputStream())
      val code = resp.statusCode()
      // 206 for honored ranges; some servers answer 200 with the full body
      if (code / 100 == 2) return resp
      try resp.body().close() catch { case _: Exception => () }
      if (code / 100 == 5 && attempt < 2) {
        attempt += 1
        Thread.sleep(200L << attempt)
      } else throw new java.io.IOException(s"http $code fetching $url")
    }
    throw new IllegalStateException("unreachable")
  }

  private lazy val httpClient = java.net.http.HttpClient.newBuilder()
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofSeconds(30))
    .build()

  // session conf when the task shipped one (graft.util.HadoopConfs) —
  // a fresh Configuration here would drop spark.hadoop.* (s3a auth etc.)
  private def hadoopConf = graft.util.HadoopConfs.get
}
