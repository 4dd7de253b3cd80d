package graft.warc

/** Sample WARC content for demos/smoke runs (stands in for the reference's
  * get-data.sh sample crawl download — zero-egress here). `main` writes a
  * small .warc.gz; the test fixtures build on these records too.
  */
object SampleWarc {

  def httpPayload(statusLine: String, headers: Seq[(String, String)],
                  body: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder(statusLine).append("\r\n")
    headers.foreach { case (k, v) => head.append(k).append(": ").append(v).append("\r\n") }
    head.append("\r\n")
    head.toString.getBytes("ISO-8859-1") ++ body
  }

  def response(uri: String, body: Array[Byte],
               httpHeaders: Seq[(String, String)] = Seq("Content-Type" -> "text/html"),
               warcHeaders: Map[String, String] = Map.empty,
               status: String = "HTTP/1.1 200 OK"): WarcRecord = {
    val payload = httpPayload(status, httpHeaders, body)
    WarcRecord(Map(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2017-03-22T00:00:00Z",
      "Content-Type" -> "application/http; msgtype=response",
      "Content-Length" -> payload.length.toString) ++ warcHeaders, payload)
  }

  def robots(uri: String, body: Array[Byte], status: String = "HTTP/1.1 200 OK"): WarcRecord =
    response(uri, body, httpHeaders = Seq("Content-Type" -> "text/plain"), status = status)

  /** A representative mix: HTML responses with varied Server headers,
    * a redirect, robots.txt, WET text, and a WAT envelope.
    */
  def records(nHtmlPerServer: Int = 3): Seq[WarcRecord] = {
    val servers = Seq("Apache", "nginx", "Microsoft-IIS/7.5", "cloudflare-nginx")
    val html = for {
      s <- servers
      i <- 1 to nHtmlPerServer
    } yield response(
      s"https://site-$s-$i.example.com/index.html".replaceAll("[^a-zA-Z0-9:/.\\-]", "-"),
      s"<html><head><title>Page $i</title></head><body><p>content $i from $s</p><a href='/next'>next</a></body></html>".getBytes("UTF-8"),
      httpHeaders = Seq("Content-Type" -> "text/html", "Server" -> s),
      warcHeaders = Map("WARC-Identified-Payload-Type" -> "text/html",
        "WARC-IP-Address" -> s"10.0.0.${i % 255}"))
    val redirect = response("http://old.example.org/here", Array.emptyByteArray,
      httpHeaders = Seq("Location" -> "https://new.example.org/there"),
      status = "HTTP/1.1 301 Moved Permanently")
    val robotsRec = robots("https://www.example.com/robots.txt",
      "User-agent: *\nSitemap: https://www.example.com/sitemap.xml\n".getBytes("UTF-8"))
    val wet = WarcRecord(Map(
      "WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "https://www.example.com/index.html",
      "Content-Type" -> "text/plain", "Content-Length" -> "0"),
      "the quick brown fox jumps over the lazy dog the end".getBytes("UTF-8"))
    html ++ Seq(redirect, robotsRec, wet)
  }

  /** CLI: write a sample archive. Usage: SampleWarc <out.warc.gz> [n] */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sample.warc.gz")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val offsets = WarcWriter.writeFile(out, records(n))
    println(s"wrote ${offsets.length} records to $out")
  }
}
