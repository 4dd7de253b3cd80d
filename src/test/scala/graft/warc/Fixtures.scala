package graft.warc

/** Synthetic WARC records per FIXTURES.md §1 (reference test shapes from
  * test_sitemaps_from_robotstxt.py:20-31).
  */
object Fixtures {

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

  val responseHtml: WarcRecord = response(
    "https://www.example.com/index.html",
    ("""<html><head><title>T &amp; T</title>
       |<script>var x = "<p>ignored</p>";</script>
       |<style>.c { color: red }</style></head>
       |<body><h1>Hello &eacute;</h1><p>World <b>bold</b></p>
       |<a href="/page2">link</a></body></html>""").stripMargin.getBytes("UTF-8"),
    httpHeaders = Seq(
      "Content-Type" -> "text/html; charset=utf-8",
      "Server" -> "Apache/2.4", "Server" -> "Apache/2.4", "Server" -> "nginx"),
    warcHeaders = Map(
      "WARC-Identified-Payload-Type" -> "text/html",
      "WARC-IP-Address" -> "93.184.216.34"))

  val responseNoServer: WarcRecord = response(
    "http://noserver.test/x", "<html><body>hi</body></html>".getBytes("UTF-8"))

  val responseRedirect: WarcRecord = response(
    "http://old.example.org/here", Array.emptyByteArray,
    httpHeaders = Seq("Location" -> "/there", "Content-Type" -> "text/html"),
    status = "HTTP/1.1 301 Moved Permanently")

  def robots(uri: String, body: Array[Byte], status: String = "HTTP/1.1 200 OK"): WarcRecord =
    response(uri, body, httpHeaders = Seq("Content-Type" -> "text/plain"), status = status)

  val robotsTxt: WarcRecord = robots(
    "https://www.example.com/robots.txt",
    ("User-agent: *\nDisallow: /private\n" +
      "Sitemap: https://www.example.com/sitemap.xml\n" +
      "sitemap: /sitemap2.xml\n").getBytes("UTF-8"))

  val robotsUtf16: WarcRecord = robots(
    "https://utf16.example.com/robots.txt",
    "Sitemap: https://utf16.example.com/sitemap.xml\n".getBytes("UTF-16"))

  val wetText: WarcRecord = WarcRecord(Map(
    "WARC-Type" -> "conversion",
    "WARC-Target-URI" -> "https://www.example.com/index.html",
    "Content-Type" -> "text/plain",
    "Content-Length" -> "0"),
    "Hello World hello café 123 number\nsecond LINE hello".getBytes("UTF-8"))

  val watJson: WarcRecord = {
    val json =
      """{"Envelope": {
        |  "WARC-Header-Metadata": {
        |    "WARC-Type": "response",
        |    "WARC-Target-URI": "https://www.example.com/page.html",
        |    "WARC-IP-Address": "93.184.216.34"},
        |  "Payload-Metadata": {"HTTP-Response-Metadata": {
        |    "Headers": {
        |      "Server": "Apache/2.4",
        |      "Link": "<https://cdn.example.net/style.css>; rel=preload"},
        |    "HTML-Metadata": {
        |      "Head": {
        |        "Base": "https://www.example.com/base/",
        |        "Link": [{"url": "favicon.ico", "rel": "icon"}],
        |        "Metas": [{"property": "og:image", "content": "https://img.example.org/pic.png"},
        |                  {"name": "description", "content": "not a link"}],
        |        "Scripts": [{"url": "app.js"}]},
        |      "Links": [
        |        {"url": "https://other.example.org/x"},
        |        {"href": "relative/page.html"},
        |        {"url": "mailto:a@b.c"}]}}}}}""".stripMargin
    WarcRecord(Map(
      "WARC-Type" -> "metadata",
      "WARC-Target-URI" -> "https://www.example.com/page.html",
      "Content-Type" -> "application/json",
      "Content-Length" -> json.length.toString), json.getBytes("UTF-8"))
  }

  val all: Seq[WarcRecord] =
    Seq(responseHtml, responseNoServer, responseRedirect, robotsTxt, wetText, watJson)
}
