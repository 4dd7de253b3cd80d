package graft.warc

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  test("writer → reader round trip preserves records") {
    val tmp = java.nio.file.Files.createTempFile("fix", ".warc.gz").toString
    val offsets = WarcWriter.writeFile(tmp, Fixtures.all)
    assert(offsets.length == Fixtures.all.length)
    val rd = WarcReader.open(tmp)
    val back = rd.toVector
    assert(back.length == Fixtures.all.length)
    assert(rd.failures == 0)
    back.zip(Fixtures.all).foreach { case (b, a) =>
      assert(b.recType == a.recType)
      assert(b.targetUri == a.targetUri)
      assert(java.util.Arrays.equals(b.payload, a.payload))
    }
  }

  test("ranged read: each (offset,length) slice parses independently") {
    val tmp = java.nio.file.Files.createTempFile("fix2", ".warc.gz").toString
    val offsets = WarcWriter.writeFile(tmp, Fixtures.all)
    val raf = new java.io.RandomAccessFile(tmp, "r")
    offsets.zip(Fixtures.all).foreach { case ((off, len), expected) =>
      raf.seek(off)
      val buf = new Array[Byte](len.toInt)
      raf.readFully(buf)
      val rd = new WarcReader(new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(buf)))
      assert(rd.hasNext)
      assert(rd.next().targetUri == expected.targetUri)
    }
  }

  test("truncated archive: parsed records kept, failure counted") {
    val tmp = java.nio.file.Files.createTempFile("fix3", ".warc").toString
    val bos = new java.io.ByteArrayOutputStream()
    // write one good record uncompressed + garbage tail
    val r = Fixtures.responseNoServer
    val head = s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${r.payload.length}\r\n\r\n"
    bos.write(head.getBytes("US-ASCII")); bos.write(r.payload)
    bos.write("\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999\r\n\r\ntrunc".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp), bos.toByteArray)
    val rd = WarcReader.open(tmp)
    val recs = rd.toVector
    assert(recs.length == 1)
    assert(rd.failures == 1)
  }

  test("folded (continuation) WARC headers are joined") {
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.com/a\r\n" +
      " very/long/continuation\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n").getBytes("US-ASCII")
    val rd = new WarcReader(new java.io.ByteArrayInputStream(raw))
    val rec = rd.next()
    assert(rec.targetUri.contains("https://example.com/a very/long/continuation"))
    assert(new String(rec.payload, "US-ASCII") == "hi")
  }

  test("http parsing: status, repeated headers, body split") {
    val h = Fixtures.responseHtml.http.get
    assert(h.statusCode == 200)
    assert(h.headerValues("Server") == Seq("Apache/2.4", "Apache/2.4", "nginx"))
    assert(new String(h.body, "UTF-8").startsWith("<html>"))
    assert(Fixtures.responseRedirect.http.get.statusCode == 301)
  }

  test("predicates") {
    import Predicates._
    assert(isResponse(Fixtures.responseHtml))
    assert(isHtml(Fixtures.responseHtml))
    assert(!isHtml(Fixtures.wetText))
    assert(isWetText(Fixtures.wetText))
    assert(isWatJson(Fixtures.watJson))
    assert(isRedirect(Fixtures.responseRedirect))
    assert(!isRedirect(Fixtures.responseHtml))
    assert(isRobotsTxtArchive("crawl-data/CC-MAIN-2017-13/segments/x/robotstxt/file.warc.gz"))
    assert(!isRobotsTxtArchive("crawl-data/CC-MAIN-2017-13/segments/x/warc/file.warc.gz"))
  }
}
