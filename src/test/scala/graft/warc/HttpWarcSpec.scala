package graft.warc

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** HTTP(S) fetch path (reference sparkcc.py:320-339 ranged GET +
  * sparkcc.py:733 whole-file GET): a loopback server serves the WARC
  * fixture, with and without Range support, and the same `open`/
  * `httpRange`/`fetchRecords` seams used for Hadoop schemes must produce
  * identical records.
  */
class HttpWarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val (bytes, offsets) = {
    val tmp = java.nio.file.Files.createTempFile("http", ".warc.gz")
    val off = WarcWriter.writeFile(tmp.toString, Fixtures.all)
    (java.nio.file.Files.readAllBytes(tmp), off)
  }

  /** Serve `bytes` at /f.warc.gz; honors Range iff `ranges` is true. */
  private def withServer(ranges: Boolean)(body: String => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/f.warc.gz", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val rangeHdr = Option(ex.getRequestHeaders.getFirst("Range"))
        val out = rangeHdr match {
          case Some(r) if ranges && r.startsWith("bytes=") =>
            val Array(a, b) = r.stripPrefix("bytes=").split("-", 2)
            val from = a.toInt
            val to = if (b.isEmpty) bytes.length - 1 else math.min(b.toInt, bytes.length - 1)
            val slice = java.util.Arrays.copyOfRange(bytes, from, to + 1)
            ex.sendResponseHeaders(206, slice.length)
            slice
          case _ =>
            ex.sendResponseHeaders(200, bytes.length)
            bytes
        }
        ex.getResponseBody.write(out)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/f.warc.gz")
    finally server.stop(0)
  }

  test("whole-file fetch over http: same records as local open") {
    withServer(ranges = true) { url =>
      val back = WarcReader.open(url).toVector
      assert(back.length == Fixtures.all.length)
      back.zip(Fixtures.all).foreach { case (b, a) =>
        assert(b.recType == a.recType)
        assert(java.util.Arrays.equals(b.payload, a.payload))
      }
    }
  }

  test("httpRange: each (offset,length) slice parses independently") {
    withServer(ranges = true) { url =>
      offsets.zip(Fixtures.all).foreach { case ((off, len), expected) =>
        val buf = WarcReader.httpRange(url, off, len.toInt)
        val rd = new WarcReader(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(buf)))
        assert(rd.hasNext)
        assert(rd.next().targetUri == expected.targetUri)
      }
    }
  }

  test("httpRange against a server that ignores Range still lands on offset") {
    withServer(ranges = false) { url =>
      val (off, len) = offsets.last
      val buf = WarcReader.httpRange(url, off, len.toInt)
      val rd = new WarcReader(new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(buf)))
      assert(rd.next().targetUri == Fixtures.all.last.targetUri)
    }
  }

  test("S8 whole-file processor over an http:// manifest entry (md5sum)") {
    withServer(ranges = true) { url =>
      val manifest = java.nio.file.Files.createTempFile("m_http", ".txt")
      java.nio.file.Files.writeString(manifest, url + "\n")
      val rows = graft.jobs.FileProcessorJob.md5sum(spark, manifest.toString, 1)
        .collect()
      assert(rows.length == 1)
      assert(rows(0).getString(0) == url)
      val md = java.security.MessageDigest.getInstance("MD5")
      val expected = md.digest(bytes).map("%02x".format(_)).mkString
      assert(rows(0).getString(1) == expected)
    }
  }

  test("input_base_url resolves relative manifest entries (sparkcc.py:260-277)") {
    assert(WarcSource.resolveUri("crawl-data/x.warc.gz",
      Some("https://h.test/")) == "https://h.test/crawl-data/x.warc.gz")
    assert(WarcSource.resolveUri("s3a://bucket/x.warc.gz",
      Some("https://h.test/")) == "s3a://bucket/x.warc.gz") // scheme wins
    assert(WarcSource.resolveUri("crawl-data/x.warc.gz", None) == "crawl-data/x.warc.gz")
    withServer(ranges = true) { url =>
      // manifest carries only the relative key; the base URL selects http
      val base = url.stripSuffix("f.warc.gz")
      val manifest = java.nio.file.Files.createTempFile("m_rel", ".txt")
      java.nio.file.Files.writeString(manifest, "f.warc.gz\n")
      val recs = WarcSource.fromManifest(spark, manifest.toString, 1,
        baseUrl = Some(base)).collect()
      assert(recs.length == Fixtures.all.length)
      assert(recs.forall(_._1 == url))
    }
  }

  test("fetchRecords end-to-end over http coordinates") {
    withServer(ranges = true) { url =>
      import spark.implicits._
      val coords = offsets.zip(Fixtures.all).map { case ((off, len), r) =>
        WarcSource.RecordCoord(r.targetUri.getOrElse(""), url, off, len)
      }
      val got = WarcSource.fetchRecords(spark, spark.createDataset(coords)).collect()
      assert(got.length == Fixtures.all.length)
      assert(got.map(_._2.recType).sorted.toSeq ==
        Fixtures.all.map(_.recType).sorted.toSeq)
    }
  }
}
