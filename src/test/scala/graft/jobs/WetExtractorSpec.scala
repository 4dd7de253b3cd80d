package graft.jobs

import graft.warc.{Fixtures, Predicates, WarcReader, WarcWriter}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class WetExtractorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("WET extraction: conversion records + valid coordinates") {
    val warcDir = java.nio.file.Files.createTempDirectory("wet_in").toString
    val warcPath = s"$warcDir/test.warc.gz"
    WarcWriter.writeFile(warcPath, Fixtures.all)
    val manifest = s"$warcDir/manifest.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(manifest), warcPath + "\n")
    val outDir = java.nio.file.Files.createTempDirectory("wet_out").toString

    val coords = WetExtractor.run(spark, manifest, outDir, 1).collect()
    // both HTML responses convert (redirect has no body, robots is text/plain)
    assert(coords.length == 2)
    val c = coords.find(_.getString(0) == "https://www.example.com/index.html").get
    assert(c.getString(0) == "https://www.example.com/index.html")
    assert(c.getString(2) == "test.warc.wet.gz")

    // the WET file itself is a valid WARC: warcinfo + conversion records
    val rd = WarcReader.open(s"$outDir/test.warc.wet.gz")
    val recs = rd.toVector
    assert(recs.head.recType == "warcinfo")
    val conv = recs.tail
    assert(conv.forall(Predicates.isWetText))
    val text = new String(conv.head.payload, "UTF-8")
    assert(text.contains("Hello é"))
    assert(!text.contains("<"))

    // ranged re-read via the coordinate: offsets point at a gzip member
    val raf = new java.io.RandomAccessFile(s"$outDir/test.warc.wet.gz", "r")
    raf.seek(c.getLong(3))
    val buf = new Array[Byte](c.getLong(4).toInt)
    raf.readFully(buf)
    val one = new WarcReader(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(buf)))
    assert(one.hasNext && one.next().targetUri.contains(c.getString(0)))
  }

  test("metadata record feeds charset + languages into the conversion record") {
    val uri = "http://latin1.example.org/page"
    val date = "2017-03-22T01:02:03Z"
    val resp = Fixtures.response(uri,
      "<html><body>café au lait</body></html>".getBytes("ISO-8859-1"),
      httpHeaders = Seq("Content-Type" -> "text/html"),
      warcHeaders = Map("WARC-Record-ID" -> "<urn:uuid:11111111-2222-3333-4444-555555555555>",
        "WARC-Date" -> date))
    val metaBody = ("charset-detected: ISO-8859-1\r\n" +
      """languages-cld2: {"reliable":true,"languages":[{"code":"fr","code-iso-639-3":"fra","text-covered":95},{"code":"en","code-iso-639-3":"eng","text-covered":5}]}""" +
      "\r\n").getBytes("UTF-8")
    val meta = graft.warc.WarcRecord(Map(
      "WARC-Type" -> "metadata",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> date,
      "Content-Type" -> "application/warc-fields",
      "Content-Length" -> metaBody.length.toString), metaBody)
    val info = graft.warc.WarcRecord(Map(
      "WARC-Type" -> "warcinfo",
      "Content-Type" -> "application/warc-fields",
      "Content-Length" -> "0"),
      "robots: classic\r\nisPartOf: CC-MAIN-TEST\r\nformat: WARC\r\n".getBytes("UTF-8"))

    val dir = java.nio.file.Files.createTempDirectory("wet_meta").toString
    val warcPath = s"$dir/meta.warc.gz"
    WarcWriter.writeFile(warcPath, Seq(info, resp, meta))
    val outDir = java.nio.file.Files.createTempDirectory("wet_meta_out").toString
    val coords = WetExtractor.extractFile(warcPath, outDir).toVector
    assert(coords.length == 1)
    assert(coords.head.warc_date == date)

    val recs = WarcReader.open(s"$outDir/meta.warc.wet.gz").toVector
    val infoRec = recs.head
    assert(infoRec.recType == "warcinfo")
    val infoBody = new String(infoRec.payload, "UTF-8")
    // descriptive fields carried over from the source warcinfo
    assert(infoBody.contains("robots: classic"))
    assert(infoBody.contains("isPartOf: CC-MAIN-TEST"))
    assert(!infoBody.contains("format: WARC")) // not in the carry-over set

    val conv = recs(1)
    assert(conv.recType == "conversion")
    assert(conv.headers("WARC-Identified-Content-Language") == "fra,eng")
    assert(conv.headers("WARC-Refers-To") == "<urn:uuid:11111111-2222-3333-4444-555555555555>")
    assert(conv.recordId.exists(_.startsWith("<urn:uuid:")))
    assert(conv.headers("WARC-Block-Digest").startsWith("sha1:"))
    // charset-detected drove the decode: latin-1 é survived
    assert(new String(conv.payload, "UTF-8").contains("café"))
  }

  test("resume: existing WET output is skipped, not rewritten") {
    val dir = java.nio.file.Files.createTempDirectory("wet_resume").toString
    val warcPath = s"$dir/res.warc.gz"
    WarcWriter.writeFile(warcPath, Fixtures.all)
    val outDir = java.nio.file.Files.createTempDirectory("wet_resume_out").toString

    val first = WetExtractor.extractFile(warcPath, outDir).toVector
    assert(first.nonEmpty)
    val wet = java.nio.file.Paths.get(s"$outDir/res.warc.wet.gz")
    val bytesBefore = java.nio.file.Files.readAllBytes(wet)

    val acc = spark.sparkContext.longAccumulator("skipped")
    val second = WetExtractor.extractFile(warcPath, outDir, Some(acc)).toVector
    assert(acc.value == 1)
    assert(java.util.Arrays.equals(bytesBefore, java.nio.file.Files.readAllBytes(wet)),
      "skipped output must be untouched")
    // the skipped archive re-emits its coordinate rows from the sidecar,
    // so a resumed run's coordinate table stays complete
    assert(second == first, "skip must re-emit identical coords via sidecar")
    // no stray temp files left behind
    assert(!new java.io.File(outDir).list().exists(_.endsWith(".tmp")))

    // wet present but sidecar missing (crash between renames) → redo,
    // byte-identical thanks to source-derived dates + name-based ids
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$outDir/res.warc.wet.gz.coords.gz"))
    val third = WetExtractor.extractFile(warcPath, outDir).toVector
    assert(third == first)
    assert(java.util.Arrays.equals(bytesBefore, java.nio.file.Files.readAllBytes(wet)),
      "re-run must be byte-identical")
  }

  test("sha1 base32 digest matches the known empty-input vector") {
    assert(WetExtractor.sha1Base32(Array.emptyByteArray) ==
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
  }
}
