package graft.jobs

import graft.warc.{Fixtures, Predicates, WarcReader, WarcWriter}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class WetExtractorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
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
}
