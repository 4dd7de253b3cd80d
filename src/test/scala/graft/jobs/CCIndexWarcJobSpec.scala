package graft.jobs

import graft.warc.{Fixtures, WarcWriter}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** E3 end-to-end: build index → SQL select coordinates → ranged fetch →
  * extract → aggregate (reference cc_index_word_count.py flow).
  */
class CCIndexWarcJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("index word count: SQL filter limits which records are fetched") {
    val dir = java.nio.file.Files.createTempDirectory("e3").toString
    val src = s"$dir/src.warc.gz"
    WarcWriter.writeFile(src, Fixtures.all)
    CCIndexWarcJob.buildIndex(spark, Seq(src), s"$dir/indexed", s"$dir/ccindex")

    // index has one row per record with the expected columns
    val idx = spark.read.parquet(s"$dir/ccindex")
    assert(idx.count() == Fixtures.all.length)
    assert(idx.columns.contains("warc_record_offset"))

    // fetch only response records of example.com via SQL
    val sql = """SELECT url, warc_filename, warc_record_offset, warc_record_length
      FROM ccindex WHERE warc_type = 'response' AND url LIKE '%example.com%'"""
    val fetched = CCIndexWarcJob.fetch(spark, s"$dir/ccindex", sql, 2).collect()
    assert(fetched.nonEmpty)
    assert(fetched.forall(_._2.recType == "response"))
    assert(fetched.forall(_._1.contains("example.com")))

    // full word-count tail over the fetched HTML
    val wc = CCIndexWarcJob.wordCount(spark, s"$dir/ccindex", sql, 2)
    val words = wc.collect().map(r => r.getString(0) ->
      (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toMap
    assert(words.contains("hello")) // from responseHtml body text
    assert(words("world") == ((1L, 1L)))
  }

  test("distributed build: multi-archive manifest over 2 partitions, no driver I/O") {
    val dir = java.nio.file.Files.createTempDirectory("e3d").toString
    // two source dirs with a colliding basename, plus a distinct one
    new java.io.File(s"$dir/a").mkdirs(); new java.io.File(s"$dir/b").mkdirs()
    WarcWriter.writeFile(s"$dir/a/src.warc.gz", Seq(Fixtures.responseHtml, Fixtures.robotsTxt))
    WarcWriter.writeFile(s"$dir/b/src.warc.gz", Seq(Fixtures.responseNoServer))
    WarcWriter.writeFile(s"$dir/b/other.warc.gz", Seq(Fixtures.responseRedirect))
    val manifest = s"$dir/manifest.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(manifest),
      s"# comment\n$dir/a/src.warc.gz\n$dir/b/src.warc.gz\n$dir/b/other.warc.gz\n"
        .getBytes("UTF-8"))
    CCIndexWarcJob.buildIndexFromManifest(spark, manifest,
      s"$dir/indexed", s"$dir/ccindex", numPartitions = 2)

    val idx = spark.read.parquet(s"$dir/ccindex")
    assert(idx.count() == 4) // 2 + 1 + 1 records across the three archives
    // colliding basenames were disambiguated, not overwritten
    val files = idx.select("warc_filename").distinct().collect().map(_.getString(0)).toSet
    assert(files.size == 3)
    assert(files.exists(_.endsWith("dup1-src.warc.gz")))
    // coordinates are exact: a ranged fetch round-trips every record
    val fetched = CCIndexWarcJob.fetch(spark, s"$dir/ccindex",
      """SELECT url, warc_filename, warc_record_offset, warc_record_length
        FROM ccindex""", 2).collect()
    assert(fetched.length == 4)
    assert(fetched.map(_._2.recType).count(_ == "response") == 4)
  }

  test("crawl/subset partition-style predicates prune the index scan") {
    val dir = java.nio.file.Files.createTempDirectory("e3b").toString
    val src = s"$dir/src.warc.gz"
    WarcWriter.writeFile(src, Seq(Fixtures.responseHtml))
    CCIndexWarcJob.buildIndex(spark, Seq(src), s"$dir/indexed", s"$dir/ccindex",
      crawl = "CRAWL-A")
    val none = CCIndexWarcJob.fetch(spark, s"$dir/ccindex",
      """SELECT url, warc_filename, warc_record_offset, warc_record_length
        FROM ccindex WHERE crawl = 'CRAWL-B'""").count()
    assert(none == 0)
  }
}
