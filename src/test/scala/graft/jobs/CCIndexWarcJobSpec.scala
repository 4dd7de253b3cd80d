package graft.jobs

import graft.warc.{Fixtures, WarcWriter}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** E3 end-to-end: build index → SQL select coordinates → ranged fetch →
  * extract → aggregate (reference cc_index_word_count.py flow).
  */
class CCIndexWarcJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
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
