package graft.jobs

import graft.ops.Extractors
import graft.sources.CoordinateSource
import graft.warc.{WarcRecord, WarcSource}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The E3 entry point (reference CCIndexWarcSparkJob, sparkcc.py:537-661):
  * user SQL over the columnar URL index selects record coordinates, a
  * ranged fetch pulls exactly those records, a process hook extracts, and
  * the tail aggregates — the index→payload join that lets a query touch
  * 0.01% of a 100 TB crawl while reading only those bytes.
  *
  * Scale shape: the only full scan is the *index* (parquet, partition-
  * pruned + filter-pushed by Catalyst); payload I/O is proportional to
  * the result of the SQL, and the fetch tasks are grouped/sorted by
  * archive so each file is opened once with forward-only seeks.
  */
object CCIndexWarcJob {

  /** coordinates from user SQL over the index (must select the
    * coordinate columns; extra columns like content_charset forwarded).
    */
  def fetch(spark: SparkSession, indexPath: String, sql: String,
            numPartitions: Int = 8,
            failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[(String, WarcRecord)] = {
    val coordsDf = CoordinateSource.fromIndexQuery(spark, indexPath, sql)
    val charsetCol = coordsDf.columns.find(_ == "content_charset")
    val coords = CoordinateSource.toCoords(coordsDf, numPartitions, charsetCol)
    WarcSource.fetchRecords(spark, coords, failedAcc)
  }

  /** cc_index_word_count.py: fetched HTML → text → word (tf, df). */
  def wordCount(spark: SparkSession, indexPath: String, sql: String,
                numPartitions: Int = 8,
                failedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    import spark.implicits._
    fetch(spark, indexPath, sql, numPartitions, failedAcc)
      .flatMap { case (_, rec) =>
        Extractors.htmlToText(rec) match {
          case Some(text) => Extractors.tokenizeCounts(text)
          case None => Iterator.empty
        }
      }
      .map { case (w, (tf, df)) => (w, tf, df) }
      .toDF("word", "tf", "df")
      .groupBy("word")
      .agg(struct(sum("tf").as("tf"), sum("df").as("df")).as("val"))
  }

  /** Build a ccindex-style parquet over local archives (the tooling the
    * reference assumes exists upstream; makes E3 self-contained). Source
    * archives are re-written into `indexedDir` one gzip member per
    * record — the index's (offset, length) coordinates are captured from
    * that write, so they are exact by construction.
    */
  def buildIndex(spark: SparkSession, warcPaths: Seq[String],
                 indexedDir: String, outPath: String,
                 crawl: String = "CRAWL-LOCAL", subset: String = "warc"): Unit = {
    import spark.implicits._
    new java.io.File(indexedDir).mkdirs()
    val rows = warcPaths.flatMap { p =>
      val recs = graft.warc.WarcReader.open(p).toVector
      val dst = s"${indexedDir.stripSuffix("/")}/${new java.io.File(p).getName}"
      val offsets = graft.warc.WarcWriter.writeFile(dst, recs)
      recs.zip(offsets).map { case (r, (off, len)) =>
        (r.targetUri.getOrElse(""), dst, off, len, r.recType, crawl, subset)
      }
    }
    rows.toDF("url", "warc_filename", "warc_record_offset",
        "warc_record_length", "warc_type", "crawl", "subset")
      .write.mode("overwrite").parquet(outPath)
  }
}
