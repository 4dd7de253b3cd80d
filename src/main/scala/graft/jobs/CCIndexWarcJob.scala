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

  /** Ranged fetch from any coordinate table (must carry the coordinate
    * columns; extra columns like content_charset forwarded) — the
    * `--input_table_format` path of the reference (sparkcc.py:591-607).
    */
  def fetchCoords(coordsDf: DataFrame, numPartitions: Int = 8,
                  failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[(String, WarcRecord)] = {
    val charsetCol = coordsDf.columns.find(_ == "content_charset")
    val coords = CoordinateSource.toCoords(coordsDf, numPartitions, charsetCol)
    WarcSource.fetchRecords(coordsDf.sparkSession, coords, failedAcc)
  }

  /** coordinates from user SQL over the index (must select the
    * coordinate columns; extra columns like content_charset forwarded).
    */
  def fetch(spark: SparkSession, indexPath: String, sql: String,
            numPartitions: Int = 8,
            failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[(String, WarcRecord)] =
    fetchCoords(CoordinateSource.fromIndexQuery(spark, indexPath, sql),
      numPartitions, failedAcc)

  /** cc_index_word_count.py tail: fetched HTML → text → word (tf, df). */
  def wordCountRecords(records: org.apache.spark.sql.Dataset[(String, WarcRecord)]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records
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

  /** cc_index_word_count.py: SQL over the index → fetch → word count. */
  def wordCount(spark: SparkSession, indexPath: String, sql: String,
                numPartitions: Int = 8,
                failedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    wordCountRecords(fetch(spark, indexPath, sql, numPartitions, failedAcc))

  /** Build a ccindex-style parquet over archives (the tooling the
    * reference assumes exists upstream; makes E3 self-contained). Source
    * archives are re-written into `indexedDir` one gzip member per
    * record — the index's (offset, length) coordinates are captured from
    * that write, so they are exact by construction.
    *
    * Distributed: the driver only enumerates paths; each task streams its
    * own archive (read record → re-write → emit coordinate row) through
    * the Hadoop FS API, so driver memory and I/O are O(#archives), not
    * O(corpus) — at 100 TB every payload byte stays on executors.
    */
  def buildIndex(spark: SparkSession, warcPaths: Seq[String],
                 indexedDir: String, outPath: String,
                 crawl: String = "CRAWL-LOCAL", subset: String = "warc",
                 numPartitions: Int = 0): Unit = {
    import spark.implicits._
    val dirNorm = indexedDir.stripSuffix("/")
    val dirPath = new org.apache.hadoop.fs.Path(dirNorm)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    // destination names resolved on the driver so basename collisions
    // across source directories can't silently overwrite each other
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val srcDst = warcPaths.map { p =>
      val base = p.substring(p.lastIndexOf('/') + 1)
      val n = seen.getOrElse(base, 0); seen(base) = n + 1
      (p, s"$dirNorm/${if (n == 0) base else s"dup$n-$base"}")
    }
    val parts = if (numPartitions > 0) numPartitions
                else math.max(1, math.min(srcDst.size, 32))
    val shipped = graft.util.HadoopConfs.ship(spark)
    spark.sparkContext.parallelize(srcDst, parts)
      .flatMap { case (src, dst) =>
        shipped.installHere() // session hadoop conf for executor read+write
        val reader = graft.warc.WarcReader.open(src)
        val coords = Vector.newBuilder[(String, String, Long, Long, String, String, String)]
        try {
          graft.warc.WarcWriter.writeHadoop(dst, reader) { (r, off, len) =>
            coords += ((r.targetUri.getOrElse(""), dst, off, len, r.recType, crawl, subset))
          }
        } finally reader.close()
        coords.result()
      }
      .toDF("url", "warc_filename", "warc_record_offset",
        "warc_record_length", "warc_type", "crawl", "subset")
      .write.mode("overwrite").parquet(outPath)
  }

  /** index_build from a manifest file (one archive URI per line). The
    * manifest itself is read driver-side — it is O(#archives) lines of
    * text, the same shape the reference's `--input` manifest read
    * (sparkcc.py:212-214) — but no payload byte ever reaches the driver.
    */
  def buildIndexFromManifest(spark: SparkSession, manifestPath: String,
                             indexedDir: String, outPath: String,
                             numPartitions: Int = 0): Unit = {
    val p = new org.apache.hadoop.fs.Path(manifestPath)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
                finally in.close()
    val warcs = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    buildIndex(spark, warcs, indexedDir, outPath, numPartitions = numPartitions)
  }
}
