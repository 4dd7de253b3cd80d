package graft.jobs

import graft.warc.{WarcRecord, WarcSource}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Job harness — the CCSparkJob analogue (reference sparkcc.py:24-466).
  *
  * Pipeline shape (sparkcc.py:212-227): manifest → Dataset[WarcRecord] →
  * flatMap(extract) → groupBy(key).sum → coalesce → write. The reference's
  * JVM↔Python worker boundary is gone: extraction closures are Scala, and
  * the aggregation is a Catalyst hash aggregate (partial+final — the
  * map-side combine the reference got from reduceByKey, for free).
  */
final case class JobConfig(
    input: String,
    output: String,
    numInputPartitions: Int = 32,
    numOutputPartitions: Int = 4,
    outputFormat: String = "parquet",
    outputCompression: String = "gzip",
    outputOptions: Map[String, String] = Map.empty,
    bucketBy: Option[(Int, String)] = None)

object JobConfig {

  /** gzip is the parquet default codec name; ORC calls the equivalent
    * codec zlib — the reference silently rewrites the pair
    * (sparkcc.py:129-135).
    */
  def effectiveCompression(format: String, compression: String): String =
    if (format == "orc" && compression == "gzip") "zlib" else compression

  /** A path-ish output (scheme or slash) is written with save(); a bare
    * name becomes a managed table in spark.sql.warehouse.dir — the
    * reference's default workflow chains jobs by table name
    * (sparkcc.py:219-225 saveAsTable).
    */
  def isPathOutput(output: String): Boolean =
    output.contains("/") || output.contains(":")

  /** The writer every job output goes through: format + fixed-up
    * compression + format-specific options, routed to save(path) or
    * saveAsTable(name).
    */
  def write(df: org.apache.spark.sql.DataFrame, config: JobConfig): Unit = {
    // bucketed writes repartition on the bucket key (same Murmur3 hash the
    // bucket assignment uses) so each bucket lands as exactly ONE sorted
    // file — with multiple files per bucket Spark cannot trust the sort
    // order and re-sorts on read
    val shaped = config.bucketBy match {
      case Some((n, c)) => df.repartition(n, org.apache.spark.sql.functions.col(c))
      case None         => df.coalesce(config.numOutputPartitions)
    }
    val w = shaped
      .write.mode(SaveMode.Overwrite)
      .format(config.outputFormat)
      .option("compression",
        effectiveCompression(config.outputFormat, config.outputCompression))
      .options(config.outputOptions)
    if (isPathOutput(config.output)) {
      require(config.bucketBy.isEmpty,
        "--output_bucket_by requires a table-name output (bucket metadata " +
          "lives in the catalog; a bare path write cannot carry it)")
      w.save(config.output)
    } else config.bucketBy match {
      // Hive-style bucketing: rows hash-partitioned and sorted by the key
      // within each bucket file, recorded in the catalog — two tables
      // bucketed the same way join/aggregate on that key with NO shuffle
      // (BucketedJoinSpec asserts the exchange-free plan; the local
      // per-task SMJ sort remains — Spark 3+ doesn't propagate bucket
      // sort order without the legacy outputOrdering flag). This is the
      // cheapest co-location lever at 100 TB: pay one shuffle at write
      // time, skip it on every downstream join.
      case Some((n, col)) => w.bucketBy(n, col).sortBy(col).saveAsTable(config.output)
      case None           => w.saveAsTable(config.output)
    }
  }
}

/** Per-job counters — the reference's accumulator set (sparkcc.py:152-160
  * base + wat_extract_links.py:257-268 job-specific). All are registered
  * up front on the driver; extraction closures increment whichever apply.
  */
final case class JobCounters(
    recordsProcessed: LongAccumulator,
    recordsFailed: LongAccumulator,
    recordsNonHtml: LongAccumulator,
    recordsResponse: LongAccumulator,
    responseWat: LongAccumulator,
    responseRedirect: LongAccumulator,
    responseRobotsTxt: LongAccumulator,
    linkCount: LongAccumulator) {

  /** One line per counter, the log_accumulators analogue
    * (sparkcc.py:199-206, wat_extract_links.py:271-288).
    */
  def summary: String = Seq(
    "records processed" -> recordsProcessed,
    "records failed to process" -> recordsFailed,
    "records not HTML" -> recordsNonHtml,
    "response records" -> recordsResponse,
    "response records WAT" -> responseWat,
    "response records redirects" -> responseRedirect,
    "response records robots.txt" -> responseRobotsTxt,
    "non-unique link pairs" -> linkCount
  ).map { case (d, a) => s"$d = ${a.value}" }.mkString("; ")
}

object JobCounters {
  def apply(spark: SparkSession): JobCounters = {
    def acc(n: String) = spark.sparkContext.longAccumulator(n)
    JobCounters(acc("records_processed"), acc("records_failed"),
      acc("records_non_html"), acc("records_response"),
      acc("records_response_wat"), acc("records_response_redirect"),
      acc("records_response_robotstxt"), acc("link_count"))
  }
}

abstract class CCJob[K: org.apache.spark.sql.Encoder] extends Serializable {

  def name: String

  /** The per-record extraction hook (process_record analogue). */
  def extract(path: String, rec: WarcRecord, counters: JobCounters): Iterator[(K, Long)]

  /** records → extracted pairs → sum-by-key DataFrame <key, val>. */
  def run(spark: SparkSession, config: JobConfig): DataFrame = {
    val counters = JobCounters(spark)
    val records = WarcSource.fromManifest(spark, config.input,
      config.numInputPartitions, Some(counters.recordsFailed))
    val df = aggregate(spark, records, counters)
    write(df, config)
    df
  }

  def aggregate(spark: SparkSession,
                records: Dataset[(String, WarcRecord)],
                counters: JobCounters): DataFrame = {
    implicit val pairEnc: org.apache.spark.sql.Encoder[(K, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        implicitly[org.apache.spark.sql.Encoder[K]],
        org.apache.spark.sql.Encoders.scalaLong)
    records.flatMap { case (path, rec) =>
      counters.recordsProcessed.add(1)
      extract(path, rec, counters)
    }.toDF("key", "cnt")
      .groupBy("key")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("val"))
  }

  protected def write(df: DataFrame, config: JobConfig): Unit =
    JobConfig.write(df, config)
}
