package graft.warc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WARC DSv2 streaming source: a landing directory processed
  * file-at-a-time per micro-batch, exactly-once across batches AND
  * across restarts (engine checkpoint + the seen-files offset), with
  * the batch pushdown applying to the stream.
  */
class WarcStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro-batches cover exactly the new files; restart resumes without reprocess") {
    val dir = java.nio.file.Files.createTempDirectory("warc_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warc_stream_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("warc_stream_out").toString
    WarcWriter.writeFile(s"$dir/a.warc.gz", Fixtures.all)

    // durable (recoverable) sink: the parquet file sink's commit log is
    // what proves exactly-once across a restart — the memory sink
    // cannot recover a checkpoint at all
    def startQuery() = spark.readStream.format("warc").load(dir)
      .select(col("path"), col("warc_type"), col("target_uri"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    def perFile: Map[String, Long] = spark.read.parquet(out)
      .groupBy(col("path")).count().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap

    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      assert(perFile === Map("a.warc.gz" -> Fixtures.all.length.toLong))
      // a new archive lands: the next batch reads ONLY it (a URI can
      // repeat WITHIN a file — request/response pairs — so the unit of
      // the exactly-once check is the file)
      WarcWriter.writeFile(s"$dir/b.warc.gz", Seq(Fixtures.responseHtml))
      q1.processAllAvailable()
      assert(perFile === Map("a.warc.gz" -> Fixtures.all.length.toLong,
        "b.warc.gz" -> 1L))
    } finally q1.stop()

    // restart from the checkpoint: nothing reprocessed, new files picked up
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(perFile === Map("a.warc.gz" -> Fixtures.all.length.toLong,
        "b.warc.gz" -> 1L), "restart reprocessed already-committed archives")
      WarcWriter.writeFile(s"$dir/c.warc.gz", Seq(Fixtures.responseHtml))
      q2.processAllAvailable()
      assert(perFile === Map("a.warc.gz" -> Fixtures.all.length.toLong,
        "b.warc.gz" -> 1L, "c.warc.gz" -> 1L))
    } finally q2.stop()
  }

  test("warc_type pushdown and column pruning apply to the stream") {
    val dir = java.nio.file.Files.createTempDirectory("warc_stream_pd").toString
    WarcWriter.writeFile(s"$dir/a.warc.gz", Fixtures.all)
    val q = spark.readStream.format("warc").load(dir)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"))
      .writeStream.format("memory").queryName("warc_stream_pd")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.sql("SELECT COUNT(*) FROM warc_stream_pd").head.getLong(0)
    assert(n === Fixtures.all.count(_.headers.get("WARC-Type").contains("response")).toLong)
    assert(n > 0)
  }

  test("offset round-trips through JSON") {
    val o = WarcSourceOffset(Seq("/x/a.warc.gz", "/x/b \"quoted\".warc"))
    assert(WarcSourceOffset.fromJson(o.json()) === o)
    assert(WarcSourceOffset.fromJson(WarcSourceOffset(Nil).json()) === WarcSourceOffset(Nil))
  }
}
