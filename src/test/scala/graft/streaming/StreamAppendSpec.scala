package graft.streaming

import graft.jobs.{JobCli, JobRunner}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 24/7 durable-streaming contract (`--stream_mode append`): finalized
  * windows append to the parquet file sink exactly once, a restart emits
  * only newly finalized windows without rewriting old files, and the
  * watermark evicts finalized windows from the state store so state stays
  * bounded on an infinite stream.
  */
class StreamAppendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 100 events one minute apart starting at `startMin` minutes. */
  private def addEvents(input: String, startMin: Int): Unit =
    spark.range(100).selectExpr(s"id + $startMin AS event_id",
      s"(id + $startMin) * 60000000000 AS ts", "id % 5 AS user_id",
      "'click' AS event_type", "1.0 AS value", "'{}' AS props")
      .coalesce(1).write.mode("append").parquet(input)

  private def dataFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
  }

  test("append mode: restart appends only newly finalized windows, exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("streamappend").toString
    val input = s"$dir/events"

    // tranche 1: minutes 0..99 → watermark 89min → windows ending ≤ 89min
    // finalize ([0,5) .. [80,85) fully, 17 complete 5-min windows)
    addEvents(input, 0)
    JobRunner.run(spark, JobCli("stream_windows", input, s"$dir/out",
      outParts = 1, streamMode = "append"))
    val r1 = spark.read.parquet(s"$dir/out/data").collect()
    assert(r1.nonEmpty, "first drain should finalize most windows")
    assert(r1.map(_.getAs[java.sql.Timestamp]("win_start")).distinct.length == r1.length,
      "one row per (window, type)")
    val f1 = dataFiles(s"$dir/out/data")

    // tranche 2: minutes 100..199 → restart resumes from the checkpoint,
    // finalizes the held-back tail of tranche 1 plus tranche 2's windows
    addEvents(input, 100)
    JobRunner.run(spark, JobCli("stream_windows", input, s"$dir/out",
      outParts = 1, streamMode = "append"))
    val r2 = spark.read.parquet(s"$dir/out/data").collect()
    val f2 = dataFiles(s"$dir/out/data")

    assert(f1.subsetOf(f2), "append must not rewrite previously committed files")
    assert(r2.length > r1.length, "restart should emit newly finalized windows")
    // exactly-once: no (win_start, event_type) appears twice across restarts
    val keys = r2.map(r => (r.getAs[java.sql.Timestamp]("win_start"), r.getString(1)))
    assert(keys.distinct.length == keys.length, "duplicate finalized windows")
    // finalized counts are complete: every emitted 5-min window saw all 5
    // of its one-minute-spaced events
    r2.foreach(r => assert(r.getLong(2) == 5, s"incomplete window: $r"))

    // restart with no new input: no new batch, nothing re-emitted
    JobRunner.run(spark, JobCli("stream_windows", input, s"$dir/out",
      outParts = 1, streamMode = "append"))
    assert(spark.read.parquet(s"$dir/out/data").count() == r2.length)
  }

  test("append mode evicts finalized windows: state is bounded by the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("streamstate").toString
    val input = s"$dir/events"
    addEvents(input, 0) // 20 distinct 5-min windows, 17 finalized at drain
    val agg = EventStream.windowedCounts(EventStream.readEvents(spark, input))
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$dir/out/data")
      .option("checkpointLocation", s"$dir/out/_checkpoint")
      .start()
    q.processAllAvailable()
    val state = q.lastProgress.stateOperators.apply(0)
    q.stop()
    // only the non-finalized tail (windows inside the 10-min watermark)
    // may remain in the store; 20 windows existed in the batch
    assert(state.numRowsTotal < 20,
      s"state not evicted: ${state.numRowsTotal} rows retained")
    assert(state.numRowsTotal > 0)
  }
}
