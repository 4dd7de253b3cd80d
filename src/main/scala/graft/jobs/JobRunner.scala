package graft.jobs

import graft.util.Sessions
import graft.warc.WarcSource

/** CLI entry point for the analytics jobs — the `python server_count.py
  * <manifest> <output>` analogue of the reference (sparkcc.py:64-120).
  *
  * Usage: JobRunner <job> <input> <outputDir> [numInputPartitions] [numOutputPartitions]
  *   job ∈ server_count | html_tag_count | server_ip | word_count |
  *         sitemaps | extract_host_links | host_graph | wet_extract |
  *         stream_windows | md5sum
  *   input = manifest file (one WARC path per line) — for host_graph, a
  *           parquet edge table with columns (s, t); for stream_windows,
  *           a directory of events parquet.
  */
object JobRunner {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: JobRunner <job> <input> <outputDir> [inParts] [outParts]")
    val Array(job, input, output) = args.take(3)
    val inParts = args.lift(3).map(_.toInt).getOrElse(8)
    val outParts = args.lift(4).map(_.toInt).getOrElse(2)
    val spark = Sessions.local(appName = s"graft-$job")
    val config = JobConfig(input, output, inParts, outParts)
    val counters = JobCounters(spark)

    def records = WarcSource.fromManifest(spark, input, inParts, Some(counters.recordsFailed))

    val df = job match {
      case "server_count"   => ServerCountJob.aggregate(spark, records, counters)
      case "html_tag_count" => HtmlTagCountJob.aggregate(spark, records, counters)
      case "server_ip"      => ServerIpJob.aggregate(spark, records, counters)
      case "word_count"     => WordCountJob.aggregate(spark, records)
      case "sitemaps"       => SitemapsJob.aggregate(spark, records)
      case "extract_host_links" => ExtractHostLinksJob.edges(spark, records)
      case "host_graph" =>
        val edges = spark.read.parquet(input)
        val g = HostGraphBuilder.build(spark, edges, vertexPartitions = outParts)
        g.vertices.coalesce(outParts).write.mode("overwrite")
          .parquet(s"$output/vertices")
        g.edges.coalesce(outParts).write.mode("overwrite")
          .parquet(s"$output/edges")
        spark.read.parquet(s"$output/edges")
      case "md5sum" =>
        FileProcessorJob.md5sum(spark, input, inParts,
          failedAcc = Some(counters.recordsFailed))
      case "warc_to_parquet" =>
        // archives → columnar table via the DSv2 source (input = path/dir)
        spark.read.format("warc").load(input)
          .write.mode("overwrite").option("compression", "zstd").parquet(output)
        spark.read.parquet(output)
      case "index_build" =>
        CCIndexWarcJob.buildIndexFromManifest(spark, input,
          s"$output/indexed", s"$output/ccindex", inParts)
        spark.read.parquet(s"$output/ccindex")
      case "index_word_count" =>
        // input = ccindex parquet path; fetches HTML responses only
        CCIndexWarcJob.wordCount(spark, input,
          """SELECT url, warc_filename, warc_record_offset, warc_record_length
            FROM ccindex WHERE warc_type = 'response'""", inParts,
          failedAcc = Some(counters.recordsFailed))
      case "wet_extract" =>
        val coords = graft.jobs.WetExtractor.run(spark, input, s"$output/wet", inParts)
        coords.coalesce(outParts).write.mode("overwrite").parquet(s"$output/coords")
        spark.read.parquet(s"$output/coords")
      case "stream_windows" =>
        val stream = graft.streaming.EventStream.readEvents(spark, input)
        val q = graft.streaming.EventStream.windowedCounts(stream)
          .writeStream.format("memory").queryName("win").outputMode("complete").start()
        q.processAllAvailable(); q.stop()
        val res = spark.sql("SELECT * FROM win")
        res.coalesce(outParts).write.mode("overwrite").parquet(output)
        spark.read.parquet(output)
      case other => sys.error(s"unknown job: $other")
    }
    val selfWriting = Set("host_graph", "wet_extract", "stream_windows",
      "index_build", "warc_to_parquet")
    if (!selfWriting.contains(job))
      df.coalesce(outParts).write.mode("overwrite").parquet(output)
    val countPath = job match {
      case "host_graph"  => s"$output/edges"
      case "wet_extract" => s"$output/coords"
      case "index_build" => s"$output/ccindex"
      case _             => output
    }
    println(s"[graft] job=$job rows=${spark.read.parquet(countPath).count()} " +
      s"processed=${counters.recordsProcessed.value} failed=${counters.recordsFailed.value}")
    spark.stop()
  }
}
