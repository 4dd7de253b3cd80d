package graft.tools

import graft.jobs.{JobCounters, ServerCountJob, WordCountJob}
import graft.util.Sessions
import graft.warc.{SampleWarc, WarcSource, WarcWriter}

/** WARC pipeline throughput benchmark (dev tool):
  *   runMain graft.tools.WarcThroughput [nFiles] [recordsPerFile]
  * Generates archives, then measures records/s through the full
  * manifest → parse → extract → aggregate pipeline.
  *
  * Reference context: cc-pyspark crosses the JVM↔Python boundary per
  * record; README.md:256 reports fastwarc buying ~25% job-level. Here
  * the whole pipeline is in-JVM.
  */
object WarcThroughput {
  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toInt).getOrElse(8)
    val perFile = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = Sessions.local("16", "warc-throughput")
    val dir = java.nio.file.Files.createTempDirectory("warc_tp").toString

    val records = SampleWarc.records(perFile / 4) // 4 servers × n + 3 extras
    (1 to nFiles).foreach { i =>
      WarcWriter.writeFile(s"$dir/part-$i.warc.gz", records)
    }
    val total = nFiles.toLong * records.length
    val manifest = s"$dir/manifest.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(manifest),
      (1 to nFiles).map(i => s"$dir/part-$i.warc.gz").mkString("\n"))
    val sizeMb = (1 to nFiles).map(i =>
      new java.io.File(s"$dir/part-$i.warc.gz").length()).sum / 1e6

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[warc-tp] $label: $sec%.2f s → ${total / sec}%.0f rec/s, ${sizeMb / sec}%.1f MB/s (n=$total, ${sizeMb}%.0f MB)")
    }

    // JVM/codegen warmup: the first Spark job otherwise pays several
    // seconds of class loading + JIT that would masquerade as pipeline
    // cost in whichever entry runs first
    spark.range(1000000).selectExpr("sum(id)").collect()
    WarcSource.fromManifest(spark, manifest, 16).limit(100).count()

    val counters = JobCounters(spark)
    time("server_count") {
      val recs = WarcSource.fromManifest(spark, manifest, 16, Some(counters.recordsFailed))
      ServerCountJob.aggregate(spark, recs, counters).count()
    }
    time("word_count  ") {
      val recs = WarcSource.fromManifest(spark, manifest, 16)
      WordCountJob.aggregate(spark, recs).count()
    }
    time("dsv2 scan   ") {
      spark.read.format("warc").load(dir)
        .filter(org.apache.spark.sql.functions.col("warc_type") === "response")
        .count()
    }
    spark.stop()
  }
}
