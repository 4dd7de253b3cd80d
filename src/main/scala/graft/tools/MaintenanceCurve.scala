package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import graft.util.{Sessions, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** The LONG maintenance curve for the persisted MinHash index (dev
  * tool; results feed SCALE.md): seed with shard 0 of `nShards`, then
  * probe+append every remaining shard as a successive "crawl",
  * interleaving size-tiered compactions every `compactEvery` batches —
  * the 24/7 cadence a years-deep cross-crawl index actually runs.
  *
  * Two curves come out, one per claim:
  *  - per-batch probe+append wall must stay ~FLAT as the index deepens
  *    (the probe is O(touched partitions + tail), not O(index));
  *  - per-compaction IO must follow the TAIL between level merges
  *    (minor folds O(tail); the occasional run re-merge O(L1); the
  *    base rewrite only at the size-ratio trip) — the r12 single-level
  *    design paid a full-index rewrite on EVERY cycle, which is the
  *    curve this tool exists to falsify or confirm.
  *
  * Each compaction line records the tier masses the size policy saw,
  * the action it picked, wall, shuffle bytes, and index part-file
  * counts. A held-out probe is checked byte-identical across every
  * compaction.
  *
  * Usage: MaintenanceCurve [sfDirOrDocsParquet] [nShards=12] [compactEvery=4]
  */
object MaintenanceCurve {

  final class Metrics extends SparkListener {
    val peakTaskMem = new AtomicLong(0L)
    val shuffleWrite = new LongAdder
    val inputBytes = new LongAdder
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val tm = e.taskMetrics
      if (tm != null) {
        peakTaskMem.updateAndGet(p => math.max(p, tm.peakExecutionMemory))
        shuffleWrite.add(tm.shuffleWriteMetrics.bytesWritten)
        inputBytes.add(tm.inputMetrics.bytesRead)
      }
    }
    def reset(): Unit = { peakTaskMem.set(0); shuffleWrite.reset(); inputBytes.reset() }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nShards = args.lift(1).map(_.toInt).getOrElse(12)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"), "mh-curve")
    spark.sparkContext.setLogLevel("WARN")
    val m = new Metrics
    spark.sparkContext.addSparkListener(m)

    // an sf dir (documents table) or any (doc_id, text) parquet dir
    val docs = (
      if (new java.io.File(s"$src/documents.parquet").exists()) Tables(spark, src, "documents")
      else spark.read.parquet(src).select(col("doc_id"), col("text"))
    ).persist()
    val nDocs = docs.count()
    println(s"[curve] corpus $src: $nDocs docs, $nShards shards, compact every $compactEvery")

    def shard(k: Int) = docs.filter(pmod(col("doc_id"), lit(nShards.toLong)) === k.toLong)

    val idx = java.nio.file.Files.createTempDirectory("mh_curve_idx").toString
    val hits = java.nio.file.Files.createTempDirectory("mh_curve_hits").toString
    // held-out probe slice (disjoint from every shard's id stream is not
    // needed — re-probing known docs is fine; what matters is the SAME
    // probe before/after each compaction)
    val heldOut = docs.filter(pmod(col("doc_id"), lit((nShards * 4).toLong)) === 1L)

    def idxFiles: Long = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.count(_.toString.endsWith(".parquet"))
      } finally st.close()
    }
    def timed[T](f: => T): (T, Double) = {
      m.reset()
      val t0 = System.nanoTime()
      val out = f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      (out, w)
    }

    val (_, seedW) = timed(graft.dedup.Dedup.saveMinHashIndex(shard(0), idx))
    println(f"""[curve] {"stage":"seed","wall_s":$seedW%.1f,"files":$idxFiles}""")

    var probeRef = graft.dedup.Dedup
      .dedupAgainstMinHashIndex(heldOut, idx).count()
    (1 until nShards).foreach { k =>
      val (_, w) = timed(graft.dedup.Dedup.probeAndAppendMinHashIndex(
        shard(k), idx, hits, batchId = Some(s"crawl-$k")))
      println(f"""[curve] {"stage":"probe_append","crawl":$k,"wall_s":$w%.1f,"shuffle_mb":${m.shuffleWrite.sum / 1e6}%.1f,"peak_task_mem_mb":${m.peakTaskMem.get / 1e6}%.1f}""")
      if (k % compactEvery == 0 || k == nShards - 1) {
        // a FIXED small batch probed at every depth: the 24/7 cadence's
        // unit of work. Its wall/shuffle across the curve shows what a
        // routine micro-batch pays as the index deepens.
        val small = docs.filter(pmod(col("doc_id"), lit((nShards * 128).toLong)) === 7L)
        val (smallHits, spw) = timed(
          graft.dedup.Dedup.dedupAgainstMinHashIndex(small, idx).count())
        println(f"""[curve] {"stage":"small_probe","after_crawl":$k,"wall_s":$spw%.1f,"shuffle_mb":${m.shuffleWrite.sum / 1e6}%.1f,"hits":$smallHits}""")
        val (action, sizes) = graft.dedup.Dedup.compactionTiers(spark, idx)
        val before = idxFiles
        val refBefore = graft.dedup.Dedup
          .dedupAgainstMinHashIndex(heldOut, idx).count()
        val (_, cw) = timed(graft.dedup.Dedup.compactMinHashIndex(spark, idx))
        // capture the compaction's OWN shuffle before the held-out
        // re-probe runs — the re-probe's bytes would otherwise inflate
        // the per-compaction IO this tool exists to measure
        val compactShuffleMb = m.shuffleWrite.sum / 1e6
        val refAfter = graft.dedup.Dedup
          .dedupAgainstMinHashIndex(heldOut, idx).count()
        require(refBefore == refAfter,
          s"compaction changed held-out probe: $refBefore vs $refAfter")
        probeRef = refAfter
        println(f"""[curve] {"stage":"compact","after_crawl":$k,"action":"$action","base_rows":${sizes.base},"l1_rows":${sizes.l1},"tail_rows":${sizes.tail},"runs":${sizes.runCount},"wall_s":$cw%.1f,"shuffle_mb":$compactShuffleMb%.1f,"files_before":$before,"files_after":$idxFiles,"probe_hits":$refAfter}""")
      }
    }
    println(s"[curve] drained hits: ${spark.read.parquet(hits).count()}, " +
      s"final held-out probe hits: $probeRef")
    Seq(idx, hits).foreach(graft.util.FileTrees.rmTree)
    spark.stop()
  }
}
