package graft.tools

import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Sub-stage profiler for ONE MinHash index probe (dev tool): splits
  * the per-micro-batch probe constant the streaming drain pays —
  * signature build + checkpoint, the batch-stats driver job, and the
  * candidate join itself — so the drain trim targets the measured
  * stage, not a guess.
  */
object ProbeProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "probe-prof")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")
    docs.count() // warm
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val idx = java.nio.file.Files.createTempDirectory("pprof").toString
    graft.dedup.Dedup.saveMinHashIndex(
      docs.filter(pmod(col("doc_id"), lit(4L)) =!= 3L), idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(4L)) === 3L)
    // warm the whole path once
    graft.dedup.Dedup.dedupAgainstMinHashIndex(batch, idx).count()
    (1 to 3).foreach { i =>
      val hits = time(s"probe_$i total")(
        graft.dedup.Dedup.dedupAgainstMinHashIndex(batch, idx))
      time(s"probe_$i collect")(hits.count())
    }
    // decomposition: signatures alone (the probe's dominant CPU claim)
    (1 to 2).foreach { i =>
      val b = time(s"banded_$i build+checkpoint")(
        graft.dedup.Dedup.bandedSignaturesDev(batch).localCheckpoint())
      time(s"banded_$i stats job")(
        b.agg(collect_set(col("band").cast("long") * 16 + col("bmod")),
          countDistinct(col("band"), col("bucket"))).collect())
      time(s"banded_$i keys distinct collect")(
        b.select(col("band"), col("bucket")).distinct().count())
    }
    graft.util.FileTrees.rmTree(idx)
    spark.stop()
  }
}
