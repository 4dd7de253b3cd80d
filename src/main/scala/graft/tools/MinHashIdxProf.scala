package graft.tools

import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Stage-split profiler for the persisted MinHash index maintenance
  * path (dev tool): seed build, per-crawl probe, per-crawl append, and
  * compaction timed separately over the sf corpus — the numbers behind
  * the MinHashBucketMods sizing note and SCALE.md's maintenance rows.
  */
object MinHashIdxProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "mh-prof")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")
    docs.count() // warm
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[mhprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val idx = java.nio.file.Files.createTempDirectory("mhprof").toString
    time("seed_save_crawl0")(graft.dedup.Dedup.saveMinHashIndex(
      docs.filter(pmod(col("doc_id"), lit(4L)) === 0L), idx))
    (1 to 3).foreach { k =>
      val batch = docs.filter(pmod(col("doc_id"), lit(4L)) === k.toLong)
      time(s"probe_crawl$k")(
        println(s"[mhprof]   hits=${graft.dedup.Dedup.dedupAgainstMinHashIndex(batch, idx).count()}"))
      time(s"append_crawl$k")(graft.dedup.Dedup.appendMinHashIndex(
        batch, idx, batchId = Some(s"crawl-$k")))
    }
    time("reprobe_crawl3_fullindex")(
      println(s"[mhprof]   hits=${graft.dedup.Dedup.dedupAgainstMinHashIndex(docs.filter(pmod(col("doc_id"), lit(4L)) === 3L), idx).count()}"))
    time("compact")(graft.dedup.Dedup.compactMinHashIndex(spark, idx))
    time("reprobe_after_compact")(
      println(s"[mhprof]   hits=${graft.dedup.Dedup.dedupAgainstMinHashIndex(docs.filter(pmod(col("doc_id"), lit(4L)) === 3L), idx).count()}"))
    val copy = java.nio.file.Files.createTempDirectory("mhprof_c").toString
    time("copytree_index")(graft.util.FileTrees.copyTree(idx, copy))
    Seq(idx, copy).foreach(graft.util.FileTrees.rmTree)
    spark.stop()
  }
}
