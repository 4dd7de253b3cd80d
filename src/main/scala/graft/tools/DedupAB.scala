package graft.tools

import graft.dedup.Dedup
import graft.util.{Sessions, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B timing for minHashDedup designs (dev tool): old (persist full
  * shingle table) vs new (persist candidate pairs, semi-join verify).
  * Runs each variant twice, alternating, on a fresh plan each time.
  */
object DedupAB {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "dedup-ab")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def oldDesign(): DataFrame = {
      val sh = Dedup.charShingles(Tables(spark, dir, "documents"), 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sig = Dedup.minHashSignature(sh, 64)
      val cand = Dedup.candidatePairs(Dedup.bands(sig, 64, 8))
      Dedup.verifyJaccard(cand, sh, 0.7)
    }
    def newDesign(): DataFrame = {
      val sh = Dedup.charShingles(Tables(spark, dir, "documents"), 5)
      Dedup.minHashDedup(sh, 64, 8, 0.7)
    }
    def time(label: String)(f: => DataFrame): Unit = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = f.agg(count(lit(1)).as("n"), avg(col("jaccard"))).collect()(0)
      println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    def linearDesign(): DataFrame = {
      val sh = Dedup.charShingles(Tables(spark, dir, "documents"), 5)
      val sig = Dedup.minHashSignature(sh, 64)
      val cand = Dedup.candidatePairs(Dedup.bands(sig, 64, 8))
      Dedup.verifyJaccard(cand, sh, 0.7)
    }
    time("warmup-old")(oldDesign())
    time("old-1")(oldDesign()); time("new-1")(newDesign()); time("lin-1")(linearDesign())
    time("old-2")(oldDesign()); time("new-2")(newDesign()); time("lin-2")(linearDesign())
    spark.stop()
  }
}
