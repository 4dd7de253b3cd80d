package graft.tools

import graft.dedup.Dedup
import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup stages (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("16", "profile")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, dir, "documents")
    val sh = Dedup.charShingles(docs, 5).cache()
    time("shingle+cache")(sh.count())
    val sig = Dedup.minHashSignature(sh, 64).cache()
    time("signatures")(sig.count())
    val banded = Dedup.bands(sig, 64, 8).cache()
    time("bands")(banded.count())
    val cand = Dedup.candidatePairs(banded).cache()
    val nc = time("candidates")(cand.count())
    println(s"[profile] n_candidates=$nc")
    val ver = time("verify")(Dedup.verifyJaccard(cand, sh, 0.7).count())
    println(s"[profile] n_verified=$ver")
    spark.stop()
  }
}
