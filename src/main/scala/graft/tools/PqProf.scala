package graft.tools

import graft.util.{Sessions, Tables}
import graft.vector.{PqOps, VectorOps}
import org.apache.spark.sql.functions._

/** Stage-level timing for ann_pq_topk (dev tool): separates codebook
  * training, the PQ ADC top-k, the brute-force truth, and the recall
  * join, so a bench-level regression can be attributed to a stage.
  */
object PqProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "pq-prof")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    Tables(spark, dir, "embeddings").count()
    for (i <- 1 to 3) {
      time(s"train-$i") { PqOps.trainCodebooks(Tables(spark, dir, "embeddings")) }
      time(s"pq_topk-$i") { PqOps.pqTopK(spark, dir).count() }
      time(s"brute-$i") { VectorOps.bruteTopK(spark, dir).count() }
      time(s"full_query-$i") {
        graft.SparkEntry.queries("ann_pq_topk")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
