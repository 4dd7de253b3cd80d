package graft.tools

import graft.functions.{CosineSimilarity, GraftFunctions}
import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Micro-benchmark: native CosineSimilarity expression vs composable
  * zip_with/aggregate, full corpus self-cross at sf0.1 (dev tool).
  */
object CosBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("16", "cosbench")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val crossed = a.crossJoin(b) // 2000 x 2000 = 4M pairs at sf0.1
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"[cosbench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s over $n rows")
    }
    time("native ") {
      crossed.select(CosineSimilarity.cosineSim(col("e1"), col("e2")).as("c"))
        .filter(col("c") > 2).count() + crossed.count()
    }
    time("hof    ") {
      crossed.select(GraftFunctions.cosine(col("e1"), col("e2")).as("c"))
        .filter(col("c") > 2).count() + crossed.count()
    }
    spark.stop()
  }
}
