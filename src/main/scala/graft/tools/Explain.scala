package graft.tools

import graft.SparkEntry
import graft.util.Sessions

/** Print formatted physical plans for selected queries (dev tool):
  * runMain graft.tools.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "explain")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q5_region_revenue", "p6_word_count")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
