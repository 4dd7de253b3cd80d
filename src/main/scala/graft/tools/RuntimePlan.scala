package graft.tools

import org.apache.spark.sql.SparkSession

/** Post-execution plan inspector (dev tool): runs a registered query and
  * reports the FINAL adaptive plan's reuse + scan counts — the static
  * explain shows the initial AQE plan, where runtime stage reuse
  * (ReusedQueryStage / ReusedExchange) is not yet visible.
  *
  * Usage: RuntimePlan <sfDir> <query name...>
  */
object RuntimePlan {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // execute THIS plan (df.count() would build and run a different
      // QueryExecution, leaving this one's AQE un-finalized)
      df.collect()
      val p = df.queryExecution.executedPlan.toString()
      def c(s: String) = p.linesIterator.count(_.contains(s))
      println(s"[plan] $name reusedStages=${c("ReusedQueryStage") + c("ReusedExchange")} " +
        s"scans=${c("Scan parquet")} exchanges=${c("Exchange")} " +
        s"aqeFinal=${c("AdaptiveSparkPlan isFinalPlan=true")}")
    }
    spark.stop()
  }
}
