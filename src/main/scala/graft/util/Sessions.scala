package graft.util

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-minded defaults every graft entry point
  * shares (UTC, AQE on, shuffle partitions sized to the local core count
  * rather than the 200 default that over-shards small local runs).
  */
object Sessions {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // iterative jobs (PageRank, connected components) checkpoint every
      // round; without this the files accumulate for the session's life
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
