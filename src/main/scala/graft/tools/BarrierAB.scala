package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-faithful per-query timer (dev tool): replays the EXACT bench
  * cadence — run the query N times, THEN apply the bench barrier
  * (clearCache + unpersist-all + drop temp views) — so cache-refill
  * interactions that IterAB (no barrier) cannot reproduce show up here.
  *
  *   runMain graft.tools.BarrierAB <sfDir> <rounds> <query ...>
  */
object BarrierAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val rounds = args(1).toInt
    def barrier(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.listTables().collect().filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    for (r <- 1 to rounds; name <- args.drop(2)) {
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        try graft.SparkEntry.queries(name)(spark, dir).count()
        catch { case e: Throwable => println(s"[bab] $name THREW: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      barrier()
      println(f"[bab] round$r $name: ${times.map(t => f"$t%.2f").mkString(" ")} " +
        f"median=${times.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
