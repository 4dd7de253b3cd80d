package graft.tools

import graft.operators.ScaleUtils
import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Demo/check of the scale utilities against the test tables (dev tool):
  * salted vs direct aggregation equality, and bucketed-join plan shape.
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .appName("scale-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("wh").toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val li = Tables(spark, dir, "lineitem")
    val direct = li.groupBy("l_returnflag").agg(sum("l_orderkey").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScaleUtils.saltedSum(li, Seq("l_returnflag"), "l_orderkey", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[scale-demo] salted==direct: ${salted == direct} (${direct.size} keys)")

    ScaleUtils.writeBucketed(Tables(spark, dir, "orders"), "orders_b", "o_custkey", 8)
    ScaleUtils.writeBucketed(Tables(spark, dir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey"), "cust_b", "o_custkey", 8)
    // disable broadcast so the join must co-locate by key — bucketing
    // makes that shuffle-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = spark.table("orders_b").join(spark.table("cust_b"), "o_custkey")
    val shuffles = j.queryExecution.executedPlan.toString()
      .linesIterator.count(l => l.contains("Exchange hashpartitioning"))
    println(s"[scale-demo] bucketed join rows=${j.count()} shuffle_exchanges=$shuffles")
    spark.stop()
  }
}
