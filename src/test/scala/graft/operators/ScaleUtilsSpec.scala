package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleUtilsSpec extends AnyFunSuite {

  // Suites share one JVM: getOrCreate may return a session created by an
  // earlier suite, ignoring builder configs — set runtime confs in-test.
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s
  }

  test("salted sum equals direct sum (skewed key)") {
    import spark.implicits._
    // 90% of rows share one hot key
    val df = spark.range(100000)
      .select(when(col("id") % 10 =!= 0, lit("HOT")).otherwise(col("id").cast("string")).as("k"),
        lit(1L).as("v"))
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScaleUtils.saltedSum(df, Seq("k"), "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(salted("HOT") == 90000L)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val facts = (1L to 10000L).map(i => (i % 100, s"f$i")).toDF("key", "payload")
    val dims = (0L until 100L).map(i => (i, s"d$i")).toDF("key", "name")
    // clear any stale table locations from interrupted runs
    Seq("facts_b", "dims_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    ScaleUtils.writeBucketed(facts, "facts_b", "key", 8)
    ScaleUtils.writeBucketed(dims, "dims_b", "key", 8)
    val joined = spark.table("facts_b").join(spark.table("dims_b"), "key")
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() == 10000)

    // contrast: the same join over unbucketed parquet shuffles
    val dir = java.nio.file.Files.createTempDirectory("unb").toString
    facts.write.mode("overwrite").parquet(s"$dir/f")
    dims.write.mode("overwrite").parquet(s"$dir/d")
    val unbucketed = spark.read.parquet(s"$dir/f")
      .join(spark.read.parquet(s"$dir/d"), "key")
    assert(unbucketed.queryExecution.executedPlan.toString().contains("Exchange"))
  }
}
