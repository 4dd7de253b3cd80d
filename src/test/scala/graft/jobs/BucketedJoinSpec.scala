package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `--output_bucket_by` writes Hive-style bucketed+sorted tables: two
  * tables bucketed the same way join on the bucket key with no exchange
  * and no sort — pay one shuffle at write time, skip it on every
  * downstream join (the co-location lever for repeated 100 TB joins).
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("bucketwh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("co-bucketed tables join without exchange or sort") {
    import spark.implicits._
    // Overwrite only drops *registered* tables; a warehouse dir left by a
    // previous JVM (whose in-memory catalog died with it) fails the CREATE
    // with LOCATION_ALREADY_EXISTS — remove stale locations explicitly.
    // In the full suite getOrCreate returns the first suite's shared
    // session, so resolve the warehouse from the live conf, not ours.
    Seq("bucketed_a", "bucketed_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
    JobConfig.write(a, JobConfig("in", "bucketed_a", bucketBy = Some((4, "k"))))
    JobConfig.write(b, JobConfig("in", "bucketed_b", bucketBy = Some((4, "k"))))

    // force the shuffle-sensitive join path: no broadcast (at real scale
    // neither side fits the threshold anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"),
      s"co-bucketed join must not shuffle:\n$plan")
    // both scans read bucket-pruned, co-located files
    assert(plan.contains("Bucketed: true"))
    // note: the per-task SMJ sort remains — Spark 3+ does not propagate
    // bucket-file sort order without the legacy outputOrdering flag; the
    // shuffle (the cluster-wide cost) is what bucketing eliminates
    assert(joined.count() == 1000)
  }

  test("bucketed output rejects path destinations (catalog-only metadata)") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("bp").toString
    intercept[IllegalArgumentException] {
      JobConfig.write(df, JobConfig("in", s"$dir/out", bucketBy = Some((4, "k"))))
    }
  }

  test("CLI parses --output_bucket_by") {
    val cli = JobCli.parse(Array("index_export", "in", "tbl",
      "--output_bucket_by", "host=64"))
    assert(cli.outputBucketBy.contains((64, "host")))
  }
}
