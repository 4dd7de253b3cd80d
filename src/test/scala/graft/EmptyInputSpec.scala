package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Empty-shard robustness: at 100 TB some source, partition, or new
  * crawl batch is always empty — every batch query must return an
  * empty (or all-zero) result, never throw. Caught real bugs when
  * introduced: null Bloom buffers, schema inference over part-less
  * partitioned index dirs, and MLlib training on zero rows.
  */
class EmptyInputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8, 2]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every batch query runs on zero-row tables without throwing") {
    assume(new java.io.File("/root/testdata/sf0.001").exists())
    val fs = tools.EmptyCheck.failures(spark, "/root/testdata/sf0.001")
    assert(fs.isEmpty, fs.map { case (n, e) =>
      s"$n: ${e.getClass.getSimpleName}: ${e.getMessage}" }.mkString("\n"))
  }
}
