package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (bloom) filter injection audit — the dynamic-filtering lever
  * for 100 TB fact⋈dim joins: when the dim side carries a selective
  * predicate, Catalyst injects a bloom filter built from the dim join
  * keys into the FACT SCAN side, so fact rows that cannot join are
  * dropped at the scan instead of surviving to the shuffle. At cluster
  * scale this is often the difference between shuffling 100 TB and
  * shuffling the ~1% that joins. The thresholds here are lowered only
  * because the audit tables are tiny — production defaults (10 GB
  * application-side scan) gate it to the joins where it pays.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // injection is decided against the APPLICATION side's scan size
    // estimate; the sf0.001 lineitem is far below the 10 GB production
    // default, so the audit lowers the gate instead of inflating data
    .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // runtime filters only inject into SHUFFLE joins (a broadcast join
    // already ships the dim to the fact side; Spark reuses the broadcast
    // rather than building a bloom filter). The audit tables are dim-
    // broadcast-sized, so force the shuffle-join shape the 100 TB plan
    // would actually have.
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("selective dim join gets a bloom filter injected into the fact scan") {
    val li = graft.util.Tables(spark, sf, "lineitem")
    val ord = graft.util.Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") &&
      optimized.contains("bloom_filter_agg"),
      s"no runtime bloom filter injected:\n$optimized")
    // and the filtered plan still computes the right answer
    val n = joined.collect().map(_.getLong(1)).sum
    val expected = li.join(ord.hint("broadcast"), col("l_orderkey") === col("o_orderkey")).count()
    assert(n == expected)
  }

  test("unfiltered dim join does NOT pay a bloom filter") {
    // no selective predicate on the creation side -> injection declined
    // (the filter would pass ~everything; building it is pure cost)
    val li = graft.util.Tables(spark, sf, "lineitem")
    val ord = graft.util.Tables(spark, sf, "orders")
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("might_contain"),
      s"bloom filter injected without a selective creation side:\n$optimized")
  }
}
