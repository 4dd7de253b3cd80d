package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Catalyst rank-limit pushdown the grouped-top-k idiom relies
  * on: `row_number().over(partitionBy...orderBy...)` + `filter(rk <= k)`
  * must plan a WindowGroupLimit PAIR — a Partial group-limit BEFORE the
  * exchange (each map task keeps only k rows per group via a bounded
  * heap) and a Final one after — so the shuffle moves O(k·groups·tasks)
  * rows instead of the corpus. This is why the repo declares grouped
  * top-k instead of hand-building a top-k aggregate; if a conf or Spark
  * upgrade silently drops the rewrite (falling back to a full per-group
  * sort of every row), this spec fails by name rather than the bench
  * quietly regressing.
  */
class WindowGroupLimitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** All grouped top-k call sites route through ScaleUtils.groupedTopK;
    * this assertion pins the rewrite for each registered query that
    * uses it, so a Spark upgrade that drops the pushdown fails every
    * site by name at once.
    */
  private def assertGroupLimitPushdown(name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"$name: rank-limit pushdown missing — full window sort of the corpus:\n$plan")
    assert(plan.contains("Partial") && plan.contains("Final"),
      s"$name: expected map-side Partial + reduce-side Final group limits:\n$plan")
    // the Partial limit must sit BELOW the exchange (map side)
    val lines = plan.linesIterator.toVector
    val partialIdx = lines.indexWhere(l => l.contains("WindowGroupLimit") && l.contains("Partial"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"$name: Partial group limit should be under the exchange in the plan tree:\n$plan")
  }

  test("o9_grouped_topk plans a Partial+Final WindowGroupLimit around the exchange") {
    assertGroupLimitPushdown("o9_grouped_topk")
  }

  test("curation_domain_quota gets the same pushdown (the skewed-domain cap)") {
    assertGroupLimitPushdown("curation_domain_quota")
  }

  test("curation_priority_sample's two-phase rank keeps the pushdown in both phases") {
    assertGroupLimitPushdown("curation_priority_sample")
    val plan = SparkEntry.queries("curation_priority_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    // salted local phase + global phase = at least two group-limit sites
    assert(plan.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      s"expected group limits in BOTH priorityTopK phases:\n$plan")
  }

  test("grouped top-k output matches a naive per-group sort-take") {
    import scala.jdk.CollectionConverters._
    val rows = SparkEntry.queries("o9_grouped_topk")(spark, sf)
      .collectAsList().asScala
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getAs[Number](3).longValue, r.getAs[Number](4).longValue,
        r.getAs[Number](5).longValue))
    val naive = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_extendedprice",
        "l_orderkey", "l_linenumber")
      .collectAsList().asScala
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getAs[Number](3).longValue, r.getAs[Number](4).longValue))
      .groupBy(t => (t._1, t._2))
      .flatMap { case (_, g) =>
        g.toSeq.sortBy(t => (-t._3, t._4, t._5)).take(5).zipWithIndex
          .map { case (t, i) => (t._1, t._2, t._3, t._4, t._5, (i + 1).toLong) }
      }.toSet
    assert(rows.toSet == naive, "pushed-down group limit changed the result")
  }
}
