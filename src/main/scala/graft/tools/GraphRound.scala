package graft.tools

import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** One-round plan probe for the graph family (dev tool): counts the
  * Exchange nodes in a single PageRank iteration's contribs join with
  * the edge cache laid out by dropDuplicates' (s, t) hash vs
  * repartition(s) — the evidence for prepareGraph's join-key layout.
  */
object GraphRound {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graph-round")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem")
    val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("s"), (col("l_suppkey") + 1000000L).as("t"))
    Seq(
      "dropDup-cache" -> edges.dropDuplicates().cache(),
      "dropDup-repart(s)-cache" -> edges.dropDuplicates()
        .repartition(col("s")).cache()
    ).foreach { case (label, e) =>
      e.count() // materialize the cache
      val ranks = e.select(col("s").as("node")).distinct()
        .withColumn("rank", lit(1.0)).withColumn("deg", lit(1L))
        .localCheckpoint() // partitioning-less, like the per-round checkpoint
      val contribs = ranks.join(e, col("node") === col("s"))
        .select(col("t").as("node2"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node2")).agg(sum(col("c")).as("in_rank"))
      contribs.collect()
      val p = contribs.queryExecution.executedPlan.toString()
      println(s"===== [graphround] $label =====")
      println(s"[graphround] cached stats bytes = " +
        s"${e.queryExecution.optimizedPlan.stats.sizeInBytes}; " +
        s"join = ${p.linesIterator.find(_.contains("Join")).getOrElse("?").trim}")
      // print only the join-and-above region: stop at the cached scan
      p.linesIterator.takeWhile(!_.contains("InMemoryRelation"))
        .foreach(println)
      e.unpersist(blocking = true)
    }
    spark.stop()
  }
}
