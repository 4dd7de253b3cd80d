package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew/layout utilities for the 100 TB deployment path.
  *
  * Catalyst's partial aggregation already absorbs most aggregation skew,
  * and AQE splits skewed join partitions at runtime; these helpers cover
  * the two cases that remain manual: reducing per-key shuffle pressure
  * for very hot aggregation keys (salting), and pre-shuffling fact
  * tables so repeated joins on the same key are shuffle-free
  * (bucketing).
  */
object ScaleUtils {

  /** Two-phase salted aggregation: sum-shaped aggregates for keys hot
    * enough that even a combiner leaves one reducer with most rows.
    * Phase 1 groups by (key, salt) — spreading a hot key over `salts`
    * reducers — phase 2 merges the partials. Only algebraic aggregates
    * (sum/count/min/max) compose this way; the caller passes phase-1
    * exprs and matching phase-2 merge exprs by output name.
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], salts: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Bounded per-group selection (top-k per group), declared as the
    * row_number-over-partition + rank-filter idiom ON PURPOSE: Catalyst's
    * InferWindowGroupLimit rewrites exactly this shape into a
    * Partial+Final WindowGroupLimit pair around the exchange — each map
    * task keeps a bounded k-row heap per group it sees, so the shuffle
    * moves O(k·groups·tasks) rows and a degenerate hot group (one domain
    * = half the corpus) never funnels through a full single-task sort.
    * Every grouped top-k in the repo (o9_grouped_topk,
    * curation_domain_quota, both phases of Curation.priorityTopK) routes
    * through here so the rewrite contract is pinned ONCE:
    * WindowGroupLimitSpec asserts the executed plan for all call sites,
    * and a Spark upgrade that silently drops the rewrite fails them all
    * by name.
    *
    * The rank column stays in the output (callers project/cast it);
    * ordering must be a TOTAL order (tie-broken) or the kept rows are
    * nondeterministic — same contract as any top-k.
    */
  def groupedTopK(df: DataFrame, partCols: Seq[Column], orderCols: Seq[Column],
                  k: Int, rankCol: String = "rk"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Convenience: salted sum-by-key (the A1 shape under a hot key). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame =
    saltedAggregate(df, keyCols, salts,
      partial = Seq(sum(col(valueCol)).as("__psum")),
      merge = Seq(sum(col("__psum")).as(s"sum_$valueCol")))

  /** Descending cumulative count over DISTINCT values of `valueCol`
    * WITHOUT a global window — the two-level distributed ranking
    * pattern: per-value counts group into coarse ordering-preserving
    * buckets (`bucketOf`, e.g. day / bit-length / log2 — correctness
    * never depends on the bucket boundaries, only monotonicity), bucket
    * subtotals form a BOUNDED table whose prefix sum is the only
    * global-window step, and the within-bucket cumulative window is
    * partitioned by bucket. Returns (v, cum) where cum = #rows with
    * value ≥ v. A plain `Window.orderBy(v)` computes the same thing
    * through ONE partition — fine for a demo, a funnel-point at a
    * billion distinct values.
    */
  def cumCountDesc(df: DataFrame, valueCol: String,
                   bucketOf: Column => Column,
                   partitionCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = partitionCols.map(col)
    val vc = df.groupBy(p :+ col(valueCol).as("v"): _*).agg(count(lit(1)).as("c"))
      .withColumn("b", bucketOf(col("v")))
    val bt = vc.groupBy(p :+ col("b"): _*).agg(sum(col("c")).as("bc"))
    val wPrefix = Window.partitionBy(p: _*).orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = bt.withColumn("off", coalesce(sum(col("bc")).over(wPrefix), lit(0L)))
    val wIn = Window.partitionBy(p :+ col("b"): _*).orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vc.join(broadcast(pre.select(p :+ col("b") :+ col("off"): _*)),
        partitionCols :+ "b")
      .withColumn("cum", col("off") + sum(col("c")).over(wIn))
      .select(p :+ col("v") :+ col("cum"): _*)
  }

  /** Write a table bucketed by a join key: subsequent equi-joins between
    * tables bucketed the same way need no Exchange (the co-located join
    * the reference approximates with repartition, sparkcc.py:600-603 —
    * but persistent across jobs).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
