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

  /** Convenience: salted sum-by-key (the A1 shape under a hot key). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame =
    saltedAggregate(df, keyCols, salts,
      partial = Seq(sum(col(valueCol)).as("__psum")),
      merge = Seq(sum(col("__psum")).as(s"sum_$valueCol")))

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
