package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** LogicalPlan ⇄ DataFrame bridge for custom operators. Spark 4 gates
  * `Dataset.ofRows` and the analyzed-plan accessor behind
  * `private[sql]`; a library that contributes whole logical operators
  * (not just expressions) reaches them through an `org.apache.spark.sql`
  * subpackage, exactly like [[Bridge]] does for Column ⇄ Expression.
  */
object PlanBridge {

  /** Wrap an already-analyzed logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently register an extra planner strategy on a session —
    * the programmatic complement to
    * `SparkSessionExtensions.injectPlannerStrategy` for sessions not
    * started with `spark.sql.extensions=graft.GraftExtensions`.
    */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[ClassicSparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(s))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
