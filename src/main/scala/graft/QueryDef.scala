package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark-side implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Queries without an oracle get the
  * driver's weaker rows>0 check and are additionally covered by ScalaTest.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
