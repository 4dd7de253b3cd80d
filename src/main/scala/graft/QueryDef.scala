package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark-side implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Queries without an oracle get the
  * driver's weaker rows>0 check and are additionally covered by ScalaTest.
  *
  * `oracleGen` is the DATA-DEPENDENT oracle variant: queries whose
  * pipeline includes a deterministic trained artifact (k-means
  * centroids, PQ codebooks, a PCA basis, a BPE merge table) cannot
  * carry a static SQL string — the artifact is a function of the input
  * corpus. The generator is evaluated by [[graft.Verify]] AFTER the
  * queries run, with the same (session, sf dir), and embeds the
  * artifact as SQL literals (Double.toString round-trips the exact
  * double, the proven LSH-plane pattern), so DuckDB replays the full
  * pipeline — training output included — end to end. Generators must
  * read the artifact from the SAME per-session cache the query fn
  * trained into, never retrain: float Lloyd means are only
  * deterministic per (session, partitioning), and the hash gate
  * compares this run's query output against this run's oracle.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    oracleGen: Option[(SparkSession, String) => String] = None)

object QueryDef {

  /** Output columns Spark cannot sort on (maps); a query whose output
    * contains one keeps its own ordering contract.
    */
  private def sortable(df: DataFrame): Boolean =
    !df.schema.fields.exists(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])

  /** Pins a data-determined output order on both sides of the oracle
    * comparison: the Spark plan gets a terminal global sort over every
    * output column (left-to-right), the oracle SQL is wrapped in
    * `SELECT * FROM (...) ORDER BY ALL` — DuckDB's equivalent
    * all-columns-left-to-right sort. Without this, an aggregate tail
    * leaves rows in partition order, which varies with cpu count and
    * AQE, and any row-order-sensitive comparison flips
    * nondeterministically. The sort cost is bounded by the query's
    * OUTPUT size (summaries, top-ks), never the input, so it does not
    * change any query's scale shape.
    */
  def ordered(q: QueryDef): QueryDef = q.copy(
    fn = (s, dir) => {
      val df = q.fn(s, dir)
      if (sortable(df))
        df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*)
      else df
    },
    oracle = q.oracle.map(sql => s"SELECT * FROM (\n$sql\n) ORDER BY ALL"),
    oracleGen = q.oracleGen.map(gen =>
      (s, dir) => s"SELECT * FROM (\n${gen(s, dir)}\n) ORDER BY ALL"))
}
