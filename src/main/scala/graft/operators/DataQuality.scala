package graft.operators

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling and rule checks over the documents corpus —
  * the validation gate a training-data pipeline runs before shipping a
  * crawl snapshot (Deequ-style constraint checking, re-expressed as
  * plain Spark aggregates; no reference counterpart — cc-pyspark
  * ships data unvalidated).
  *
  * Scale shape: both queries are single aggregation passes over the
  * corpus. The profile's exact multi-column COUNT(DISTINCT) plans as
  * one Expand (×k row multiplication for k distinct-columns) + one
  * partial+final agg — the exact form is kept because the oracle must
  * match bit-for-bit; a 100 TB deployment swaps `countDistinct` for
  * `approx_count_distinct` (HLL++, no Expand) per column, the same
  * trade approx_distinct_audit quantifies. The checks query is pure
  * conditional counting — map-side combine, one 1-row exchange.
  */
object DataQuality {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Per-column completeness/distinctness profile of ANY DataFrame in
    * one aggregation pass (the `JobRunner dq` entry point profiles an
    * arbitrary parquet input with this).
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    // arbitrary parquet columns are legal SQL-identifier hazards
    // (dashes, dots, reserved words) — backtick-quote everywhere, and
    // skip map columns, which have no equality and break countDistinct
    val cols = (if (columns.nonEmpty) columns else df.columns.toSeq).filter(c =>
      !df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    require(cols.nonEmpty, "profile: no profilable (non-map) columns")
    def bq(c: String) = "`" + c.replace("`", "``") + "`"
    def sq(c: String) = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val agg0 = df.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        count(col(bq(c))).as(s"nn_$c"),
        countDistinct(col(bq(c))).as(s"nd_$c"))): _*)
    val stackExpr = cols.map(c => s"${sq(c)}, ${bq(s"nn_$c")}, ${bq(s"nd_$c")}").mkString(", ")
    agg0.selectExpr("n_rows",
        s"stack(${cols.size}, $stackExpr) AS (column_name, n_nonnull, n_distinct)")
      .select(col("column_name"), col("n_rows"), col("n_nonnull"), col("n_distinct"),
        round(lit(1.0) - col("n_nonnull").cast("double") / col("n_rows"), 6)
          .as("null_frac"))
  }

  /** Per-column completeness and distinctness profile: one row per
    * column of `documents`, computed in a single pass.
    */
  val dqProfile: QueryDef = QueryDef(
    "dq_profile",
    (s, dir) => profile(t(s, dir, "documents"),
      Seq("doc_id", "text", "lang", "source", "n_chars")),
    Some(Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
        COUNT(DISTINCT $c) AS n_distinct,
        ROUND(1.0 - CAST(COUNT($c) AS DOUBLE) / COUNT(*), 6) AS null_frac
        FROM documents""").mkString("\nUNION ALL\n")))

  /** Constraint-rule evaluation: each rule emits (rule, n_checked,
    * n_violations, pass). Uniqueness is checked without a second scan
    * by comparing COUNT vs COUNT(DISTINCT); the row-level rules are
    * conditional sums in the same aggregate.
    */
  val dqChecks: QueryDef = QueryDef(
    "dq_checks",
    (s, dir) => {
      val agg0 = t(s, dir, "documents").agg(
        count(lit(1)).as("n"),
        count(col("doc_id")).as("nn_id"),
        countDistinct(col("doc_id")).as("nd_id"),
        sum(when(col("n_chars") < 0, 1L).otherwise(0L)).as("neg_chars"),
        sum(when(length(col("text")) =!= col("n_chars"), 1L).otherwise(0L))
          .as("len_mismatch"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L).otherwise(0L))
          .as("empty_text"),
        sum(when(!col("lang").isin("en", "de", "fr", "es", "it"), 1L).otherwise(0L))
          .as("bad_lang"))
      agg0.selectExpr(
          """stack(5,
            'doc_id_unique',    n, n - (CASE WHEN nn_id = n THEN nd_id ELSE -1 END),
            'n_chars_nonneg',   n, neg_chars,
            'text_len_matches', n, len_mismatch,
            'text_nonempty',    n, empty_text,
            'lang_in_allowed',  n, bad_lang
          ) AS (rule, n_checked, n_violations)""")
        .select(col("rule"), col("n_checked"), col("n_violations"),
          (col("n_violations") === 0).as("pass"))
    },
    Some("""WITH a AS (SELECT COUNT(*) AS n, COUNT(doc_id) AS nn_id,
        COUNT(DISTINCT doc_id) AS nd_id,
        SUM(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END) AS neg_chars,
        SUM(CASE WHEN LENGTH(text) <> n_chars THEN 1 ELSE 0 END) AS len_mismatch,
        SUM(CASE WHEN text IS NULL OR LENGTH(text) = 0 THEN 1 ELSE 0 END) AS empty_text,
        SUM(CASE WHEN lang NOT IN ('en','de','fr','es','it') THEN 1 ELSE 0 END) AS bad_lang
        FROM documents)
      SELECT rule, n_checked, n_violations, n_violations = 0 AS pass FROM (
        SELECT 'doc_id_unique' AS rule, n AS n_checked,
          CAST(n - (CASE WHEN nn_id = n THEN nd_id ELSE -1 END) AS BIGINT) AS n_violations FROM a
        UNION ALL SELECT 'n_chars_nonneg', n, CAST(neg_chars AS BIGINT) FROM a
        UNION ALL SELECT 'text_len_matches', n, CAST(len_mismatch AS BIGINT) FROM a
        UNION ALL SELECT 'text_nonempty', n, CAST(empty_text AS BIGINT) FROM a
        UNION ALL SELECT 'lang_in_allowed', n, CAST(bad_lang AS BIGINT) FROM a)"""))

  val all: Seq[QueryDef] = Seq(dqProfile, dqChecks)
}
