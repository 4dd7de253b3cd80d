package graft.operators

import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** DSIR — data selection via importance resampling (Xie et al. 2023,
  * public recipe): score every raw-pool document by how much more likely
  * its tokens are under a TARGET distribution (a small trusted corpus)
  * than under the raw pool itself, then keep the top slice. The
  * hashed-n-gram variant in the paper reduces to exactly this unigram
  * log-likelihood-ratio sum; here the features are the token strings
  * themselves so the whole computation stays relational and the DuckDB
  * oracle reproduces it bit for bit.
  *
  * Scale shape: both language models ARE one distributed table (per-token
  * target/raw counts from a single conditional aggregation over one
  * tokenize pass — no second scan for the second distribution), scoring
  * is a keyed equi-join on the token, and the per-doc sum uses the
  * order-independent decimal pattern. Selection is TakeOrdered (top-N by
  * score), never a global window sort. The token join key is zipfian
  * ("the" carries a big posting list) — same note as NgramLm: AQE skew
  * handling or a hot-key salt at 100 TB; nothing here is quadratic and
  * nothing collects to the driver.
  */
object Dsir {

  /** Per-raw-doc DSIR importance score against the target split:
    * (doc_id, source, n_toks, score) where score is the mean over the
    * doc's tokens of round(log p_target(w) − log p_raw(w), 6dp), both
    * sides add-one smoothed over the shared observed vocabulary. Docs
    * with zero tokens vanish (no rows to score), matching the oracle.
    */
  def importanceScores(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("source"), isTarget.as("is_t"),
        explode(tokens(col("text"))).as("w"))
    val counts = toks.groupBy(col("w")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    val totals = counts
      .agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
        count(lit(1)).as("v"))
      .withColumn("one", lit(1))
    toks.filter(!col("is_t"))
      .join(counts, Seq("w"))
      .withColumn("one", lit(1)).join(broadcast(totals), "one")
      .withColumn("lr6", round(
        log((col("ct") + lit(1)).cast(DoubleType) /
          (col("nt") + col("v")).cast(DoubleType)) -
          log((col("cr") + lit(1)).cast(DoubleType) /
            (col("nr") + col("v")).cast(DoubleType)), 6))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_toks"),
        (sum(col("lr6").cast(DecimalType(38, 12))).cast(DoubleType) /
          count(lit(1))).as("score"))
  }

  /** Registered query: target = source 'src0' (the stand-in trusted
    * corpus), raw pool = everything else; select the 100 most
    * target-like raw docs (deterministic tie-break on doc_id) and report
    * the per-source composition of the selection — the number a pipeline
    * owner reads to see which pools DSIR actually draws from.
    */
  val dsirSelect: QueryDef = QueryDef(
    "curation_dsir",
    (s, dir) => {
      val scored = importanceScores(
        Tables(s, dir, "documents"), col("source") === "src0")
      scored.orderBy(col("score").desc, col("doc_id")).limit(100)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_selected"),
          (sum(round(col("score"), 6).cast(DecimalType(38, 12))).cast(DoubleType) /
            count(lit(1))).cast(DecimalType(20, 6)).cast(DoubleType).as("avg_score"))
    },
    Some("""WITH d AS (SELECT doc_id, source, source = 'src0' AS is_t,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      w AS (SELECT doc_id, source, is_t, unnest(toks) AS w FROM d),
      c AS (SELECT w, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                   SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
            FROM w GROUP BY w),
      t AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr, COUNT(*) AS v FROM c),
      s AS (SELECT doc_id, source,
          round(ln(CAST(c.ct + 1 AS DOUBLE) / CAST(t.nt + t.v AS DOUBLE)) -
                ln(CAST(c.cr + 1 AS DOUBLE) / CAST(t.nr + t.v AS DOUBLE)), 6) AS lr6
        FROM w JOIN c USING (w), t WHERE NOT is_t),
      pd AS (SELECT doc_id, source,
          CAST(SUM(CAST(lr6 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS score
        FROM s GROUP BY doc_id, source),
      top AS (SELECT * FROM pd ORDER BY score DESC, doc_id LIMIT 100)
      SELECT source, COUNT(*) AS n_selected,
        CAST(CAST(CAST(SUM(CAST(round(score, 6) AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*) AS DECIMAL(20,6)) AS DOUBLE) AS avg_score
      FROM top GROUP BY source"""))

  val all: Seq[QueryDef] = Seq(dsirSelect)
}
