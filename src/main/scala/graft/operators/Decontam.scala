package graft.operators

import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.functions.ShingleHashes
import graft.util.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination: tag every training document with its 13-gram
  * overlap against a held-out eval set — the public GPT-3 (Brown et al.
  * 2020, appendix C) / PaLM recipe for keeping benchmark text out of
  * pretraining data.
  *
  * Scale shape: documents never meet each other — each side reduces to
  * DISTINCT 8-byte window hashes (ShingleHashes.longWindowHashes, one
  * codegen'd scan, no gram strings materialized), and contamination is a
  * keyed equi-join on the hash followed by a per-doc count. The eval side
  * is typically small (benchmarks), so AQE broadcasts it; when it is not,
  * the join shuffles 8-byte keys, never text. No step is quadratic and
  * nothing collects to the driver.
  */
object Decontam {

  /** Distinct word-w-gram hashes per doc (docs shorter than w words have
    * no w-grams and are dropped, matching the SQL semantics).
    */
  private def gramHashes(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), expr("transform(toks, t -> xxhash64(t))").as("th"))
      .select(col("doc_id"), ShingleHashes.longWindowHashes(col("th"), w).as("grams"))

  /** Per-training-doc overlap against the eval set: (doc_id, n_grams,
    * n_matched, overlap_frac, contaminated). `docs`/`evalDocs` both need
    * (doc_id, text). Counts are over DISTINCT grams, so a gram repeated
    * inside one document counts once — the standard defn.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, w: Int = 13): DataFrame = {
    val trainGrams = gramHashes(docs, w)
    val evalGrams = gramHashes(evalDocs, w)
      .select(explode(col("grams")).as("g")).distinct()
    val totals = trainGrams.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
    val matched = trainGrams.select(col("doc_id"), explode(col("grams")).as("g"))
      .join(evalGrams, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matched"))
    totals.join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("overlap_frac",
        round(col("n_matched").cast("double") / col("n_grams"), 6))
      .withColumn("contaminated", col("n_matched") > 0)
  }

  /** Registered query: eval set = every 10th doc_id of the documents
    * table (a deterministic held-out split the DuckDB oracle replicates);
    * the Spark side joins on 64-bit window hashes where the oracle joins
    * on the gram strings — identical counts short of an xxhash64
    * collision (~n²/2⁶⁵).
    */
  val decontamination: QueryDef = QueryDef(
    "decontamination",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      decontaminate(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
    },
    Some("""WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents),
      grams AS (
        SELECT tk.doc_id, array_to_string(toks[i : i + 12], ' ') AS gram
        FROM tk, UNNEST(generate_series(1, greatest(len(toks) - 12, 0))) AS t(i)
        WHERE len(toks) >= 13),
      dg AS (SELECT DISTINCT doc_id, gram FROM grams),
      eval_grams AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 10 = 0),
      totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM dg
        WHERE doc_id % 10 != 0 GROUP BY doc_id),
      matched AS (SELECT dg.doc_id, COUNT(*) AS n_matched
        FROM dg JOIN eval_grams e USING (gram)
        WHERE dg.doc_id % 10 != 0 GROUP BY dg.doc_id)
      SELECT t.doc_id, t.n_grams, COALESCE(m.n_matched, 0) AS n_matched,
        round(CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / t.n_grams, 6) AS overlap_frac,
        COALESCE(m.n_matched, 0) > 0 AS contaminated
      FROM totals t LEFT JOIN matched m USING (doc_id)"""))

  val all: Seq[QueryDef] = Seq(decontamination)
}
