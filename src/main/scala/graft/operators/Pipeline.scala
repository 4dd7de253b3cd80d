package graft.operators

import graft.util.Checkpoints.ReliableOps
import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.functions.ShingleHashes
import graft.util.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation over the documents table — the
  * composition a real pretraining pipeline runs, as ONE Catalyst plan:
  *
  *   1. quality gate (mild thresholds: ≥20 tokens, ≥1 stop-word hit);
  *   2. exact dedup (keep the min doc_id per content digest);
  *   3. eval-set decontamination (13-gram hash overlap vs the held-out
  *      doc_id%10 split, dropping any doc sharing a gram);
  *   4. per-source accounting: surviving docs, token budget, and how
  *      many docs each stage dropped.
  *
  * Every stage is a narrow column expression or a keyed join — the plan
  * scans documents twice (once for the eval grams, once for the
  * pipeline), shuffles 8-byte digests/gram-hashes, and aggregates to
  * one row per source. Oracle-checked end to end (the only cross-engine
  * seam is the gram join: Spark joins 64-bit window hashes where DuckDB
  * joins gram strings — identical drop decisions short of an xxhash64
  * collision).
  */
object Pipeline {

  /** The pipeline's per-document outcome flags: (doc_id, source, n_tok,
    * q = passed quality, d = survived dedup, kept = survived
    * decontamination too). One row per non-eval doc; the `curate` job
    * joins `kept` back to the full rows to write the curated corpus,
    * the registered query aggregates it per source.
    */
  def outcomeFlags(docs: DataFrame): DataFrame = {
      val nonEval = docs.filter(col("doc_id") % 10 =!= 0) // eval split stays out
      // SLIM per-doc flag table, eagerly checkpointed WITHOUT the token
      // arrays: every stage (quality gate, dedup survivor pick, the
      // final accounting join) consumed `base` and un-checkpointed each
      // re-ran the tokenize+md5 corpus pass (~4 executed passes); the
      // checkpoint is ~50 B/doc — materializing the token arrays
      // themselves is the trade minHashDedup's r2 A/B rejected, so the
      // decontamination gram pass below re-derives tokens for the
      // DEDUP SURVIVORS only instead of riding a fat checkpoint
      val base = nonEval
        .select(col("doc_id"), col("source"),
          tokens(col("text")).as("toks"),
          md5(col("text").cast("binary")).as("sig"))
        .select(col("doc_id"), col("source"), col("sig"),
          size(col("toks")).as("n_tok"),
          size(array_distinct(filter(col("toks"),
            t => t.isin(Seq("the", "be", "to", "of", "and", "that", "have", "with"): _*))))
            .as("stop_hits"))
        .stableCheckpoint()
      val qualifiedCond = col("n_tok") >= 20 && col("stop_hits") >= 1
      val qualified = base.filter(qualifiedCond)
      // exact dedup: survivor = min doc_id per digest
      val keepers = qualified
        .groupBy(col("sig")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), lit(true).as("is_keeper"))
      val dedupedIds = qualified
        .join(keepers.drop("is_keeper"), Seq("doc_id"), "left_semi")
        .select(col("doc_id"))
      // decontamination: any shared 13-gram with the eval split drops
      val evalGrams = docs.filter(col("doc_id") % 10 === 0)
        .select(tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 13)
        .select(explode(ShingleHashes.longWindowHashes(
          expr("transform(toks, t -> xxhash64(t))"), 13)).as("g"))
        .distinct()
      val contaminatedIds = nonEval
        .join(dedupedIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 13)
        .select(col("doc_id"), explode(ShingleHashes.longWindowHashes(
          expr("transform(toks, t -> xxhash64(t))"), 13)).as("g"))
        .join(evalGrams, Seq("g"), "left_semi")
        .select(col("doc_id")).distinct()
        .withColumn("is_contam", lit(true))
      // per-source accounting in ONE pass: stage outcomes become boolean
      // flag columns (two keyed joins of small id lists back onto the
      // base stream) + one conditional aggregation — the base documents
      // are scanned once for the accounting, not once per stage
      base
        .join(keepers, Seq("doc_id"), "left")
        .join(contaminatedIds, Seq("doc_id"), "left")
        .withColumn("q", qualifiedCond)
        .withColumn("d", qualifiedCond && coalesce(col("is_keeper"), lit(false)))
        .withColumn("kept", col("d") && !coalesce(col("is_contam"), lit(false)))
        .select(col("doc_id"), col("source"), col("n_tok"),
          col("q"), col("d"), col("kept"))
  }

  /** Per-source accounting over the outcome flags — one conditional
    * aggregation, the base documents scanned once, not once per stage.
    */
  def accounting(docs: DataFrame): DataFrame =
    outcomeFlags(docs).groupBy(col("source")).agg(
      count(lit(1)).as("n_input"),
      sum(when(col("q"), 1L).otherwise(0L)).as("n_qualified"),
      sum(when(col("d"), 1L).otherwise(0L)).as("n_deduped"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("kept"), col("n_tok").cast("long")).otherwise(0L)).as("kept_tokens"))

  val pipelineCuration: QueryDef = QueryDef(
    "pipeline_curation",
    (s, dir) => accounting(Tables(s, dir, "documents")),
    Some("""WITH base AS (
        SELECT doc_id, source,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
          md5(text) AS sig
        FROM documents WHERE doc_id % 10 != 0),
      m AS (
        SELECT doc_id, source, sig, toks, len(toks) AS n_tok,
          len(list_distinct(list_filter(toks,
            t -> t IN ('the','be','to','of','and','that','have','with')))) AS stop_hits
        FROM base),
      qualified AS (SELECT * FROM m WHERE n_tok >= 20 AND stop_hits >= 1),
      keepers AS (SELECT MIN(doc_id) AS doc_id FROM qualified GROUP BY sig),
      deduped AS (SELECT q.* FROM qualified q JOIN keepers k USING (doc_id)),
      eval_grams AS (
        SELECT DISTINCT array_to_string(toks[i : i + 12], ' ') AS gram
        FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents WHERE doc_id % 10 = 0) e,
          UNNEST(generate_series(1, greatest(len(toks) - 12, 0))) AS t(i)
        WHERE len(toks) >= 13),
      contaminated AS (
        SELECT DISTINCT d.doc_id
        FROM (SELECT doc_id, array_to_string(toks[i : i + 12], ' ') AS gram
              FROM deduped, UNNEST(generate_series(1, greatest(len(toks) - 12, 0))) AS t(i)
              WHERE len(toks) >= 13) d
        JOIN eval_grams USING (gram)),
      clean AS (SELECT * FROM deduped
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
      SELECT b.source,
        COUNT(*) AS n_input,
        CAST(coalesce(SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_qualified,
        CAST(coalesce(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_deduped,
        CAST(coalesce(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_kept,
        CAST(coalesce(SUM(c.n_tok), 0) AS BIGINT) AS kept_tokens
      FROM m b
      LEFT JOIN (SELECT doc_id FROM qualified) q USING (doc_id)
      LEFT JOIN (SELECT doc_id FROM deduped) d USING (doc_id)
      LEFT JOIN (SELECT doc_id, n_tok FROM clean) c USING (doc_id)
      GROUP BY b.source"""))

  val all: Seq[QueryDef] = Seq(pipelineCuration)
}
