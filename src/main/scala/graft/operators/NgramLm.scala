package graft.operators

import graft.util.Checkpoints.ReliableOps
import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** N-gram language-model perplexity scoring — the CCNet quality signal:
  * train a bigram LM on a reference split, score documents by held-out
  * perplexity, filter/bucket by the score. Entirely relational, so unlike
  * the logistic classifier this one IS oracle-checkable: counts are
  * groupBys, probabilities are add-one-smoothed count ratios, and the
  * per-doc aggregation uses the round-to-6dp-then-exact-decimal-sum
  * pattern (GraftFunctions.dsum's trick) so the sum is independent of
  * aggregation order and bit-identical across Spark, DuckDB, and any
  * cluster size.
  *
  * Scale shape: the model IS a distributed table (bigram counts keyed on
  * the word pair, head counts keyed on the head) — no driver collect, no
  * size cap beyond observed-vocab²; scoring joins are keyed equi-joins.
  * The head-count join key is zipfian ("the" heads many bigrams) — at
  * 100 TB that join wants the AQE skew handling already on, or a salt on
  * the few ultra-hot heads; the bigram-pair key is fine-grained and safe.
  */
object NgramLm {

  /** (doc_id, source, w1, w2) bigram stream; docs with <2 tokens vanish
    * (slice of length size-1 is empty), matching generate_series's empty
    * range in the oracle.
    */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), col("lang"), col("toks"),
        posexplode(expr("slice(toks, 1, size(toks) - 1)")).as(Seq("pos", "w1")))
      .select(col("doc_id"), col("source"), col("lang"), col("w1"),
        expr("toks[pos + 1]").as("w2"))

  private def splitKey = TextClassifier.splitKey

  /** Per-doc bigram perplexity of `scoreDocs` under the add-one-smoothed
    * LM counted from `trainDocs`: (doc_id, source, lang, ppl6). The
    * model IS a distributed table; scoring is keyed equi-joins; the
    * per-doc sum uses the order-independent decimal pattern so ppl6 is
    * bit-identical across engines and cluster sizes. Docs with <2 tokens
    * produce no bigrams and vanish (matching the oracle).
    */
  def perDocPerplexity(trainDocs: DataFrame, scoreDocs: DataFrame): DataFrame = {
    val train = bigrams(trainDocs)
    // head and vocab DERIVE FROM pair instead of re-aggregating train:
    // c1 = Σ_w2 c2 exactly, and v = |distinct w2| over pair's distinct
    // (w1, w2) keys exactly — while three independent aggregations over
    // `train` planned three copies of the tokenize→posexplode scan.
    // pair is CHECKPOINTED because plan-level reuse does not close the
    // gap by itself (the scoring join pushes an isnotnull(w2) filter
    // into its pair copy that head's copy lacks, so the canonical forms
    // differ and AQE stage reuse never fires — read off the executed
    // plan): the train-side tokenize→bigram pass runs exactly once, and
    // the materialized table is model-sized (observed-vocab² bounded),
    // orders of magnitude below the corpus that produced it.
    val pair = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .stableCheckpoint()
    val head = pair.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = pair.agg(countDistinct(col("w2")).as("v")).withColumn("one", lit(1))
    val scored = bigrams(scoreDocs)
      .join(pair, Seq("w1", "w2"), "left")
      .join(head, Seq("w1"), "left")
      .withColumn("one", lit(1)).join(broadcast(vocab), "one")
      .withColumn("logp6", round(
        log((coalesce(col("c2"), lit(0L)) + lit(1)).cast(DoubleType) /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast(DoubleType)), 6))
    scored.groupBy(col("doc_id"), col("source"), col("lang"))
      .agg((sum(col("logp6").cast(DecimalType(38, 12))).cast(DoubleType) /
        count(lit(1))).as("avg_logp"))
      .withColumn("ppl6", round(exp(-col("avg_logp")), 6))
  }

  /** Registered query: train on the 80% split, score the held-out 20%,
    * report per-source held-out perplexity. Add-one smoothing over the
    * training vocabulary; unseen heads fall back to 1/V exactly.
    */
  val lmPerplexity: QueryDef = QueryDef(
    "quality_lm_score",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val perDoc = perDocPerplexity(
        docs.filter(splitKey < 800), docs.filter(splitKey >= 800))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("ppl6").cast(DecimalType(38, 12))).cast(DoubleType) /
            count(lit(1))).cast(DecimalType(20, 4)).cast(DoubleType).as("avg_ppl"))
    },
    Some("""WITH d AS (SELECT doc_id, source,
        ((doc_id % 999983) * (2654435761 % 999983)) % 999983 % 1000 AS k,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      bg AS (SELECT doc_id, source, k, toks[i] AS w1, toks[i+1] AS w2
             FROM d, unnest(generate_series(1, len(toks) - 1)) AS g(i)),
      train AS (SELECT w1, w2 FROM bg WHERE k < 800),
      pair AS (SELECT w1, w2, COUNT(*) AS c2 FROM train GROUP BY w1, w2),
      head AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
      vocab AS (SELECT COUNT(DISTINCT w2) AS v FROM train),
      scored AS (SELECT b.doc_id, b.source,
          round(ln(CAST(COALESCE(p.c2, 0) + 1 AS DOUBLE) /
                   CAST(COALESCE(h.c1, 0) + vocab.v AS DOUBLE)), 6) AS logp6
        FROM bg b
        LEFT JOIN pair p USING (w1, w2)
        LEFT JOIN head h USING (w1), vocab
        WHERE b.k >= 800),
      per_doc AS (SELECT doc_id, source,
          CAST(SUM(CAST(logp6 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS avg_logp
        FROM scored GROUP BY doc_id, source),
      ppl AS (SELECT doc_id, source, round(exp(-avg_logp), 6) AS ppl6 FROM per_doc)
      SELECT source, COUNT(*) AS n_docs,
        CAST(CAST(CAST(SUM(CAST(ppl6 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
             AS DECIMAL(20,4)) AS DOUBLE) AS avg_ppl
      FROM ppl GROUP BY source"""))

  /** CCNet-style head/middle/tail perplexity split (Wenzek et al. 2020):
    * score every doc under the LM trained on the 80% split, cut each
    * LANGUAGE's perplexity distribution at its own terciles, and report
    * per-(lang, bucket) counts and mean perplexity — the bucketing step
    * CCNet uses to keep only head/middle web text per language.
    *
    * Scale shape: a tercile cutoff is "the smallest ppl6 value whose
    * cumulative doc count reaches ⌈n·q⌉" — computed over the DISTINCT
    * (lang, ppl6) values, not the docs: ppl6 is 6dp-rounded so the
    * distinct-value table is bounded and the per-lang cumulative window
    * sorts values, never documents. (Spark's own percentile_disc uses an
    * interpolation-style position rule that differs from the standard
    * cume_dist definition at exact-boundary ranks — measured: on 1..6 at
    * q=2/3 it returns 5 where the SQL-standard answer is 4 — so both
    * engines compute the cutoff from the same explicit rank arithmetic
    * instead.) At 100 TB the production recipe swaps the exact cutoffs
    * for approx_percentile — CCNet itself estimates them from a sample.
    */
  val pplBuckets: QueryDef = QueryDef(
    "quality_ppl_buckets",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      // the scored per-doc table is consumed twice (the distinct-value
      // ranking and the final bucketing join); an eager stable checkpoint
      // materializes the expensive scoring pipeline (tokenize →
      // bigram explode → two model joins → per-doc agg) exactly once —
      // un-checkpointed, each consumer re-executed it from the scan
      // (blocks are reclaimed by the ContextCleaner when the result
      // frame is garbage-collected, the probe-path pattern)
      val perDoc = perDocPerplexity(docs.filter(splitKey < 800), docs)
        .stableCheckpoint()
      val valueCounts = perDoc.groupBy(col("lang"), col("ppl6"))
        .agg(count(lit(1)).as("c"))
      val wl = Window.partitionBy(col("lang")).orderBy(col("ppl6"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = valueCounts.withColumn("cum", sum(col("c")).over(wl))
      // per-lang doc totals fold off the bounded distinct-value table
      // (Σ c per lang ≡ count of perDoc rows per lang) — not a third
      // pass over perDoc
      val totals = valueCounts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
      val cuts = cum.join(totals, "lang")
        .groupBy(col("lang")).agg(
          min(when(col("cum") >= ceil(col("n") * lit(1.0) / lit(3.0)),
            col("ppl6"))).as("t1"),
          min(when(col("cum") >= ceil(col("n") * lit(2.0) / lit(3.0)),
            col("ppl6"))).as("t2"))
      perDoc.join(broadcast(cuts), "lang")
        .withColumn("bucket",
          when(col("ppl6") <= col("t1"), "head")
            .when(col("ppl6") <= col("t2"), "middle")
            .otherwise("tail"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("ppl6").cast(DecimalType(38, 12))).cast(DoubleType) /
            count(lit(1))).cast(DecimalType(20, 4)).cast(DoubleType).as("avg_ppl"))
    },
    Some("""WITH d AS (SELECT doc_id, source, lang,
        ((doc_id % 999983) * (2654435761 % 999983)) % 999983 % 1000 AS k,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      bg AS (SELECT doc_id, source, lang, k, toks[i] AS w1, toks[i+1] AS w2
             FROM d, unnest(generate_series(1, len(toks) - 1)) AS g(i)),
      train AS (SELECT w1, w2 FROM bg WHERE k < 800),
      pair AS (SELECT w1, w2, COUNT(*) AS c2 FROM train GROUP BY w1, w2),
      head AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
      vocab AS (SELECT COUNT(DISTINCT w2) AS v FROM train),
      scored AS (SELECT b.doc_id, b.source, b.lang,
          round(ln(CAST(COALESCE(p.c2, 0) + 1 AS DOUBLE) /
                   CAST(COALESCE(h.c1, 0) + vocab.v AS DOUBLE)), 6) AS logp6
        FROM bg b
        LEFT JOIN pair p USING (w1, w2)
        LEFT JOIN head h USING (w1), vocab),
      per_doc AS (SELECT doc_id, source, lang,
          CAST(SUM(CAST(logp6 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS avg_logp
        FROM scored GROUP BY doc_id, source, lang),
      ppl AS (SELECT doc_id, source, lang, round(exp(-avg_logp), 6) AS ppl6 FROM per_doc),
      r AS (SELECT lang, ppl6,
          row_number() OVER (PARTITION BY lang ORDER BY ppl6) AS rn,
          COUNT(*) OVER (PARTITION BY lang) AS n FROM ppl),
      cuts AS (SELECT lang,
          MIN(CASE WHEN rn >= ceil(n * 1.0/3.0) THEN ppl6 END) AS t1,
          MIN(CASE WHEN rn >= ceil(n * 2.0/3.0) THEN ppl6 END) AS t2
        FROM r GROUP BY lang),
      b AS (SELECT p.lang,
          CASE WHEN ppl6 <= t1 THEN 'head'
               WHEN ppl6 <= t2 THEN 'middle' ELSE 'tail' END AS bucket, ppl6
        FROM ppl p JOIN cuts USING (lang))
      SELECT lang, bucket, COUNT(*) AS n_docs,
        CAST(CAST(CAST(SUM(CAST(ppl6 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
             AS DECIMAL(20,4)) AS DOUBLE) AS avg_ppl
      FROM b GROUP BY lang, bucket"""))

  val all: Seq[QueryDef] = Seq(lmPerplexity, pplBuckets)
}
