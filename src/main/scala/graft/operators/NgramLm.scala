package graft.operators

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
    docs.select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), col("toks"),
        posexplode(expr("slice(toks, 1, size(toks) - 1)")).as(Seq("pos", "w1")))
      .select(col("doc_id"), col("source"), col("w1"),
        expr("toks[pos + 1]").as("w2"))

  private def splitKey = TextClassifier.splitKey

  /** Registered query: train on the 80% split, score the held-out 20%,
    * report per-source held-out perplexity. Add-one smoothing over the
    * training vocabulary; unseen heads fall back to 1/V exactly.
    */
  val lmPerplexity: QueryDef = QueryDef(
    "quality_lm_score",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val train = bigrams(docs.filter(splitKey < 800))
      val pair = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val head = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val vocab = train.agg(countDistinct(col("w2")).as("v")).withColumn("one", lit(1))
      val scored = bigrams(docs.filter(splitKey >= 800))
        .join(pair, Seq("w1", "w2"), "left")
        .join(head, Seq("w1"), "left")
        .withColumn("one", lit(1)).join(broadcast(vocab), "one")
        .withColumn("logp6", round(
          log((coalesce(col("c2"), lit(0L)) + lit(1)).cast(DoubleType) /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast(DoubleType)), 6))
      val perDoc = scored.groupBy(col("doc_id"), col("source"))
        .agg((sum(col("logp6").cast(DecimalType(38, 12))).cast(DoubleType) /
          count(lit(1))).as("avg_logp"))
        .withColumn("ppl6", round(exp(-col("avg_logp")), 6))
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

  val all: Seq[QueryDef] = Seq(lmPerplexity)
}
