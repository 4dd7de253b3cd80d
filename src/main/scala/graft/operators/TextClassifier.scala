package graft.operators

import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.functions.TokenWeightSum
import graft.util.Tables
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Linear text classification — the fasttext-shaped workhorse of
  * pretraining pipelines (lang-id, CCNet/GPT-3 quality filtering,
  * domain classifiers): hashed bag-of-words features into a logistic
  * regression, then score the whole corpus and filter/weight by score.
  * The train/serve split mirrors how this runs at 100 TB:
  *
  *  - TRAINING is a bounded one-time job: hashed features (2^15 dims,
  *    same hash as serving) into MLlib's distributed LBFGS
  *    LogisticRegression. The featurizer is a UDF — acceptable off the
  *    hot path, exactly like the reference's own UDF surface.
  *  - SERVING (the 100 TB pass) is one codegen'd expression
  *    ([[TokenWeightSum]]): the coefficient vector ships once per task,
  *    each doc is scored in a primitive loop over its tokens; no feature
  *    vector is materialized, no UDF or MLlib runtime on the scoring
  *    path.
  *
  * The registered instance is RULE DISTILLATION — train the classifier
  * to reproduce the Gopher word-count verdict, the pattern used when a
  * filter is too expensive to run everywhere (an LM-perplexity or
  * human-label filter) and a linear proxy runs instead. On this
  * synthetic corpus it is also the only well-posed choice: the `lang`
  * column is label noise w.r.t. the text (measured: identical stopword
  * rates across lang values) and the full Gopher verdict is degenerate
  * (every doc fails the stop-word rule), while the word-count rule
  * splits 277/500. Swapping the label column gives the CCNet quality
  * classifier unchanged.
  */
object TextClassifier {

  val Dim = 1 << 12

  // raw occurrence counts, matching the serving sum exactly: the model
  // is free to learn rate-like signals (relative weights) AND
  // length-like signals (total mass) — the word-count rule needs the
  // latter, which normalization would erase
  private val featurize = udf { toks: Seq[String] =>
    val m = scala.collection.mutable.HashMap.empty[Int, Double]
    toks.foreach { t =>
      val i = TokenWeightSum.bucket(t, Dim)
      m(i) = m.getOrElse(i, 0.0) + 1.0
    }
    Vectors.sparse(Dim, m.toSeq.sortBy(_._1)): Vector
  }

  /** 80/20 split key — same overflow-safe arithmetic hash family as
    * curation_stratified_sample, so the split is reproducible anywhere.
    */
  private[operators] def splitKey = pmod(
    pmod(col("doc_id"), lit(999983L)) * lit(2654435761L % 999983L), lit(999983L)) % 1000

  /** Train a binary LR on rows where `splitKey < 800`. `data` needs
    * `doc_id`, `toks` (array<string>) and `label` (0.0/1.0). Returns
    * (coefficients, intercept). Deterministic: fixed split, and LBFGS on
    * an L2-regularized convex problem converges to the unique optimum.
    */
  def train(data: DataFrame): (Array[Double], Double) = {
    val split = data.filter(splitKey < 800)
    // empty training split (empty corpus/shard): MLlib's summarizer
    // requires ≥1 row; the zero model (all scores 0.5) is the only
    // defensible output and downstream joins are empty anyway. Probe
    // the UN-featurized split — an isEmpty on the featurized frame
    // would run the UDF featurizer over the whole split once just for
    // the guard, doubling featurization cost on the normal path.
    if (split.select(col("doc_id")).limit(1).isEmpty)
      return (Array.fill(Dim)(0.0), 0.0)
    val trainSet = split.select(col("label"), featurize(col("toks")).as("features"))
    // tol 1e-4: each LBFGS iteration is a full treeAggregate job over
    // the split, and a distillation proxy scored at a 0.5 threshold
    // gains nothing from the last 1e-6 of gradient norm — measured, the
    // looser tol roughly halves the iteration count with held-out
    // AUC/accuracy unchanged (TextClassifierSpec floors)
    val lr = new LogisticRegression()
      .setMaxIter(100).setTol(1e-4).setRegParam(1e-5).setStandardization(false)
    val model = lr.fit(trainSet)
    (model.coefficients.toArray, model.intercept)
  }

  /** Native serving path: sigmoid(intercept + Σ w[hash(token)]) over a
    * frame carrying `text`.
    */
  def score(docs: DataFrame, weights: Array[Double], intercept: Double): DataFrame = {
    val z = lit(intercept) +
      TokenWeightSum.tokenWeightSum(tokens(col("text")), weights)
    docs.withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** The distillation target: the Gopher word-count verdict (the one
    * rule that varies on this corpus; rules.TextOps applies the full
    * set on real text).
    */
  private[operators] def ruleLabeled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      // null-intolerant kernels (tokens/TokenWeightSum) emit NULL z for
      // NULL text while the oracle's COALESCE would score it b — filter
      // on BOTH sides so the contract is "scored docs have text"
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        tokens(col("text")).as("toks"))
      .withColumn("label",
        size(col("toks")).between(50, 100000).cast("int").cast("double"))

  /** Session-cached trained model: the query fn and the oracle
    * generator must embed the SAME floats (the QueryDef.oracleGen
    * contract — LBFGS is deterministic only per session/partitioning).
    */
  private val trainedModel =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Double)]()

  private def cachedModel(s: SparkSession, dir: String): (Array[Double], Double) =
    graft.util.Caches.fill(trainedModel, s.sparkContext.applicationId + ":" + dir)(train(ruleLabeled(s, dir)))

  /** Registered query: distill the rule on the 80% split, serve the
    * native scorer over the full corpus, report per-source decision
    * counts, held-out accuracy counts, and the mean margin — the
    * numbers a pipeline operator watches before trusting a learned
    * filter. Every output is either an exact integer or the
    * decimal-summed 6dp margin, and the decision (z ≥ 0 ⟺ score ≥ ½)
    * needs no transcendental, so given the same weights both engines
    * agree bit-for-bit: the ORACLE (a generator — weights embedded as
    * literals, the LSH-plane pattern) replays tokenize → FNV bucket →
    * the left-to-right weight fold (list_reduce pins the kernel's IEEE
    * add order) → threshold/aggregate. TextClassifierSpec additionally
    * grades held-out AUC and pins native-vs-MLlib scoring parity.
    */
  val qualityModel: QueryDef = QueryDef(
    "quality_model_score",
    (s, dir) => {
      val data = ruleLabeled(s, dir)
      val (w, b) = cachedModel(s, dir)
      val z = lit(b) + TokenWeightSum.tokenWeightSum(tokens(col("text")), w)
      Tables(s, dir, "documents").filter(col("text").isNotNull).withColumn("z", z)
        .join(data.select(col("doc_id"), col("label")), "doc_id")
        .select(col("source"), col("label"), col("z"), splitKey.as("k"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("z") >= 0).cast("long")).as("n_pred_pos"),
          sum(when(col("k") >= 800, 1L).otherwise(0L)).as("heldout_n"),
          sum(when(col("k") >= 800 &&
              (col("z") >= 0).cast("double") === col("label"), 1L)
            .otherwise(0L)).as("heldout_correct"),
          round(dsum(round(col("z"), 6)) / count(lit(1)), 4).as("mean_z"))
    },
    oracleGen = Some((s, dir) => {
      val (w, b) = cachedModel(s, dir)
      val dim = w.length
      val wRows = w.zipWithIndex
        .map { case (v, i) => s"($i, ${v.toString})" }.mkString(", ")
      s"""WITH w(i, v) AS (VALUES $wRows),
        d0 AS (SELECT doc_id, source,
               regexp_extract_all(${graft.dedup.Dedup.asciiLower("text")}, '[a-z0-9]+') AS tk
               FROM documents WHERE text IS NOT NULL),
        tok AS (SELECT doc_id, i AS tpos, tk[i] AS t
                FROM d0, unnest(generate_series(1, len(tk))) AS g(i)),
        thu AS (SELECT doc_id, tpos,
            ${graft.dedup.Dedup.fnvU(
              "list_transform(range(1, length(t)+1), ci -> ascii(t[ci]))")} AS u
            FROM tok),
        th0 AS (SELECT doc_id, tpos, ${graft.dedup.Dedup.SignedU} AS h FROM thu),
        tw AS (SELECT th0.doc_id, th0.tpos, w.v AS wv
               FROM th0 JOIN w ON w.i = ((th0.h % $dim) + $dim) % $dim),
        zs AS (SELECT doc_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(wv ORDER BY tpos)), (fa, fb) -> fa + fb) AS sw
               FROM tw GROUP BY doc_id),
        zz AS (SELECT d0.doc_id, d0.source,
               ${b.toString} + COALESCE(zs.sw, 0.0) AS z,
               CASE WHEN len(d0.tk) BETWEEN 50 AND 100000
                 THEN 1.0 ELSE 0.0 END AS label,
               ((d0.doc_id % 999983) * (2654435761 % 999983)) % 999983 % 1000 AS k
               FROM d0 LEFT JOIN zs ON zs.doc_id = d0.doc_id)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN z >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
          CAST(SUM(CASE WHEN k >= 800 THEN 1 ELSE 0 END) AS BIGINT) AS heldout_n,
          CAST(SUM(CASE WHEN k >= 800
            AND (CASE WHEN z >= 0 THEN 1.0 ELSE 0.0 END) = label
            THEN 1 ELSE 0 END) AS BIGINT) AS heldout_correct,
          round(CAST(SUM(CAST(round(z, 6) AS DECIMAL(25, 6))) AS DOUBLE)
            / COUNT(*), 4) AS mean_z
        FROM zz GROUP BY source"""
    }))

  val all: Seq[QueryDef] = Seq(qualityModel)
}
