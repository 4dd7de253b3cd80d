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
      .select(col("doc_id"), col("source"),
        tokens(col("text")).as("toks"))
      .withColumn("label",
        size(col("toks")).between(50, 100000).cast("int").cast("double"))

  /** Registered query: distill the rule on the 80% split, serve the
    * native scorer over the full corpus, report per-source score mass
    * plus held-out accuracy-at-0.5 — the number a pipeline operator
    * watches before trusting a learned filter. Rows-only (a trained
    * model has no ANSI-SQL oracle); TextClassifierSpec grades held-out
    * AUC against the rule and pins native-vs-MLlib scoring parity.
    */
  val qualityModel: QueryDef = QueryDef(
    "quality_model_score",
    (s, dir) => {
      val data = ruleLabeled(s, dir)
      val (w, b) = train(data)
      score(Tables(s, dir, "documents"), w, b)
        .join(data.select(col("doc_id"), col("label")), "doc_id")
        .select(col("source"), col("label"), col("score"), splitKey.as("k"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("score")), 4).as("mean_score"),
          round(avg(when(col("k") >= 800,
            when((col("score") >= 0.5).cast("double") === col("label"), 1.0)
              .otherwise(0.0))), 4).as("heldout_acc"))
    },
    None)

  val all: Seq[QueryDef] = Seq(qualityModel)
}
