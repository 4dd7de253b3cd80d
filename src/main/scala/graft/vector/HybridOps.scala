package graft.vector

import graft.QueryDef
import graft.functions.CosineSimilarity.cosineSim
import graft.functions.GraftFunctions.tokens
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical+dense retrieval via reciprocal-rank fusion (Cormack
  * et al. 2009, the standard zero-tuning fusion in every production
  * RAG/search stack): each query runs BOTH a BM25 ranking over the
  * documents table and an exact cosine ranking over the embeddings
  * table (doc_id and vec_id share the id space in this corpus), and
  * candidates merge by RRF(d) = Σ_lists 1/(60 + rank_list(d)) — rank
  * positions only, so the two retrievers' incomparable score scales
  * never meet.
  *
  * Scale shape: the BM25 side is the text_bm25 plan (term-filtered tf
  * before the shuffle, broadcast df + 1-row stats); the dense side is
  * the bounded-query-set broadcast scan of ann_brute_topk (at corpus
  * scale the ANN variants substitute 1:1 — same output contract). The
  * fusion itself joins two ≤ nq×50-row rank lists — driver-trivial at
  * any corpus size.
  *
  * Determinism: both rank lists use 6dp-rounded (BM25, the text_bm25
  * boundary contract) or exactly-reproducible (cosine) scores with id
  * tie-breaks; the RRF sum is two IEEE divisions added in a fixed
  * order, so the fused ordering is bit-stable across engines and the
  * oracle replays the whole pipeline statically.
  */
object HybridOps {

  private val K = 60 // the canonical RRF damping constant
  private val ListDepth = 50
  private val TopK = 10
  private val Queries = Seq((0L, "join"), (1L, "vector"), (2L, "filter"), (3L, "dup"))

  def rrfTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qmap = broadcast(Queries.toDF("q_id", "term"))
    // --- lexical list: BM25 k1=1.2 b=0.75, the text_bm25 plan ---
    val k1 = 1.2
    val b = 0.75
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val stats = d.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(Queries.map(_._2): _*))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val bmScored = tf.join(broadcast(dfq), Seq("term")).crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"),
        round(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * (k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
          .as("score"))
    val wb = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    val lexical = bmScored.withColumn("rb", row_number().over(wb))
      .filter(col("rb") <= ListDepth)
      .join(qmap, "term")
      .select(col("q_id"), col("doc_id"), col("rb"))
    // --- dense list: exact cosine top-50 (the ann_brute plan) ---
    val e = Tables(s, dir, "embeddings")
    val qv = broadcast(e.filter(col("vec_id") < Queries.length)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val denseScored = e.crossJoin(qv)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("doc_id"),
        cosineSim(col("q_emb"), col("embedding")).as("cos"))
    val wa = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("doc_id"))
    val dense = denseScored.withColumn("ra", row_number().over(wa))
      .filter(col("ra") <= ListDepth)
      .select(col("q_id"), col("doc_id"), col("ra"))
    // --- fuse: RRF over the two rank lists ---
    val fused = lexical.join(dense, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(K) + col("rb")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(K) + col("ra")), lit(0.0)), 6).as("rrf"),
        (col("rb").isNotNull.cast("int") + col("ra").isNotNull.cast("int"))
          .as("n_lists"))
    val wf = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("doc_id"), col("rrf"), col("n_lists"), col("rank"))
  }

  private val rrfOracle = s"""WITH qm(q_id, term) AS (VALUES
        ${Queries.map { case (i, t) => s"(CAST($i AS BIGINT), '$t')" }.mkString(", ")}),
      d AS (SELECT doc_id,
        len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      s AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
      tf AS (SELECT term, doc_id, dl, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        WHERE term IN (${Queries.map(q => s"'${q._2}'").mkString(",")})
        GROUP BY term, doc_id, dl),
      df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
      sc AS (SELECT tf.term, tf.doc_id,
        round(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * (tf.tf * 2.2)
          / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)), 6) AS score
        FROM tf JOIN df USING (term) CROSS JOIN s),
      r1 AS (SELECT term, doc_id,
        row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rb
        FROM sc),
      lex AS (SELECT qm.q_id, r1.doc_id, r1.rb
        FROM r1 JOIN qm ON qm.term = r1.term WHERE r1.rb <= $ListDepth),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      qv AS (SELECT vec_id AS q_id, emb AS q_emb FROM e
             WHERE vec_id < ${Queries.length}),
      ds AS (SELECT qv.q_id, e.vec_id AS doc_id,
          list_cosine_similarity(qv.q_emb, e.emb) AS cos
        FROM e, qv WHERE e.vec_id <> qv.q_id),
      r2 AS (SELECT q_id, doc_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS ra
        FROM ds),
      den AS (SELECT q_id, doc_id, ra FROM r2 WHERE ra <= $ListDepth),
      f AS (SELECT coalesce(lex.q_id, den.q_id) AS q_id,
          coalesce(lex.doc_id, den.doc_id) AS doc_id,
          round(coalesce(CAST(1 AS DOUBLE) / ($K + lex.rb), 0.0)
              + coalesce(CAST(1 AS DOUBLE) / ($K + den.ra), 0.0), 6) AS rrf,
          CAST((lex.rb IS NOT NULL) AS INT)
            + CAST((den.ra IS NOT NULL) AS INT) AS n_lists
        FROM lex FULL OUTER JOIN den
          ON lex.q_id = den.q_id AND lex.doc_id = den.doc_id),
      rk AS (SELECT q_id, doc_id, rrf, n_lists,
        CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS INT) AS rank
        FROM f)
      SELECT q_id, doc_id, rrf, n_lists, rank FROM rk WHERE rank <= $TopK"""

  val hybridRrf: QueryDef = QueryDef(
    "hybrid_rrf_topk",
    (s, dir) => rrfTopK(s, dir),
    Some(rrfOracle))

  val all: Seq[QueryDef] = Seq(hybridRrf)
}
