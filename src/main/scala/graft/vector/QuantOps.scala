package graft.vector

import graft.QueryDef
import graft.functions.CosineSimilarity.cosineSim
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) and binary (1-bit) vector quantization ANN — the two
  * compression points below product quantization on the accuracy/size
  * curve. SQ8 stores 64 bytes/vector (4× smaller than float32) and
  * scores with exact integer-valued arithmetic; binary quantization
  * stores 8 bytes/vector (32×) and scores with two XOR+popcount ops —
  * at 100 TB the BQ sketch of a 10-billion-vector corpus is ~80 GB,
  * small enough to broadcast-scan on every executor, which is why
  * sign-bit prefiltering is the standard first stage of large-scale
  * retrieval stacks.
  *
  * Both are TRAINING-FREE (unlike IVF/PQ/OPQ): SQ8's only corpus
  * statistic is the global abs-max, computed in-plan as a 1-row
  * aggregate broadcast onto the scan (the text_bm25 stats shape), so
  * both queries carry fully STATIC DuckDB oracles — the driver replays
  * the entire pipeline including the scale derivation, no embedded
  * trained literals needed.
  *
  * Determinism: quantized codes are small integers, so every dot/norm
  * accumulates EXACTLY in double regardless of summation order (the
  * KMeans/PCA integer-quantization recipe); the one float→double cast
  * and the final divide are bit-identical across engines (the proven
  * ann_brute cosine pattern). Sign bits and Hamming distances are
  * exact integers outright.
  *
  * Scale shape (both): quantize = pure map stage over one corpus scan;
  * candidate scoring broadcasts the ≤10-row query-code set (the corpus
  * never shuffles); only ≤ nq × rerank candidate ids fetch raw vectors
  * for the exact re-rank — identical to the PQ/IVF probe economics.
  */
object QuantOps {

  private val Rerank = 50
  private val TopK = 10
  private val NQ = 10

  /** Symmetric int8 quantization: code_i = clamp(round(x_i/s·127), ±127)
    * with one global scale s = max|x| over the corpus. `s` arrives as a
    * column (the 1-row broadcast stats aggregate), so the whole encode
    * is in-plan — no driver collect, no cached artifact.
    */
  private def sq8Codes(v: Column, s: Column): Column = {
    val safe = when(s.isNull || s === 0.0, lit(1.0)).otherwise(s)
    transform(v, x =>
      least(lit(127L), greatest(lit(-127L),
        floor(x.cast("double") / safe * 127.0 + 0.5))))
      .cast("array<float>")
  }

  /** int8 scalar-quantization ANN: encode corpus + queries, rank by
    * cosine over the integer-valued code vectors, exact-rescore the top
    * `Rerank` candidates on raw floats, grade recall@10 vs brute force.
    */
  def sq8TopK(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "embeddings")
    // global abs-max: exact (float max is order-independent), 1 row
    val stats = c.agg(
      max(array_max(transform(col("embedding"), x => abs(x)))).cast("double").as("s"))
    val coded = c.crossJoin(broadcast(stats))
      .select(col("vec_id"), col("embedding"),
        sq8Codes(col("embedding"), col("s")).as("codes"))
    val q = coded.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("codes").as("qcodes"))
    val scored = coded.crossJoin(broadcast(q.select(col("q_id"), col("qcodes"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineSim(col("qcodes"), col("codes")).as("acos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("acos").desc, col("vec_id"))
    val cand = scored.withColumn("r", row_number().over(w))
      .filter(col("r") <= Rerank).select(col("q_id"), col("vec_id"))
    val exact = c.join(broadcast(cand), "vec_id")
      .join(broadcast(q.select(col("q_id"), col("q_emb"))), "q_id")
      .select(col("q_id"), col("vec_id"),
        cosineSim(col("q_emb"), col("embedding")).as("cos"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val approx = exact.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= TopK).select(col("q_id"), col("vec_id"))
    VectorOps.recallVsBrute(approx, VectorOps.bruteTopK(s, dir),
      Tables(s, dir, "embeddings").filter(col("vec_id") < NQ)
        .select(col("vec_id").as("q_id")))
  }

  /** The replay: scale from the same in-SQL aggregate, encode with the
    * identical clamp(floor(x/s·127 + 0.5)) arithmetic, integer-exact
    * cosine ranking (the CASE mirrors cosineSim's zero-norm → 0.0
    * contract — DuckDB's list_cosine_similarity returns −1 there),
    * exact re-rank, recall tail.
    */
  private val sq8Oracle = s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      st AS (SELECT CASE WHEN s IS NULL OR s = 0 THEN 1.0 ELSE s END AS s FROM
        (SELECT MAX(list_max(list_transform(emb, x -> abs(x)))) AS s FROM e)),
      qc AS (SELECT vec_id, emb,
          CAST(list_transform(emb, x -> least(127, greatest(-127,
            CAST(floor(x / st.s * 127 + 0.5) AS BIGINT)))) AS DOUBLE[]) AS codes
        FROM e, st),
      qq AS (SELECT vec_id AS q_id, codes AS qcodes FROM qc WHERE vec_id < 10),
      scored AS (SELECT qq.q_id, c.vec_id,
          CASE WHEN list_dot_product(c.codes, c.codes) = 0
                 OR list_dot_product(qq.qcodes, qq.qcodes) = 0 THEN 0.0
               ELSE list_cosine_similarity(qq.qcodes, c.codes) END AS acos
        FROM qc c, qq WHERE c.vec_id <> qq.q_id),
      rr AS (SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY acos DESC, vec_id) AS r
          FROM scored) WHERE r <= $Rerank),
      cand AS (SELECT rr.q_id, rr.vec_id,
          list_cosine_similarity(eq.emb, ec.emb) AS cos
        FROM rr JOIN e eq ON eq.vec_id = rr.q_id
                JOIN e ec ON ec.vec_id = rr.vec_id),
      ranked AS (SELECT q_id, vec_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
        FROM cand),${VectorOps.recallTailSql}"""

  val annSq8: QueryDef = QueryDef(
    "ann_sq8_topk",
    (s, dir) => sq8TopK(s, dir),
    Some(sq8Oracle))

  /** Sign-bit packing into two 32-bit halves (two BIGINT columns).
    * Two halves, not one 64-bit word, because a checked `1 << 63`
    * overflows signed-long shift semantics on the replay side; the
    * Hamming distance is the sum of two popcounts either way.
    * transform/aggregate are interpreted-lambda expressions, but this
    * runs once per corpus row at encode time — the hot path (the
    * XOR+popcount scan below) is pure codegen'd builtins.
    */
  private def signBits(half: Int): Column = {
    val (lo, hi, off) = if (half == 0) (0, 32, 0) else (32, 64, 32)
    expr(s"""aggregate(
        transform(embedding, (x, i) ->
          IF(i >= $lo AND i < $hi AND x > CAST(0 AS FLOAT),
             shiftleft(CAST(1 AS BIGINT), i - $off), CAST(0 AS BIGINT))),
        CAST(0 AS BIGINT), (a, b) -> a | b)""")
  }

  /** Binary-quantization ANN: 1 bit per dimension (x_i > 0), Hamming
    * distance = popcount(xor) over the two packed words, top `Rerank`
    * by (hamming asc, vec_id), exact cosine re-rank, recall@10 grade.
    * For random-hyperplane-ish embeddings the sign sketch preserves
    * angular order well enough to be the standard billion-scale
    * prefilter; the recall row quantifies exactly what 32× compression
    * costs on this corpus.
    */
  def bqTopK(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "embeddings")
    val coded = c.select(col("vec_id"), col("embedding"),
      signBits(0).as("lo"), signBits(1).as("hi"))
    val q = coded.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("lo").as("qlo"), col("hi").as("qhi"))
    val scored = coded.crossJoin(broadcast(q.select(col("q_id"), col("qlo"), col("qhi"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (expr("bit_count(lo ^ qlo)") + expr("bit_count(hi ^ qhi)")).as("ham"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("ham").asc, col("vec_id"))
    val cand = scored.withColumn("r", row_number().over(w))
      .filter(col("r") <= Rerank).select(col("q_id"), col("vec_id"))
    val exact = c.join(broadcast(cand), "vec_id")
      .join(broadcast(q.select(col("q_id"), col("q_emb"))), "q_id")
      .select(col("q_id"), col("vec_id"),
        cosineSim(col("q_emb"), col("embedding")).as("cos"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val approx = exact.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= TopK).select(col("q_id"), col("vec_id"))
    VectorOps.recallVsBrute(approx, VectorOps.bruteTopK(s, dir),
      Tables(s, dir, "embeddings").filter(col("vec_id") < NQ)
        .select(col("vec_id").as("q_id")))
  }

  /** Static replay: the same two-word packing via a dims table +
    * bit_or (1-based list positions), xor+bit_count Hamming, identical
    * tie-breaks, exact re-rank, recall tail.
    */
  private val bqOracle = s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      dims AS (SELECT unnest(generate_series(1, 64)) AS i),
      b AS (SELECT vec_id,
          bit_or(CASE WHEN i <= 32 AND emb[i] > 0
                 THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END) AS lo,
          bit_or(CASE WHEN i > 32 AND emb[i] > 0
                 THEN CAST(1 AS BIGINT) << (i - 33) ELSE 0 END) AS hi
        FROM e, dims WHERE i <= len(emb) GROUP BY vec_id),
      qb AS (SELECT vec_id AS q_id, lo AS qlo, hi AS qhi FROM b WHERE vec_id < 10),
      scored AS (SELECT qb.q_id, c.vec_id,
          CAST(bit_count(xor(c.lo, qb.qlo)) AS INT)
            + CAST(bit_count(xor(c.hi, qb.qhi)) AS INT) AS ham
        FROM b c, qb WHERE c.vec_id <> qb.q_id),
      rr AS (SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY ham ASC, vec_id) AS r
          FROM scored) WHERE r <= $Rerank),
      cand AS (SELECT rr.q_id, rr.vec_id,
          list_cosine_similarity(eq.emb, ec.emb) AS cos
        FROM rr JOIN e eq ON eq.vec_id = rr.q_id
                JOIN e ec ON ec.vec_id = rr.vec_id),
      ranked AS (SELECT q_id, vec_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
        FROM cand),${VectorOps.recallTailSql}"""

  val annBq: QueryDef = QueryDef(
    "ann_bq_topk",
    (s, dir) => bqTopK(s, dir),
    Some(bqOracle))

  val all: Seq[QueryDef] = Seq(annSq8, annBq)
}
