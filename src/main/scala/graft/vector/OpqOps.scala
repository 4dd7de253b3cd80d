package graft.vector

import graft.QueryDef
import graft.functions.CosineSimilarity.cosineSim
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OPQ-style rotated product quantization (Ge et al. 2013, the
  * parametric/eigenvalue-allocation initialization; FAISS `OPQ{M}`
  * preprocessing): before PQ-encoding, vectors are rotated into the
  * PCA eigenbasis with the basis rows PERMUTED so each of the M
  * subspaces receives a balanced share of the spectrum — plain PCA
  * ordering would dump nearly all variance into subspace 0, wasting
  * 7 of 8 codebooks. Allocation is the standard greedy bucket fill:
  * components in descending-eigenvalue order each go to the
  * least-loaded (by Σ log λ) non-full bucket. For Gaussian-ish data
  * this parametric solution is within noise of the full alternating
  * OPQ optimization, and it is DETERMINISTIC — which is what lets the
  * whole pipeline (rotation + codebooks) replay as a DuckDB oracle.
  *
  * Scale shape: identical to ann_pq_topk with one extra map stage —
  * the rotation is 64 `dot_const` kernel calls per row (the PCA
  * projection plan), then encode/ADC/re-rank run unchanged. The
  * corpus never shuffles for training (PCA moments are one bounded
  * aggregation; Lloyd runs on a bounded driver sample) and the ADC
  * scan broadcasts the 10-row LUT set.
  */
object OpqOps {

  private val Dim = 64
  private val M = 8
  private val SubDim = Dim / M
  private val Rerank = 50
  private val TopK = 10
  private val NQ = 10

  /** Greedy eigenvalue allocation: component c (eigenvalues already
    * sorted descending) goes to the non-full bucket with the smallest
    * current Σ log λ, ties to the lowest bucket index. Returns the
    * rotation row order: bucket 0's components first, in assignment
    * order, then bucket 1's, … — so subspace m covers rotated dims
    * [m·SubDim, (m+1)·SubDim).
    */
  private[vector] def allocateComponents(eig: Array[Double]): Array[Int] = {
    val buckets = Array.fill(M)(List.empty[Int])
    val load = Array.fill(M)(0.0)
    // log-weights SHIFTED to ≥ 0 by the smallest log: bucket capacities
    // are equal, so the shift changes every final Σ by the same
    // constant and the balance objective is unchanged — but raw logs go
    // negative for λ < 1, where min-load greedy degenerates (the most
    // negative bucket keeps winning and packs the tail into one
    // subspace instead of spreading the head)
    val logs = eig.map(l => math.log(math.max(l, 1e-12)))
    val w = logs.map(_ - logs.min)
    for (c <- 0 until Dim) {
      val b = (0 until M).filter(buckets(_).length < SubDim).minBy(i => (load(i), i))
      buckets(b) = buckets(b) :+ c
      load(b) += w(c)
    }
    buckets.flatMap(identity)
  }

  private final case class Trained(
      rows: Array[Array[Double]], offs: Array[Double],
      codebooks: Array[Array[Array[Double]]])

  /** Session-cached rotation + codebooks: the rotation derives from
    * the (cached, deterministic) eigensystem; the codebooks are Lloyd
    * over the rotated corpus' bounded sample. fn and the oracle
    * generator must embed the SAME artifacts (QueryDef.oracleGen
    * contract), hence one cache for both.
    */
  private val trained =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Trained]]()

  private def cachedTrained(s: SparkSession, dir: String): Option[Trained] =
    graft.util.Caches.fill(trained, s.sparkContext.applicationId + ":" + dir)(PcaOps.cachedEigensystem(s, dir).map { es =>
        val order = allocateComponents(es.eig)
        val rows = order.map(es.vecs)
        val offs = rows.map(v => v.zip(es.mu).map { case (a, b) => a * b }.sum)
        val rot = PcaOps.project(Tables(s, dir, "embeddings"), rows, es.mu)
          .withColumnRenamed("pemb", "embedding")
        Trained(rows, offs, PqOps.trainCodebooks(rot))
      })

  /** OPQ ANN: rotate → PQ-encode → ADC top-`Rerank` → exact re-rank on
    * RAW vectors → recall@10 vs the full-dimension brute truth.
    */
  def opqTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cachedTrained(s, dir) match {
      case None =>
        Seq.empty[(Long, Long)].toDF("q_id", "n_hits_in_brute_top10")
      case Some(t) =>
        val es = PcaOps.cachedEigensystem(s, dir).get
        val c = Tables(s, dir, "embeddings")
        val rot = PcaOps.project(c, t.rows, es.mu)
          .withColumnRenamed("pemb", "embedding")
        val codes = PqOps.encode(rot, t.codebooks)
        val q = rot.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val luts = PqOps.queryLuts(q, t.codebooks)
        val scored = codes.crossJoin(broadcast(luts.select(col("q_id"), col("lut"))))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            graft.functions.AdcScore.adcScore(col("lut"), col("codes")).as("adc"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("vec_id"))
        val cand = scored.withColumn("r", row_number().over(w))
          .filter(col("r") <= Rerank).select(col("q_id"), col("vec_id"))
        val qraw = c.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val exact = c.join(broadcast(cand), "vec_id")
          .join(broadcast(qraw), "q_id")
          .select(col("q_id"), col("vec_id"),
            cosineSim(col("q_emb"), col("embedding")).as("cos"))
        val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
        val approx = exact.withColumn("rank", row_number().over(w2))
          .filter(col("rank") <= TopK).select(col("q_id"), col("vec_id"))
        VectorOps.recallVsBrute(approx, VectorOps.bruteTopK(s, dir),
          c.filter(col("vec_id") < NQ).select(col("vec_id").as("q_id")))
    }
  }

  /** Replay: permuted-eigenbasis rotation rows + V·μ offsets as
    * literals (the ann_pca_topk projection pattern, float-rounded like
    * the kernel), then the standard PQ replay chain reading the
    * rotated CTE, exact re-rank against RAW vectors, recall tail.
    */
  val annOpq: QueryDef = QueryDef(
    "ann_opq_topk",
    (s, dir) => opqTopK(s, dir),
    oracleGen = Some((s, dir) => {
      val t = cachedTrained(s, dir).getOrElse(
        throw new IllegalStateException("no OPQ artifacts (needs >= 2 rows)"))
      val pvRows = t.rows.zip(t.offs).zipWithIndex.map { case ((v, o), c) =>
        s"(${c + 1}, [${v.map(_.toString).mkString(", ")}], ${o.toString})"
      }.mkString(",\n          ")
      s"""WITH pv(c, vrow, off) AS (VALUES
          $pvRows),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      rot AS (SELECT e.vec_id,
          list(CAST(CAST(list_dot_product(e.emb, pv.vrow) - pv.off AS REAL) AS DOUBLE)
               ORDER BY pv.c) AS emb
        FROM e, pv GROUP BY e.vec_id),
      ${PqOps.pqReplayCtes(t.codebooks, cellRestrict = false, encSrc = "rot")},${VectorOps.recallTailSql}"""
    }))

  val all: Seq[QueryDef] = Seq(annOpq)
}
