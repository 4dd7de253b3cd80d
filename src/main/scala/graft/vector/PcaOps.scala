package graft.vector

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embeddings table — the whitening /
  * dimensionality-reduction stage an embedding pipeline runs before ANN
  * indexing or semantic clustering (PCA-rotated vectors are also what
  * OPQ-style product quantizers consume).
  *
  * Spark shape (the only one that survives 100 TB): the corpus
  * contributes exactly ONE aggregation pass — the d×(d+1)/2 upper
  * triangle of the second-moment matrix Σ x·xᵀ plus the element sums
  * Σ x — with map-side partial aggregation collapsing every partition
  * to ≤ 2 080 keys before the shuffle, so shuffle volume is
  * O(partitions × d²), independent of corpus size. Everything
  * afterwards — covariance assembly, Jacobi eigendecomposition,
  * component selection — is driver-side O(d³) on a 64×64 matrix, the
  * same bounded-collect pattern as the k-means codebooks. The corpus is
  * never collected and never re-shuffled.
  *
  * Cross-engine determinism (same recipe as KMeansOps): embeddings
  * quantize to integer-valued longs (floor(x·QScale)), so moment
  * products (< 2^48) and their sums (< 2^61 at any realistic SF) are
  * EXACT integer arithmetic — no summation-order sensitivity, which is
  * what lets `embedding_covariance` carry a full DuckDB replay oracle.
  * The float work (centering, Jacobi) happens only on the driver over
  * those exact integers, so it is deterministic under any partitioning;
  * `embedding_pca` self-grades it in-query (orthonormality, eigenvalue
  * ordering, trace preservation, per-component variance match) and
  * PcaSpec asserts the same invariants standalone.
  */
object PcaOps {

  private val Dim = 64
  private val K = 8

  /** Upper-triangle second moments: (i, j, Σ qv[i]·qv[j]). One
    * mapPartitions pass accumulates the 2 080-long upper triangle in a
    * primitive loop — a syrk-style rank-1 update per vector — and emits
    * ONE array per partition; the driver folds ≤ #partitions 16 KB
    * accumulators. The obvious explode→groupBy formulation fans every
    * vector into 2 080 generated rows (2 000× row amplification through
    * codegen before the partial agg collapses it); measured 6× slower
    * at 200 k vectors and 14× at 1 M (tools.PcaAB — 6.45 s vs 0.45 s),
    * the gap widening with corpus size because the explode pays
    * per-generated-row machinery where the kernel pays one
    * multiply-add — the PqKernels lesson. Exactness is
    * unchanged: quantized products are integers, long addition is
    * associative, so any partitioning yields identical sums. Works over
    * any (vec_id, embedding) DataFrame — the `pca` CLI arm feeds
    * arbitrary embeddings parquet through the same code.
    */
  private val NPairs = Dim * (Dim + 1) / 2

  /** Quantization scale. 1e4 (not 1e6) bounds the exact-sum headroom:
    * a pair sum is ≤ n·(max|q|)², so with |x| ≤ 1 (q ≤ 1e4) the Long
    * accumulator is exact to n ≈ 9.2e10 rows — genuinely 100-TB-scale —
    * where 1e6 wrapped silently at ~10⁷. The 1e-4 element precision is
    * far below embedding noise; the driver fold guards the bound
    * explicitly from the measured max|q| and fails loudly instead of
    * wrapping.
    */
  private val QScale = 10000

  /** QScale² — the factor between quantized-unit and original-unit
    * variances (for callers reporting eigenvalues, e.g. the pca CLI).
    */
  val qScaleSq: Double = QScale.toDouble * QScale

  /** One corpus pass accumulating the pair products, the element sums,
    * the row count, and max|q| for the overflow guard. None on empty.
    */
  private def accumulate(emb: DataFrame)
      : Option[(Array[Long], Array[Long], Long)] = {
    val s = emb.sparkSession
    import s.implicits._
    val partials = emb.select(col("embedding")).as[Array[Float]]
      .mapPartitions { it =>
        val acc = new Array[Long](NPairs)
        val sums = new Array[Long](Dim)
        val q = new Array[Long](Dim)
        var n = 0L
        var maxq = 0L
        while (it.hasNext) {
          val v = it.next()
          if (v.length != Dim) throw new IllegalArgumentException(
            s"pca expects $Dim-dim embeddings, got ${v.length}")
          var i = 0
          while (i < Dim) {
            q(i) = math.floor(v(i).toDouble * QScale).toLong
            sums(i) += q(i)
            if (math.abs(q(i)) > maxq) maxq = math.abs(q(i))
            i += 1
          }
          var idx = 0
          i = 0
          while (i < Dim) {
            val qi = q(i)
            var j = i
            while (j < Dim) { acc(idx) += qi * q(j); idx += 1; j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator.single((acc, sums, n, maxq))
      }.collect()
    if (partials.isEmpty) None
    else {
      val tp = new Array[Long](NPairs)
      val ts = new Array[Long](Dim)
      var n = 0L
      var maxq = 0L
      partials.foreach { case (acc, sums, pn, pm) =>
        var k = 0
        while (k < NPairs) { tp(k) += acc(k); k += 1 }
        k = 0
        while (k < Dim) { ts(k) += sums(k); k += 1 }
        n += pn
        maxq = math.max(maxq, pm)
      }
      // exactness guard: every pair sum is ≤ n·maxq² in magnitude; fail
      // loudly (with the remedy) instead of wrapping silently. The
      // bound check itself is in double so it cannot overflow either.
      require(n.toDouble * maxq.toDouble * maxq.toDouble < 4.5e18,
        s"pca moment sums would overflow Long at n=$n, max|q|=$maxq " +
          "(normalize the embeddings or lower QScale)")
      Some((tp, ts, n))
    }
  }

  private def pairIdx(i: Int, j: Int): Int = i * Dim - i * (i - 1) / 2 + (j - i)

  def momentsOf(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    accumulate(emb) match {
      case None => Seq.empty[(Int, Int, Long, Long)].toDF("i", "j", "s_ij", "n")
      case Some((tp, _, n)) =>
        val rows = for (i <- 0 until Dim; j <- i until Dim)
          yield (i, j, tp(pairIdx(i, j)), n)
        rows.toDF("i", "j", "s_ij", "n")
    }
  }

  private def momentsDf(s: SparkSession, dir: String): DataFrame =
    momentsOf(Tables(s, dir, "embeddings"))

  /** Driver-side eigensystem of the covariance: eigenvalues desc (in
    * QUANTIZED units), eigenvector rows, mean in ORIGINAL units, row
    * count, and the covariance trace (for the Σλ = tr(C) preservation
    * check — computed from the ORIGINAL matrix, not from the
    * decomposition it grades).
    */
  final case class EigenResult(eig: Array[Double], vecs: Array[Array[Double]],
                               mu: Array[Double], n: Long, trace: Double)

  /** Session cache for the registered queries' eigensystem: the moment
    * accumulation is exact-integer (deterministic under any
    * partitioning) and Jacobi is a fixed driver-side iteration, so the
    * cache is a speed + fn/oracle-consistency convenience, not a
    * correctness requirement.
    */
  private val trainedEigen =
    new java.util.concurrent.ConcurrentHashMap[String, Option[EigenResult]]()

  private[vector] def cachedEigensystem(s: SparkSession, dir: String): Option[EigenResult] =
    graft.util.Caches.fill(trainedEigen, s.sparkContext.applicationId + ":" + dir)(eigensystem(Tables(s, dir, "embeddings")))

  /** None below 2 rows. Bounded end to end: 2 080-row collect +
    * 64-row collect + O(d³) Jacobi.
    */
  def eigensystem(emb: DataFrame): Option[EigenResult] = {
    accumulate(emb) match {
      case Some((tp, ts, n)) if n >= 2 =>
        val cov = Array.tabulate(Dim, Dim) { (i, j) =>
          val sij = tp(pairIdx(math.min(i, j), math.max(i, j))).toDouble
          (sij - ts(i).toDouble * ts(j).toDouble / n) / (n - 1.0)
        }
        val (eig, vecs) = jacobiEigen(cov)
        Some(EigenResult(eig, vecs,
          Array.tabulate(Dim)(i => ts(i).toDouble / n / QScale), n,
          (0 until Dim).map(i => cov(i)(i)).sum))
      case _ => None
    }
  }

  /** Centered projection onto `vecs` rows: z_c = V_c·x − V_c·μ, one
    * `matvec_const` kernel call — a pure map stage whose constants
    * (eigenvectors, offsets) ship like the LSH plane table. Previously
    * one `dot_const` per component inside an `array(...)`; at 64 rows
    * that unrolled to a >8000-byte un-JIT-able generated method
    * (CodegenAuditSpec), so the whole rotation is now a single kernel
    * with identical per-component arithmetic.
    */
  def project(emb: DataFrame, vecs: Array[Array[Double]],
              mu: Array[Double]): DataFrame = {
    import graft.functions.MatVecConst.matVec
    val offsets = vecs.map(v => v.zip(mu).map { case (a, b) => a * b }.sum)
    emb.select(col("vec_id"), matVec(col("embedding"), vecs, offsets).as("pemb"))
  }

  /** Registered query: the exact integer moment matrix — the one part
    * of PCA that touches the corpus, hash-checked against a DuckDB
    * replay of the identical quantization and pair products.
    */
  val embeddingCovariance: QueryDef = QueryDef(
    "embedding_covariance",
    (s, dir) => momentsDf(s, dir),
    Some("""WITH q AS (
        SELECT list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
        FROM embeddings),
      a AS (SELECT qv, unnest(generate_series(1, 64)) AS i1 FROM q),
      b AS (SELECT qv, i1, unnest(generate_series(i1, 64)) AS j1 FROM a)
      SELECT CAST(i1 - 1 AS INT) AS i, CAST(j1 - 1 AS INT) AS j,
             CAST(SUM(qv[i1] * qv[j1]) AS BIGINT) AS s_ij, COUNT(*) AS n
      FROM b GROUP BY i1, j1"""))

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix:
    * returns (eigenvalues, eigenvectors as rows), both sorted by
    * descending eigenvalue. Deterministic: fixed sweep order, fixed
    * convergence threshold, no randomness. O(d³) per sweep on a
    * 64×64 driver-side matrix — microseconds next to any corpus scan.
    */
  private[vector] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // convergence is RELATIVE to the matrix scale: quantized-unit
    // covariances have entries ~1e8+, where an absolute 1e-12 cutoff
    // would never fire and every call would burn all 64 sweeps
    val scaleRef = math.max(1e-300,
      (0 until d).map(i => math.abs(m(i)(i))).max)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14 * scaleRef) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18 * scaleRef) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // NOT math.signum: signum(0) = 0 would null the rotation
            // for exactly-equal diagonal pairs (theta = 0 wants a 45°
            // rotation, t = 1) and the block would never converge
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(d)(i => a(i)(i))
    val order = eig.indices.sortBy(i => -eig(i))
    (order.map(eig).toArray, order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray)
  }

  /** Full PCA with in-query self-grading: collects the bounded moment
    * rows, assembles the covariance C = (S − s·sᵀ/n)/(n−1) from EXACT
    * integers (deterministic under any partitioning), runs Jacobi, and
    * emits one row per top-K component carrying the checks a reviewer
    * would otherwise run by hand. Rows-only by design — the
    * eigendecomposition is driver-side float iteration no SQL engine
    * replays — but every distributed input to it is the hash-checked
    * `embedding_covariance` aggregate.
    */
  /** Eigenvector rows as SQL VALUES (0-based component index c; 1-based
    * list positions inside).
    */
  private def eigvecValuesSql(vecs: Array[Array[Double]]): String =
    vecs.zipWithIndex.map { case (v, c) =>
      s"($c, [${v.map(_.toString).mkString(", ")}])"
    }.mkString(",\n          ")

  val embeddingPca: QueryDef = QueryDef(
    "embedding_pca",
    (s, dir) => {
      import s.implicits._
      cachedEigensystem(s, dir) match {
        case None =>
          // empty-input contract: schema stable, zero rows
          Seq.empty[(Int, Double, Double, Boolean, Boolean, Boolean)]
            .toDF("component", "eigval", "var_explained_pct",
              "orthonormal_ok", "nonincreasing_ok", "trace_ok")
        case Some(EigenResult(eig, vecs, _, _, trace)) =>
          val traceOk = math.abs(eig.sum - trace) <= 1e-6 * math.abs(trace)
          // orthonormality: max |V·Vᵀ − I| over the top-K rows
          val orthoErr = (0 until K).flatMap { a =>
            (0 until K).map { b =>
              val dot = (0 until Dim).map(k => vecs(a)(k) * vecs(b)(k)).sum
              math.abs(dot - (if (a == b) 1.0 else 0.0))
            }
          }.max
          val totalVar = eig.sum
          // report eigenvalues in ORIGINAL embedding units: quantization
          // scaled every x by QScale, so variances carry a QScale² factor
          val out = (0 until K).map { c =>
            (c, math.rint(eig(c) / qScaleSq * 1e6) / 1e6,
              math.rint(eig(c) / totalVar * 1e6) / 1e4,
              orthoErr < 1e-9,
              c == 0 || eig(c) <= eig(c - 1) + 1e-9,
              traceOk)
          }
          out.toDF("component", "eigval", "var_explained_pct",
            "orthonormal_ok", "nonincreasing_ok", "trace_ok")
      }
    },
    // NON-circular replay: the trained eigenvector BASIS is embedded as
    // literals, but every eigenVALUE the oracle emits is the Rayleigh
    // quotient vᵀCv against the covariance REBUILT FROM THE DATA (the
    // exact-integer moment replay) — if Jacobi had not converged, vᵀCv
    // would disagree with the diagonal value Spark reports and the row
    // hash would go red. Orthonormality checks the literals;
    // trace/total-variance come from the data side.
    oracleGen = Some((s, dir) => {
      val es = cachedEigensystem(s, dir).getOrElse(
        throw new IllegalStateException("no eigensystem (needs >= 2 rows)"))
      s"""WITH pv(c, vrow) AS (VALUES
          ${eigvecValuesSql(es.vecs)}),
      q AS (SELECT vec_id, list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
            FROM embeddings),
      dims AS (SELECT unnest(generate_series(1, 64)) AS i),
      nn AS (SELECT COUNT(*) AS n FROM q),
      mom AS (SELECT d1.i AS i, d2.i AS j, CAST(SUM(q.qv[d1.i] * q.qv[d2.i]) AS BIGINT) AS sij
              FROM q, dims d1, dims d2 WHERE d2.i >= d1.i GROUP BY d1.i, d2.i),
      esum AS (SELECT d.i, CAST(SUM(q.qv[d.i]) AS BIGINT) AS si
               FROM q, dims d GROUP BY d.i),
      cov AS (SELECT m.i, m.j,
          (CAST(m.sij AS DOUBLE) - CAST(sa.si AS DOUBLE) * CAST(sb.si AS DOUBLE) / nn.n)
            / (nn.n - 1.0) AS cv
        FROM mom m JOIN esum sa ON sa.i = m.i JOIN esum sb ON sb.i = m.j, nn),
      covf AS (SELECT i, j, cv FROM cov
               UNION ALL SELECT j, i, cv FROM cov WHERE i <> j),
      ray AS (SELECT pv.c, SUM(pv.vrow[cf.i] * cf.cv * pv.vrow[cf.j]) AS lam
              FROM pv, covf cf GROUP BY pv.c),
      tot AS (SELECT SUM(lam) AS totalvar FROM ray),
      tr AS (SELECT SUM(cv) AS trace FROM cov WHERE i = j),
      ortho AS (SELECT MAX(ABS(list_dot_product(a.vrow, b.vrow)
                  - CASE WHEN a.c = b.c THEN 1.0 ELSE 0.0 END)) AS oerr
                FROM pv a, pv b WHERE a.c < 8 AND b.c < 8),
      tchk AS (SELECT ABS(tot.totalvar - tr.trace) <= 0.000001 * ABS(tr.trace) AS ok
               FROM tot, tr)
      SELECT CAST(r.c AS INT) AS component,
        round_even(r.lam / 100000000.0 * 1000000.0, 0) / 1000000.0 AS eigval,
        round_even(r.lam / tot.totalvar * 1000000.0, 0) / 10000.0 AS var_explained_pct,
        ortho.oerr < 0.000000001 AS orthonormal_ok,
        (r.c = 0 OR r.lam <= rp.lam + 0.000000001) AS nonincreasing_ok,
        tchk.ok AS trace_ok
      FROM ray r LEFT JOIN ray rp ON rp.c = r.c - 1, tot, ortho, tchk
      WHERE r.c < 8"""
    }))

  /** ANN in PCA-reduced space: center + project every embedding onto
    * the top 32 components (one `dot_const` kernel call per component
    * — a pure map stage, the eigenvector table is a driver constant
    * like the LSH planes), brute-force cosine top-10 in the 32-dim
    * space, and grade recall against the full-dimension exact top-10.
    * This is the PQ/OPQ preprocessing step exposed as its own
    * operator: at 100 TB the projection halves every downstream
    * distance computation's bandwidth while the recall row quantifies
    * exactly what the reduction costs. Rows-only (driver-side
    * eigensystem), self-graded like the LSH/IVF family; PcaSpec
    * asserts the recall floor.
    */
  val annPcaTopK: QueryDef = QueryDef(
    "ann_pca_topk",
    (s, dir) => {
      import s.implicits._
      cachedEigensystem(s, dir) match {
        case None =>
          Seq.empty[(Long, Long)].toDF("q_id", "n_hits_in_brute_top10")
        case Some(es) =>
          import graft.functions.CosineSimilarity.cosineSim
          val proj = project(Tables(s, dir, "embeddings"), es.vecs.take(32), es.mu)
          val q = broadcast(proj.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("pemb").as("q_emb")))
          val scored = proj.crossJoin(q)
            .filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id"),
              cosineSim(col("q_emb"), col("pemb")).as("cos"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
          val approx = scored.withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 10)
            .select(col("q_id"), col("vec_id"))
          VectorOps.recallVsBrute(approx, VectorOps.bruteTopK(s, dir),
            proj.filter(col("vec_id") < 10).select(col("vec_id").as("q_id")))
      }
    },
    // replay: top-32 eigenvector rows + their V·μ offsets as literals,
    // projection with the kernel's exact float semantics (double dot,
    // double subtract, round to REAL), cosine top-10 in reduced space,
    // recall graded against the full-dimension brute truth
    oracleGen = Some((s, dir) => {
      val es = cachedEigensystem(s, dir).getOrElse(
        throw new IllegalStateException("no eigensystem (needs >= 2 rows)"))
      val vecs = es.vecs.take(32)
      val offs = vecs.map(v => v.zip(es.mu).map { case (a, b) => a * b }.sum)
      val pvRows = vecs.zip(offs).zipWithIndex.map { case ((v, o), c) =>
        s"(${c + 1}, [${v.map(_.toString).mkString(", ")}], ${o.toString})"
      }.mkString(",\n          ")
      s"""WITH pv(c, vrow, off) AS (VALUES
          $pvRows),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      proj AS (SELECT e.vec_id,
          list(CAST(CAST(list_dot_product(e.emb, pv.vrow) - pv.off AS REAL) AS DOUBLE)
               ORDER BY pv.c) AS pemb
        FROM e, pv GROUP BY e.vec_id),
      qp AS (SELECT vec_id AS q_id, pemb AS q_emb FROM proj WHERE vec_id < 10),
      cand AS (SELECT qp.q_id, p.vec_id,
          list_cosine_similarity(qp.q_emb, p.pemb) AS cos
        FROM proj p, qp WHERE p.vec_id <> qp.q_id),
      ranked AS (SELECT q_id, vec_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
        FROM cand),${VectorOps.recallTailSql}"""
    }))

  val all: Seq[QueryDef] = Seq(embeddingCovariance, embeddingPca, annPcaTopK)
}
