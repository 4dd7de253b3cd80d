package graft.vector

import graft.QueryDef
import graft.functions.CentroidL2
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-means centroid training over the embeddings table — the clustering
  * primitive behind semantic dedup (SemDeDup), D4-style diversity
  * pruning, and topic-balanced sampling in training-data pipelines.
  *
  * Spark shape (the canonical broadcast-Lloyd iteration): per round, the
  * assignment is a PURE MAP STAGE — centroids are driver-side constants
  * compiled into one native kernel call ([[graft.functions.CentroidL2]],
  * same JIT-loop pattern as the IVF cell assigner) — followed by ONE
  * shuffle of (cluster, dim) partial sums (k×dim keys, map-side combine)
  * and a k×dim-bounded driver collect to rebuild the constant table.
  * The corpus is never collected, never joined, never re-shuffled
  * whole: at 100 TB each Lloyd round is a scan + a 512-key aggregate.
  *
  * Cross-engine determinism (what makes this ORACLE-checkable where
  * float k-means is not): embeddings quantize to integer-valued floats
  * (floor(x·1e6) — float32 holds integers < 2^24 exactly), distances
  * over integer-valued doubles below 2^53 are EXACT integer arithmetic
  * in IEEE double (no rounding, no summation-order sensitivity), means
  * use truncating integer division (Spark `div` ≡ DuckDB `//` ≡ Scala
  * `/` on Long), and argmin ties break to the lowest centroid id. The
  * DuckDB oracle replays the identical iteration in a recursive CTE.
  */
object KMeansOps {

  private val K = 8
  private val Iters = 2
  private val Dim = 64
  private val PrunePerCluster = 25

  /** floor(x·1e6) per element, kept as float for the native kernel
    * (integer-valued and < 2^24, so the float representation is exact).
    */
  private val quantize: Column =
    expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS FLOAT))")

  private def lloyd(emb: DataFrame, init: Seq[Array[Double]]): Seq[Array[Double]] = {
    var centroids = init
    for (_ <- 1 to Iters) {
      // (cid, dim) → (sum, count): one narrow shuffle, 512 keys
      val stats = emb
        .select(CentroidL2.nearest(col("qv"), centroids).as("cid"),
          posexplode(col("qv")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d"))
        .agg(sum(col("x").cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, cid) =>
        if (!stats.contains((cid.toLong, 0))) old // empty cluster keeps its centroid
        else Array.tabulate(Dim) { d =>
          val (s, n) = stats((cid.toLong, d))
          (s / n).toDouble // Long division truncates toward zero, like DuckDB //
        }
      }
    }
    centroids
  }

  /** Quantized corpus with its trained assignment (vec_id, cid, d2) and
    * the trained centroid table; None on an empty embeddings table.
    */
  private def trainedAssignments(s: SparkSession, dir: String)
      : Option[(DataFrame, Seq[Array[Double]])] = {
    val emb = Tables(s, dir, "embeddings")
      .select(col("vec_id"), quantize.as("qv"))
    // init: the K lowest vec_ids' vectors, cid = position in that order
    val init: Seq[Array[Double]] = emb.orderBy(col("vec_id")).limit(K)
      .select(col("qv")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq
    if (init.isEmpty) None
    else {
      val centroids = lloyd(emb, init)
      Some((emb.select(col("vec_id"),
        CentroidL2.nearest(col("qv"), centroids).as("cid"),
        CentroidL2.minDist(col("qv"), centroids).as("d2")), centroids))
    }
  }

  /** Shared oracle prefix: quantization, Lloyd recursion, and the final
    * assignment — both registered queries select from `assign`/`fin`.
    * DuckDB 1.0 lambdas cannot capture correlated outer columns, so the
    * per-(vector, centroid) distance is a plain dims-join aggregate,
    * and argmin-with-tie-to-lowest-cid is MIN over the packed key
    * d2*16 + cid (exact: d2 < 2^45 at these magnitudes, cid < 16).
    */
  private val kmeansCtes: String = s"""WITH RECURSIVE
      q AS (SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        FROM embeddings),
      dims AS (SELECT unnest(generate_series(1, $Dim)) AS d),
      init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
          qv AS cvec
        FROM (SELECT * FROM q ORDER BY vec_id LIMIT $K)),
      cents(iter, cid, cvec) AS (
        SELECT 0, cid, cvec FROM init
        UNION ALL
        SELECT p.iter + 1, p.cid,
          coalesce(
            (SELECT list(CAST(sd // cnt AS BIGINT) ORDER BY dd)
             FROM (SELECT g2.d AS dd, SUM(m2.qv[g2.d]) AS sd, COUNT(DISTINCT m2.vec_id) AS cnt
                   FROM q m2, dims g2,
                     (SELECT dd2.vec_id,
                        CAST(MIN(dd2.d2 * 16 + dd2.cid) % 16 AS BIGINT) AS cid
                      FROM (SELECT m.vec_id, c2.cid,
                              CAST(SUM((m.qv[g.d] - c2.cvec[g.d])
                                     * (m.qv[g.d] - c2.cvec[g.d])) AS BIGINT) AS d2
                            FROM q m, cents c2, dims g
                            GROUP BY m.vec_id, c2.cid) dd2
                      GROUP BY dd2.vec_id) asn
                   WHERE m2.vec_id = asn.vec_id AND asn.cid = p.cid
                   GROUP BY g2.d)),
            p.cvec)
        FROM cents p WHERE p.iter < $Iters),
      fin AS (SELECT cid, cvec FROM cents WHERE iter = $Iters),
      fdist AS (SELECT m.vec_id, f.cid,
          CAST(SUM((m.qv[g.d] - f.cvec[g.d]) * (m.qv[g.d] - f.cvec[g.d])) AS BIGINT) AS d2
        FROM q m, fin f, dims g
        GROUP BY m.vec_id, f.cid),
      assign AS (SELECT vec_id,
          CAST(MIN(d2 * 16 + cid) % 16 AS BIGINT) AS cid,
          MIN(d2 * 16 + cid) // 16 AS d2
        FROM fdist GROUP BY vec_id)"""

  val embeddingKmeans: QueryDef = QueryDef(
    "embedding_kmeans",
    (s, dir) => trainedAssignments(s, dir) match {
      case None =>
        // empty table: emit the empty frame with the right shape
        Tables(s, dir, "embeddings")
          .select(lit(0L).as("cid"), lit(0L).as("n_members"),
            lit(0L).as("inertia"), lit(0L).as("c0")).limit(0)
      case Some((asn, centroids)) =>
        asn.groupBy(col("cid"))
          .agg(count(lit(1)).as("n_members"), sum(col("d2")).as("inertia"))
          .withColumn("c0",
            // fingerprint of the trained centroid itself, not just sizes
            element_at(
              map(centroids.zipWithIndex.flatMap { case (c, i) =>
                Seq(lit(i.toLong), lit(c(0).toLong))
              }: _*),
              col("cid")))
    },
    Some(s"""$kmeansCtes
      SELECT a.cid, COUNT(*) AS n_members,
        CAST(SUM(a.d2) AS BIGINT) AS inertia,
        (SELECT CAST(f.cvec[1] AS BIGINT) FROM fin f WHERE f.cid = a.cid) AS c0
      FROM assign a GROUP BY a.cid"""))

  /** Cluster-based diversity pruning (the D4/prototype-selection shape):
    * keep the P vectors closest to their trained centroid per cluster —
    * the per-cluster representatives a pruned training mix retains.
    * Spark: the trained assignment (a map stage) flows into ONE top-P
    * per key window, partitioned on the cluster id; at scale the
    * standard top-K-per-key mitigation applies (pre-filter by a
    * per-partition P-th distance bound before the final window) — with
    * k clusters the window's key space is k, which is why P, not the
    * corpus, bounds the output.
    */
  val clusterPrune: QueryDef = QueryDef(
    "curation_cluster_prune",
    (s, dir) => trainedAssignments(s, dir) match {
      case None =>
        Tables(s, dir, "embeddings")
          .select(lit(0L).as("vec_id"), lit(0L).as("cid"),
            lit(0L).as("d2"), lit(0L).as("rnk")).limit(0)
      case Some((asn, _)) =>
        val w = Window.partitionBy(col("cid")).orderBy(col("d2"), col("vec_id"))
        asn.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= PrunePerCluster)
          .select(col("vec_id"), col("cid"), col("d2"), col("rnk"))
    },
    Some(s"""$kmeansCtes
      SELECT vec_id, cid, d2, rnk FROM (
        SELECT vec_id, cid, d2,
          CAST(row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) AS BIGINT) AS rnk
        FROM assign)
      WHERE rnk <= $PrunePerCluster"""))

  val all: Seq[QueryDef] = Seq(embeddingKmeans, clusterPrune)
}
