package graft.vector

import graft.QueryDef
import graft.functions.CosineSimilarity.cosineSim
import graft.util.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, public recipe): semantic deduplication
  * by k-means clustering of embeddings, then pairwise cosine only WITHIN
  * each cluster — the trick that makes embedding-level dedup tractable at
  * corpus scale (the paper runs it on LAION/C4). Near-dup pairs never
  * cross clusters, so the quadratic term is bounded by the largest
  * cluster, not the corpus.
  *
  * Scale shape: clustering is the shared distributed k-means
  * (VectorOps.buildIvf — Lloyd on a bounded sample, one assignment pass);
  * the within-cell self-join is keyed on the cell id and capped by the
  * same groupBy-based bucket split the LSH dedup paths use (a degenerate
  * cell emits an O(cell) spanning star instead of going quadratic, and
  * never sorts through one task). The keep-rule is the paper's: within a
  * cell, drop every vector that has a near-duplicate (cos ≥ τ) with a
  * smaller id — one survivor per duplicate chain, deterministic.
  */
object SemDedup {

  /** Within-cell near-dup pairs (id1 < id2, cos ≥ tau) over k-means
    * cells. Deterministic: fixed k-means seeds (buildIvf), exact cosine
    * on every emitted pair.
    */
  /** Session-cached k=32 clustering centroids — the query fn and its
    * oracle generator must share one training run (VectorOps rationale).
    */
  private val trainedCentroids =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Seq[Double])]]()

  private def cachedSemCentroids(c: DataFrame, k: Int): Seq[(Long, Seq[Double])] =
    graft.util.Caches.fill(trainedCentroids, c.sparkSession.sparkContext.applicationId + ":" + k + ":" +
        c.queryExecution.analyzed.semanticHash()) {
        val (_, centroidsDf) = VectorOps.buildIvf(c, k, iters = 2)
        centroidsDf.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      }

  def semanticDupPairs(c: DataFrame, k: Int = 32, tau: Double = 0.95,
                       cellCap: Int = 512): DataFrame = {
    val cents = cachedSemCentroids(c, k)
    val assignments =
      if (cents.isEmpty) c.select(col("vec_id"), lit(0L).as("cell")).limit(0)
      else VectorOps.assignCells(c, cents).select(col("vec_id"), col("cell"))
    val v = c.join(assignments, "vec_id")
      .select(col("vec_id"), col("embedding"), col("cell"))
    val (small, overCap) = graft.dedup.Dedup.bucketCapSplit(
      v, Seq("cell"), cellCap, "vec_id", Seq("embedding"))
    val a = small.select(col("cell"), col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = small.select(col("cell"), col("vec_id").as("id2"), col("embedding").as("e2"))
    val full = a.join(b, "cell")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosineSim(col("e1"), col("e2")).as("cos"))
    val star = overCap
      .filter(col("vec_id") =!= col("anchor.vec_id"))
      .select(col("anchor.vec_id").as("id1"), col("vec_id").as("id2"),
        cosineSim(col("anchor.embedding"), col("embedding")).as("cos"))
    full.union(star).filter(col("cos") >= tau)
  }

  /** The dedup decision: ids dropped = any vector with a smaller-id
    * near-dup in its cell (distinct id2 of the pair set).
    */
  def droppedIds(pairs: DataFrame): DataFrame =
    pairs.select(col("id2").as("vec_id")).distinct()

  /** Registered summary: corpus size, pairs found, dropped/kept counts,
    * mean pair cosine — deterministic regardless of which pairs collide.
    * Rows-only (k-means bucketing isn't ANSI SQL); SemDedupSpec grades
    * the pair set and the dropped set against a brute-force within-cell
    * recompute and checks the dropped/kept partition.
    */
  val dedupSemantic: QueryDef = QueryDef(
    "dedup_semantic",
    (s, dir) => {
      val c = Tables(s, dir, "embeddings")
      // ONE aggregation pass over the pair stream: n_dropped is
      // count_distinct(id2) inside the same agg, so the within-cell
      // join (the expensive part) is evaluated once, not once per
      // summary branch
      val stats = semanticDupPairs(c).agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("id2")).as("n_dropped"),
        coalesce(round(avg(col("cos")), 4), lit(0.0)).as("avg_cos"))
      c.agg(count(lit(1)).as("n_vecs")).crossJoin(stats)
        .select(col("n_vecs"), col("n_pairs"), col("n_dropped"),
          (col("n_vecs") - col("n_dropped")).as("n_kept"), col("avg_cos"))
    },
    // full replay: this session's k=32 centroids as literals (raw +
    // norm-scaled), argmax-dot assignment with ties to the lowest cell,
    // the 512-cap split with min-id star, exact cosine ≥ 0.95 gate,
    // and the summary aggregates
    oracleGen = Some((s, dir) => {
      val cents = cachedSemCentroids(Tables(s, dir, "embeddings"), 32)
      require(cents.nonEmpty, "no centroids to embed (empty corpus)")
      val scaled = VectorOps.scaledOf(cents).map { case (c0, a) => (c0, a.toSeq) }
      s"""WITH sc(cell, svec) AS (VALUES
          ${VectorOps.vecValuesSql(scaled)}),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      asn AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, sc.cell,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.emb, sc.svec) DESC, sc.cell) AS rn
          FROM e, sc) WHERE rn = 1),
      cellc AS (SELECT cell, COUNT(*) AS bw, MIN(vec_id) AS aid
                FROM asn GROUP BY cell),
      vsmall AS (SELECT a.vec_id, a.cell FROM asn a
                 JOIN cellc USING (cell) WHERE cellc.bw <= 512),
      vbig AS (SELECT a.vec_id, a.cell, cellc.aid FROM asn a
               JOIN cellc USING (cell) WHERE cellc.bw > 512),
      fullp AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
          list_cosine_similarity(ea.emb, eb.emb) AS cos
        FROM vsmall a JOIN vsmall b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id),
      starp AS (SELECT g.aid AS id1, g.vec_id AS id2,
          list_cosine_similarity(ea.emb, eb.emb) AS cos
        FROM vbig g JOIN e ea ON ea.vec_id = g.aid
                    JOIN e eb ON eb.vec_id = g.vec_id
        WHERE g.vec_id <> g.aid),
      p2 AS (SELECT * FROM (SELECT * FROM fullp UNION ALL SELECT * FROM starp)
             WHERE cos >= 0.95)
      SELECT nv.n_vecs, st.n_pairs, st.n_dropped,
             nv.n_vecs - st.n_dropped AS n_kept, st.avg_cos
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings) nv
      CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(COUNT(DISTINCT id2) AS BIGINT) AS n_dropped,
          coalesce(round(AVG(cos), 4), 0.0) AS avg_cos FROM p2) st"""
    }))

  val all: Seq[QueryDef] = Seq(dedupSemantic)
}
