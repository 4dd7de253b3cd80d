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
  def semanticDupPairs(c: DataFrame, k: Int = 32, tau: Double = 0.95,
                       cellCap: Int = 512): DataFrame = {
    val (assignments, _) = VectorOps.buildIvf(c, k, iters = 2)
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
    })

  val all: Seq[QueryDef] = Seq(dedupSemantic)
}
