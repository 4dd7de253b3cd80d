package graft.vector

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The ann_lsh_topk / ann_ivf_topk registered queries emit recall@10
  * against the brute-force truth (one row per query). Both sides are
  * deterministic (fixed-seed hyperplanes, deterministic k-means seeds),
  * so the recall values are stable build-to-build; these floors turn the
  * driver's rows-only check into a real graded signal — a wrong-distance
  * bug collapses recall to ~0, it does not produce plausible rows.
  */
class AnnRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sfDir: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  private def totalHits(name: String, dir: String): (Long, Long) = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val rows = df.collect()
    (rows.map(_.getLong(1)).sum, rows.length.toLong)
  }

  test("LSH multi-probe recall@10 clears its floor on every query set") {
    assume(sfDir.isDefined)
    val (hits, nq) = totalHits("ann_lsh_topk", sfDir.get)
    assert(nq == 10, s"expected one recall row per query, got $nq")
    // 8-plane multi-probe: empirically ~6-8/10 at these SFs; floor at 40%
    assert(hits >= 40, s"LSH total recall collapsed: $hits/100")
  }

  test("IVF nprobe=2 recall@10 clears its floor on every query set") {
    assume(sfDir.isDefined)
    val (hits, nq) = totalHits("ann_ivf_topk", sfDir.get)
    assert(nq == 10, s"expected one recall row per query, got $nq")
    // 2-of-10 cells probed: empirically ~7-9/10; floor at 50%
    assert(hits >= 50, s"IVF total recall collapsed: $hits/100")
  }

  test("PQ ADC + exact re-rank recall@10 clears its floor on every query set") {
    assume(sfDir.isDefined)
    val (hits, nq) = totalHits("ann_pq_topk", sfDir.get)
    assert(nq == 10, s"expected one recall row per query, got $nq")
    // 8×4-bit codes, rerank=50: empirically 75/74/52 at sf0.001/0.01/0.1
    // (the fixed rerank budget is a shrinking corpus fraction); floor 40%
    assert(hits >= 40, s"PQ total recall collapsed: $hits/100")
  }

  test("OPQ rotated-PQ recall@10 clears its floor") {
    assume(sfDir.isDefined)
    val (hits, nq) = totalHits("ann_opq_topk", sfDir.get)
    assert(nq == 10, s"expected one recall row per query, got $nq")
    // measured 74/70/51 at sf0.001/0.01/0.1 — within noise of flat PQ
    // on this near-isotropic synthetic corpus; floor 40% like PQ
    assert(hits >= 40, s"OPQ total recall collapsed: $hits/100")
  }

  test("OPQ eigenvalue allocation is a balanced permutation") {
    // descending spectrum with a heavy head — the case plain PCA
    // ordering gets wrong (all variance in subspace 0)
    val eig = Array.tabulate(64)(i => math.pow(0.8, i) + 1e-6)
    val order = OpqOps.allocateComponents(eig)
    assert(order.sorted.sameElements(0 until 64), "not a permutation")
    // each 8-dim subspace must receive exactly one of the top-8
    // components (greedy Σlog-λ balancing spreads the head)
    val top8Buckets = (0 until 8).map(c => order.indexOf(c) / 8)
    assert(top8Buckets.toSet.size == 8,
      s"top-8 components not spread across subspaces: $top8Buckets")
  }

  test("SQ8 int8 + exact re-rank recall@10 clears its floor") {
    assume(sfDir.isDefined)
    val (hits, nq) = totalHits("ann_sq8_topk", sfDir.get)
    assert(nq == 10, s"expected one recall row per query, got $nq")
    // int8 with rerank=50 is near-lossless: measured 100/100/100 at
    // sf0.001/0.01/0.1; floor 90%
    assert(hits >= 90, s"SQ8 total recall collapsed: $hits/100")
  }

  test("binary-quantization recall@10 clears its floor") {
    assume(sfDir.isDefined)
    val (hits, nq) = totalHits("ann_bq_topk", sfDir.get)
    assert(nq == 10, s"expected one recall row per query, got $nq")
    // 64 sign bits, rerank=50: measured 61/66/36 at sf0.001/0.01/0.1
    // (fixed rerank budget is a shrinking corpus fraction); floor 40%
    // at the spec's sf0.001
    assert(hits >= 40, s"BQ total recall collapsed: $hits/100")
  }

  test("IVF-PQ recall@10 clears its floor on every query set") {
    assume(sfDir.isDefined)
    val (hits, nq) = totalHits("ann_ivfpq_topk", sfDir.get)
    assert(nq == 10, s"expected one recall row per query, got $nq")
    // nprobe=4 of 10 cells + ADC + rerank=50: empirically 80/82/55 at
    // sf0.001/0.01/0.1; floor 40%
    assert(hits >= 40, s"IVF-PQ total recall collapsed: $hits/100")
  }

  test("residual IVFADC recall@10 clears its floor and beats-or-ties plain IVF-PQ's floor") {
    assume(sfDir.isDefined)
    val (hits, nq) = totalHits("ann_ivfadc_topk", sfDir.get)
    assert(nq == 10, s"expected one recall row per query, got $nq")
    // residual codes spend their 4 bits on within-cell geometry — the
    // whole point of by-residual encoding; same probe/rerank budget as
    // ann_ivfpq_topk, same 40% floor
    assert(hits >= 40, s"IVFADC total recall collapsed: $hits/100")
  }

  test("PQ codes are 4-bit and deterministic across encode calls") {
    assume(sfDir.isDefined)
    val c = graft.util.Tables(spark, sfDir.get, "embeddings")
    val cb = PqOps.trainCodebooks(c)
    val a = PqOps.encode(c, cb).collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = PqOps.encode(c, PqOps.trainCodebooks(c)).collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b, "same corpus must encode to identical codes")
    assert(a.nonEmpty && a.values.forall(cs => cs.length == 8 && cs.forall(j => j >= 0 && j < 16)))
    // codes must actually spread across centroids (a collapsed codebook
    // would still be deterministic): every subspace uses >1 code
    (0 until 8).foreach { m =>
      assert(a.values.map(_(m)).toSet.size > 1, s"subspace $m collapsed to one code")
    }
  }

  test("brute-force top-k matches its own contract: 10 ranked rows per query") {
    assume(sfDir.isDefined)
    val rows = VectorOps.bruteTopK(spark, sfDir.get).collect()
    assert(rows.length == 100)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 10))
    byQ.values.foreach { rs =>
      val ranked = rs.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to 10))
      // ranks descend in rounded cos (raw-ordering ties may round equal)
      assert(ranked.sliding(2).forall(p => p(0).getDouble(2) >= p(1).getDouble(2)))
    }
  }
}
