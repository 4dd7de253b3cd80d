package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grades SemDeDup against a brute-force within-cell recompute: the LSH
  * and capping machinery must find exactly the pairs a naive same-cell
  * cross join finds, and the drop rule must partition the corpus.
  */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 40 base vectors on distinct random directions plus planted
    * near-dups: exact copies of vec 0/1/2 and a tiny perturbation of
    * vec 3 — cos(copy) = 1, cos(perturbed) ≈ 0.9995.
    */
  private def fixture: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val dups = Seq(
      (100L, base(0)._2.clone()),
      (101L, base(1)._2.clone()),
      (102L, base(2)._2.clone()),
      (103L, base(3)._2.map(x => x + 0.001f)))
    (base ++ dups).toDF("vec_id", "embedding")
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("pairs equal the brute-force within-cell truth") {
    val c = fixture
    val pairs = SemDedup.semanticDupPairs(c, k = 8, tau = 0.95)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute truth with the SAME deterministic cell assignment
    val (assignments, _) = VectorOps.buildIvf(c, k = 8, iters = 2)
    val cells = c.join(assignments, "vec_id")
      .select("vec_id", "cell", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))
    val truth = (for {
      (i1, c1, e1) <- cells; (i2, c2, e2) <- cells
      if i1 < i2 && c1 == c2 && cosine(e1, e2) >= 0.95
    } yield (i1, i2)).toSet
    assert(truth.nonEmpty, "fixture must contain same-cell near-dups")
    assert(pairs == truth, s"pairs $pairs != truth $truth")
    // the planted exact copies must be caught (identical vectors always
    // land in the same argmax cell)
    assert(pairs.exists { case (a, b) => Set(a, b) == Set(0L, 100L) })
  }

  test("drop rule partitions the corpus: dropped ∪ kept = all, disjoint") {
    val c = fixture
    val pairs = SemDedup.semanticDupPairs(c, k = 8, tau = 0.95)
    val dropped = SemDedup.droppedIds(pairs)
      .collect().map(_.getLong(0)).toSet
    val all = c.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dropped.subsetOf(all))
    // every dropped id has a smaller-id near-dup pair; every pair's
    // larger id is dropped
    val pairSet = pairs.select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped == pairSet.map(_._2))
    // a surviving representative exists for each planted dup
    assert(!dropped.contains(0L) && dropped.contains(100L))
  }

  test("registered summary is consistent on the real table") {
    val dir = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(dir.isDefined)
    val row = SemDedup.dedupSemantic.fn(spark, dir.get).head()
    val (nVecs, nPairs, nDropped, nKept) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nVecs > 0)
    assert(nDropped <= nPairs) // each dropped id needs at least one pair
    assert(nKept == nVecs - nDropped)
  }
}
