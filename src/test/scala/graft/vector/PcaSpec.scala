package graft.vector

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** PCA invariants: Jacobi correctness on a known matrix, plus the
  * registered query's self-grading columns on real data (the booleans
  * the rows-only correctness check rides on).
  */
class PcaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8, 2]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("jacobi recovers a known eigensystem") {
    // diag(5, 2, 1) rotated by a known 3D rotation must come back as
    // eigenvalues (5, 2, 1) with orthonormal vectors
    val d = Array(5.0, 2.0, 1.0)
    val theta = 0.6
    val r = Array(
      Array(math.cos(theta), -math.sin(theta), 0.0),
      Array(math.sin(theta), math.cos(theta), 0.0),
      Array(0.0, 0.0, 1.0))
    val m = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(k => r(i)(k) * d(k) * r(j)(k)).sum
    }
    val (eig, vecs) = PcaOps.jacobiEigen(m)
    assert(eig.zip(Seq(5.0, 2.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until 3).map(k => vecs(a)(k) * vecs(b)(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
    // eigenvector check: M·v = λ·v
    for (c <- 0 until 3; i <- 0 until 3) {
      val mv = (0 until 3).map(k => m(i)(k) * vecs(c)(k)).sum
      assert(math.abs(mv - eig(c) * vecs(c)(i)) < 1e-9)
    }
  }

  test("jacobi converges on exactly-equal diagonal blocks (theta = 0)") {
    // [[2,1],[1,2]] needs a 45° rotation where theta = 0 exactly —
    // a signum(0)-based tangent silently skips it and returns (2, 2)
    val (eig, vecs) = PcaOps.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(eig(0) - 3.0) < 1e-12 && math.abs(eig(1) - 1.0) < 1e-12)
    for (c <- 0 until 2; i <- 0 until 2) {
      val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
      val mv = (0 until 2).map(k => m(i)(k) * vecs(c)(k)).sum
      assert(math.abs(mv - eig(c) * vecs(c)(i)) < 1e-12)
    }
  }

  test("moment accumulation rejects wrong-dimension embeddings") {
    import spark.implicits._
    val bad = Seq((1L, Array.fill(32)(0.5f)), (2L, Array.fill(32)(0.25f)))
      .toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      PcaOps.momentsOf(bad).collect()
    }
    assert(e.getMessage.contains("64-dim") ||
      Option(e.getCause).exists(_.getMessage.contains("64-dim")))
  }

  test("registered pca query self-grades green on real embeddings") {
    assume(new java.io.File(sf).exists())
    val rows = PcaOps.embeddingPca.fn(spark, sf).collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getBoolean(3)), "orthonormal_ok false")
    assert(rows.forall(_.getBoolean(4)), "nonincreasing_ok false")
    assert(rows.forall(_.getBoolean(5)), "trace_ok false")
    assert(rows.forall(_.getDouble(1) >= 0.0), "negative eigenvalue")
  }

  test("pca-reduced ANN keeps a meaningful recall floor") {
    assume(new java.io.File(sf).exists())
    val rows = PcaOps.annPcaTopK.fn(spark, sf).collect()
    assert(rows.length == 10) // every query emits a row, even at 0 hits
    val total = rows.map(_.getLong(1)).sum
    // 32/64 dims on near-isotropic embeddings measured ~0.45-0.5 mean
    // recall@10; 0.2 is the collapse detector, not the expectation
    assert(total >= 20, s"recall collapsed: $total/100 hits")
  }

  test("covariance moments are symmetric-complete and exact-count") {
    assume(new java.io.File(sf).exists())
    val rows = PcaOps.embeddingCovariance.fn(spark, sf).collect()
    assert(rows.length == 64 * 65 / 2) // full upper triangle
    val n = rows.head.getLong(3)
    assert(rows.forall(_.getLong(3) == n)) // every pair saw every row
  }
}
