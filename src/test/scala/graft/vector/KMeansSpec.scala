package graft.vector

import graft.functions.CentroidL2
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Kernel semantics + end-to-end shape for the quantized k-means
  * operator (the registered query is oracle-checked at every SF against
  * a recursive-CTE Lloyd replay; these pin the kernel edge rules the
  * oracle's data may not exercise).
  */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def arr(xs: Float*) = new GenericArrayData(xs.toArray)

  test("nearestL2 picks min squared distance, ties to the lowest index") {
    val cb = Array[Double](0, 0, 10, 0, 0, 10) // three 2d centroids
    assert(CentroidL2.nearestL2(arr(1f, 1f), cb, 3, 2) == 0L)
    assert(CentroidL2.nearestL2(arr(9f, 0f), cb, 3, 2) == 1L)
    // (5, 0) is equidistant to centroids 0 and 1 → lowest index wins
    assert(CentroidL2.nearestL2(arr(5f, 0f), cb, 3, 2) == 0L)
    // empty centroid table → -1, not an exception
    assert(CentroidL2.nearestL2(arr(1f, 1f), Array.empty[Double], 0, 2) == -1L)
  }

  test("minDistL2 is exact integer arithmetic at quantized magnitudes") {
    // worst-case magnitude: |q| = 300000 over 64 dims — every square and
    // partial sum must stay an exactly-represented integer in double
    val v = Array.fill(64)(300000f)
    val c = Array.fill(64)(-300000.0)
    val d = CentroidL2.minDistL2(new GenericArrayData(v), c, 1, 64)
    assert(d == 64L * 600000L * 600000L)
  }

  test("embedding_kmeans: full partition of the corpus, deterministic") {
    val q = graft.SparkEntry.queries("embedding_kmeans")
    val dir = "/root/testdata/sf0.001"
    val a = q(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val b = q(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "two runs must be bit-identical")
    assert(a.map(_._2).sum == 500L, "every vector is assigned exactly once")
    assert(a.forall(_._3 >= 0L), "inertia is non-negative")
  }

  test("empty embeddings table yields an empty, well-typed result") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmeans_empty").toString
    Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("embedding_kmeans")(spark, dir)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("cid", "n_members", "inertia", "c0"))
  }
}
