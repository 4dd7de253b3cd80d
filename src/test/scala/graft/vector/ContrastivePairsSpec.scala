package graft.vector

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic check for contrastive-pair mining on a hand-computable
  * fixture: orthogonal-ish unit vectors where the hardest positive and
  * hardest negative per anchor are known by construction.
  */
class ContrastivePairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hard positive is least-similar same-label, hard negative most-similar cross-label") {
    import spark.implicits._
    // label 0: v0 (anchor), v1 close to v0, v2 far from v0 (hard positive)
    // label 1: v3 nearly parallel to v0 (hard negative), v4 orthogonal
    def pad(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(64 - xs.size)(0.0)).map(_.toFloat).toArray
    val rows = Seq(
      (0L, pad(1.0, 0.0), 0),
      (1L, pad(0.9, 0.1), 0),           // cos ~ .994
      (2L, pad(0.1, 0.9), 0),           // cos ~ .110 -> hard positive
      (3L, pad(0.95, 0.05), 1),         // cos ~ .999 -> hard negative
      (4L, pad(0.0, 1.0), 1))           // cos 0
    val dir = java.nio.file.Files.createTempDirectory("cpairs").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.contrastivePairs(spark, dir, nAnchors = 1).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("hard_positive") == 2L, s"got $out")
    assert(out("hard_negative") == 3L, s"got $out")
  }

  test("one row per (anchor, role) on the real table") {
    val out = VectorOps.contrastivePairs(spark, "/root/testdata/sf0.001").collect()
    val roles = out.groupBy(r => (r.getLong(0), r.getString(1)))
    assert(roles.values.forall(_.length == 1))
    assert(out.map(_.getLong(0)).distinct.length == 20)
    // every cos is a valid rounded cosine
    assert(out.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }
}
