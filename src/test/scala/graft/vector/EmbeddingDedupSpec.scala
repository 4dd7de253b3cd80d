package graft.vector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grades the LSH-bucketed embedding near-dup path against the
  * brute-force exact cos ≥ 0.99 pair set (computable at test SF):
  * precision is 1 by construction (candidates are exact-verified), and
  * bucket-collision recall clears a floor — 16 hyperplanes agree on a
  * θ ≤ 2.6° pair (cos ≥ 0.999, where real dups live) with p ≈ 0.87^…
  * per plane, so misses happen but must stay bounded.
  */
class EmbeddingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  test("LSH near-dup pairs: precision 1 and recall floor vs brute force") {
    assume(sf.isDefined)
    val c = spark.read.parquet(s"${sf.get}/embeddings.parquet")
    val a = c.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = c.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val exact = a.crossJoin(b).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        graft.functions.CosineSimilarity.cosineSim(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") >= 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorOps.embeddingNearDupPairs(c)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1: every emitted pair is exact-verified cos ≥ 0.99
    assert((lsh -- exact).isEmpty, s"non-dup pairs emitted: ${lsh -- exact}")
    if (exact.nonEmpty) {
      val recall = (lsh & exact).size.toDouble / exact.size
      assert(recall >= 0.5,
        s"bucket-collision recall collapsed: $recall (${lsh.size}/${exact.size})")
    } else assert(lsh.isEmpty)
  }
}
