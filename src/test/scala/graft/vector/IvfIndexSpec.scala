package graft.vector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("persisted IVF index round-trips and matches build-and-query results") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val corpus = spark.read.parquet(s"${sf.get}/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    VectorOps.saveIvfIndex(corpus, dir, k = 10, iters = 2)
    val idx = VectorOps.loadIvfIndex(spark, dir)
    assert(idx.centroids.count() == 10)
    assert(idx.assignments.count() == corpus.count())

    // index built deterministically → loading it must reproduce the
    // build-and-query path exactly
    val (assignments, centroids) = VectorOps.buildIvf(corpus, k = 10, iters = 2)
    val direct = VectorOps.ivfProbe(corpus, queries, assignments, centroids)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val loaded = VectorOps.annIvfIndexed(corpus, queries, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(loaded == direct)
    assert(loaded.nonEmpty)
  }
}
