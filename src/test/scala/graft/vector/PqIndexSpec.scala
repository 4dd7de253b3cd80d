package graft.vector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF-PQ index (PqOps.savePqIndex / annPqIndexed): layout,
  * determinism vs the build-and-query path, and the two statically
  * pruned scans the 100 TB contract needs (codes for ADC, vectors for
  * the refine).
  */
class PqIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("persisted PQ index round-trips, prunes both scans, matches build-and-query") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val corpus = spark.read.parquet(s"${sf.get}/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    PqOps.savePqIndex(corpus, dir, k = 10, iters = 2)
    val idx = PqOps.loadPqIndex(spark, dir)
    assert(idx.centroids.count() == 10)
    assert(idx.vectors.count() == corpus.count())
    assert(idx.codes.count() == corpus.count())
    // code lists share the cell-partitioned inverted-list layout
    val codesRel = graft.util.ManifestCommit.current(
      spark.sessionState.newHadoopConf(), dir).table("codes").head
    assert(new java.io.File(s"$dir/$codesRel").listFiles()
      .exists(_.getName.startsWith("cell=")))
    // codebooks round-trip: M×Ks entries, none left at the zero default
    assert(idx.codebooks.length == 8 && idx.codebooks.forall(_.length == 16))
    assert(idx.codebooks.flatten.exists(_.exists(_ != 0.0)))

    // deterministic build → the indexed probe reproduces the
    // build-and-query IVF-PQ path exactly (same k, iters, nprobe)
    val direct = PqOps.ivfPqTopK(spark, sf.get)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val indexed = PqOps.annPqIndexed(queries, idx)
    val loaded = indexed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(loaded == direct)
    assert(loaded.nonEmpty)

    // BOTH index scans must carry a static, non-empty cell partition
    // filter: the ADC scan over codes/ and the refine scan over
    // vectors/ each read only probed-cell files
    val planStr = indexed.queryExecution.executedPlan.toString
    val partFilters = """PartitionFilters: \[([^\]]*)\]""".r
      .findAllMatchIn(planStr).map(_.group(1)).toSeq
    val cellFiltered = partFilters.count(f => f.contains("cell") && f.trim.nonEmpty)
    assert(cellFiltered >= 2,
      s"expected both codes and vectors scans cell-pruned, got $cellFiltered in:\n$planStr")
  }

  test("PQ encode is a pure map stage: zero shuffles in its plan") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val corpus = spark.read.parquet(s"${sf.get}/embeddings.parquet")
    val codes = PqOps.encode(corpus, PqOps.trainCodebooks(corpus))
    val exchanges = codes.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"encode plan shuffles:\n${codes.queryExecution.executedPlan}")
    assert(codes.count() == corpus.count())
  }
}
