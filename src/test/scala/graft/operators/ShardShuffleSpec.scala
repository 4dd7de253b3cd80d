package graft.operators

import graft.util.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The query half of curation_shard_shuffle is oracle-graded; this spec
  * covers the writer: deterministic re-runs, all shards materialized and
  * roughly balanced, and the within-shard order actually laid down in
  * the files (read back without a sort).
  */
class ShardShuffleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  test("shards are complete, balanced, deterministic, and internally mixed") {
    assume(sf.isDefined)
    val docs = Tables(spark, sf.get, "documents")
    val n = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Curation.writeShuffledShards(docs, s"$dir/a", nShards = 8)
    val back = spark.read.parquet(s"$dir/a")
    assert(back.count() == n, "shuffle must be a permutation: no loss, no dup")
    val sizes = back.groupBy(col("shard")).count()
      .collect().map(r => r.getAs[Int]("shard") -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until 8).toSet, s"missing shards: $sizes")
    assert(sizes.values.max <= 3 * sizes.values.min,
      s"hash sharding should balance: $sizes")

    // determinism: a second run assigns every doc to the same shard
    Curation.writeShuffledShards(docs, s"$dir/b", nShards = 8)
    val a = back.select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = spark.read.parquet(s"$dir/b").select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)

    // the file order within a shard is the mix order, not doc_id order:
    // read one shard's rows in file order and check they're shuffled
    // w.r.t. doc_id but sorted by the mix key
    val key = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L % 1000003L),
      lit(1000003L))
    val shard0 = spark.read.parquet(s"$dir/a/shard=0")
      .select(col("doc_id"), key.as("k")).collect()
    assume(shard0.length > 2)
    val ks = shard0.map(_.getLong(1)).toSeq
    assert(ks == ks.sorted, "rows within a shard must be laid down in mix-key order")
    val ids = shard0.map(_.getLong(0)).toSeq
    assert(ids != ids.sorted, "mix order should not degenerate to doc_id order")
  }
}
