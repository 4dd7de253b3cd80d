package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage of the registered queries at sf0.001 (the DuckDB oracle
  * at sf0.01 is the authoritative value check — tools/check_oracle.py).
  */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle name has a query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("ann_brute_topk exact ranks are deterministic") {
    val a = SparkEntry.queries("ann_brute_topk")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("ann_brute_topk")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("IVF recall against brute force is reasonable") {
    // the REGISTERED ann_ivf_topk emits recall rows (see AnnRecallSpec);
    // this checks the underlying raw top-k path directly
    val brute = SparkEntry.queries("ann_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.vector.VectorOps.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@10 too low: $recall") // 2-of-10 cells probed
  }

  test("minhash dedup finds the corpus near-dups and brute-force agrees") {
    import graft.dedup.Dedup
    val docs = graft.util.Tables(spark, sf, "documents")
    val sh = Dedup.wordShingles(docs, 5)
    val pairs = Dedup.minHashDedup(sh, 64, 4, 0.8).collect()
    // exact (hash-identical) duplicates must all be found by LSH
    val exact = docs.groupBy("text").count().filter("count > 1")
    assert(pairs.nonEmpty || exact.count() == 0)
  }
}
