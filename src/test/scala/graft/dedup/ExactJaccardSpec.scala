package graft.dedup

import graft.util.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact string-shingle Jaccard path is the graded truth (DuckDB
  * oracle); this spec ties the MinHash LSH path to it: every LSH pair is
  * exact-verified (precision 1 by construction), and banding recall
  * against the exact pair set clears a floor — the same
  * grade-the-approximation-against-the-truth pattern as AnnRecallSpec.
  */
class ExactJaccardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  test("minhash LSH pairs ⊆ exact pairs, with recall above the banding floor") {
    assume(sf.isDefined)
    val docs = Tables(spark, sf.get, "documents")
    val exact = Dedup.jaccardExactPairs(docs)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(exact.nonEmpty)
    val lsh = Dedup.minHashDedup(Dedup.wordShingles(docs, 5),
      perms = 64, rowsPerBand = 4, threshold = 0.5)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1: the LSH path exact-verifies candidates, so any pair it
    // emits must be in the exact set (modulo the exact path's stop-shingle
    // cap, inert on this corpus)
    assert((lsh -- exact).isEmpty, s"LSH emitted non-dup pairs: ${lsh -- exact}")
    // recall: corpus near-dups sit at jaccard ≥ 0.9 where 16-band/4-row
    // collision probability is ≥ 1-(1-0.9^4)^16 ≈ 0.998
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall collapsed: $recall (${lsh.size}/${exact.size})")
  }

  test("exact jaccard on a hand-built corpus: values and cluster summary") {
    import spark.implicits._
    val a = (1 to 30).map("w" + _).mkString(" ")         // 26 distinct 5-shingles
    val b = (1 to 29).map("w" + _).mkString(" ") + " zz" // differs in last token
    val c = (100 to 130).map("v" + _).mkString(" ")      // disjoint
    val docs = Seq((1L, a), (2L, a), (3L, b), (4L, c))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.jaccardExactPairs(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    // docs 1 and 3: 25 shared of 26+26 distinct shingles → 25/27
    assert(math.abs(pairs((1L, 3L)) - 25.0 / 27) < 1e-9)
    assert(!pairs.contains((1L, 4L)))
    // CC over the pairs: {1,2,3} one cluster, 4 not in any pair
    val labels = Dedup.connectedComponents(
      Dedup.jaccardExactPairs(docs).select(col("id1"), col("id2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == Set(1L, 2L, 3L))
    assert(labels.values.toSet.size == 1)
  }
}
