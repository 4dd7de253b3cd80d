package graft.dedup

import graft.functions.GraftFunctions._
import graft.util.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ties the banded SimHash path to its brute-force truth. 4×16-bit
  * banding is lossless for Hamming ≤ 3 by pigeonhole, and the bucket cap
  * is behavior-neutral on the test corpora — so the banded pair set must
  * EQUAL the all-pairs truth exactly, not just clear a floor. The brute
  * force runs driver-side over the collected signatures (8 bytes/doc;
  * fine at test scale, never registered as a query).
  */
class SimHashTruthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  test("banded simhash pairs equal the brute-force Hamming<=3 truth") {
    assume(sf.isDefined)
    val docs = Tables(spark, sf.get, "documents")
    // same signature family the pipeline uses (FNV token hashes — the
    // SQL-replayable stack); the truth is about BANDING losslessness,
    // so it must share the pipeline's signatures
    val sigs = docs.select(col("doc_id"),
        graft.functions.FnvHashes.fnvSimHashSig(col("text")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= 3
    } yield {
      val (a, b) = (sigs(i)._1, sigs(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    val banded = Dedup.simHashPairs(docs).select(col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} " +
        s"missing=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)}")
  }

  test("the graded row's over-cap accounting is zero on the test corpus") {
    assume(sf.isDefined)
    val row = graft.SparkEntry.queries("dedup_simhash")(spark, sf.get).head()
    assert(row.getAs[Long]("n_overcap_buckets") == 0L)
    assert(row.getAs[Long]("n_overcap_docs") == 0L)
  }
}
