package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SeqPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  test("packing a known fixture is exact: doc_id order, next-fit boundaries, offsets") {
    import spark.implicits._
    // token counts 300, 300, 100, 500, 90 at maxLen 512; ids 1-5 share
    // bucket 0 (doc_id >> 6), so they pack as one ordered stream:
    // doc1: 300 → seq0@0; doc2: 300 overflows → seq1@0; doc3: 100 → seq1@300;
    // doc4: 500 overflows (400+500) → seq2@0; doc5: 90 → 500+90=590>512
    //   → seq3@0
    def words(n: Int): String = (1 to n).map(i => "w" + i).mkString(" ")
    val docs = Seq(
      (1L, words(300)), (2L, words(300)), (3L, words(100)),
      (4L, words(500)), (5L, words(90)))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val packed = SeqPack.packDocs(docs, maxLen = 512)
      .collect().sortBy(_.doc_id)
      .map(p => (p.doc_id, p.bucket, p.seq_in_bucket, p.n_tok, p.offset))
    assert(packed.toSeq == Seq(
      (1L, 0L, 0L, 300L, 0L), (2L, 0L, 1L, 300L, 0L), (3L, 0L, 1L, 100L, 300L),
      (4L, 0L, 2L, 500L, 0L), (5L, 0L, 3L, 90L, 0L)))
  }

  test("bucket assignment floors over the full signed doc_id domain") {
    import spark.implicits._
    // negative ids must land in floor-division buckets (doc_id >> 6),
    // matching the oracle's `doc_id // 64` — NOT truncate-toward-zero
    val docs = Seq((-1L, "one two three"), (-64L, "four five"), (64L, "six"))
      .map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = SeqPack.packDocs(docs, maxLen = 512).collect()
      .map(p => p.doc_id -> p.bucket).toMap
    assert(got == Map(-1L -> -1L, -64L -> -1L, 64L -> 1L))
  }

  test("overlong documents are truncated to maxLen, not dropped") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 600).map("t" + _).mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p = SeqPack.packDocs(docs, maxLen = 512).collect()
    assert(p.length == 1 && p.head.n_tok == 512)
  }

  test("invariants at corpus scale: conservation, bounds, next-fit fill, determinism") {
    assume(sf.isDefined)
    val docs = graft.util.Tables(spark, sf.get, "documents")
    val packed = SeqPack.packDocs(docs, maxLen = 512).collect()
    // token conservation vs an independent count (truncation-aware)
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val expected = docs
      .select(least(size(tokens(col("text"))), lit(512)).cast("long").as("n"))
      .filter(col("n") > 0).agg(sum("n")).head().getLong(0)
    assert(packed.map(_.n_tok).sum == expected)
    // per-sequence fill ≤ maxLen; offsets partition the sequence
    packed.groupBy(p => (p.bucket, p.seq_in_bucket)).foreach { case (_, rs) =>
      val fill = rs.map(_.n_tok).sum
      assert(fill <= 512)
      val sorted = rs.sortBy(_.offset)
      assert(sorted.head.offset == 0)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.offset + a.n_tok == b.offset)
        case _ =>
      }
    }
    // next-fit guarantee: any two consecutive non-final sequences of a
    // bucket overflow maxLen together
    packed.groupBy(_.bucket).values.foreach { rs =>
      val fills = rs.groupBy(_.seq_in_bucket).toSeq.sortBy(_._1)
        .map(_._2.map(_.n_tok).sum)
      if (fills.length > 2)
        assert(fills.dropRight(1).sliding(2).forall(p => p.sum > 512),
          "two consecutive non-final sequences must overflow maxLen together")
    }
    // deterministic across runs — exact layout equality, not just set
    val again = SeqPack.packDocs(docs, maxLen = 512).collect()
    assert(again.map(p => (p.bucket, p.seq_in_bucket, p.doc_id, p.offset)).toSet ==
      packed.map(p => (p.bucket, p.seq_in_bucket, p.doc_id, p.offset)).toSet)
  }
}
