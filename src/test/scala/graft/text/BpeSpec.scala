package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The Sennrich et al. 2016 worked example: training on
    * low×5 lower×2 newest×6 widest×3 must learn exactly
    * (e,s) (es,t) (l,o) (lo,w) — pair frequencies 9,9,7,7 with the
    * es/st and lo/ow ties broken lexicographically.
    */
  test("training reproduces the Sennrich worked example, deterministically") {
    val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(vocab, nMerges = 4)
    assert(merges == Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // early stop: no pair repeats after enough merges
    val all = Bpe.train(Seq("ab" -> 1L, "cd" -> 1L), nMerges = 10)
    assert(all.isEmpty, s"no pair reaches freq 2: $all")
  }

  test("encode applies merges greedily by rank: lowest → [low, est]") {
    val ranks = Bpe.ranksOf(Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(Bpe.encode("lowest", ranks).toSeq == Seq("low", "est"))
    assert(Bpe.encode("low", ranks).toSeq == Seq("low"))
    assert(Bpe.encode("lower", ranks).toSeq == Seq("low", "e", "r"))
    assert(Bpe.encode("newest", ranks).toSeq == Seq("n", "e", "w", "est"))
    assert(Bpe.encode("xyz", ranks).toSeq == Seq("x", "y", "z"))
    assert(Bpe.encode("", ranks).isEmpty)
    assert(Bpe.encode("a", ranks).toSeq == Seq("a"))
    assert(Bpe.countPiece("lowest", ranks) == 2)
    assert(Bpe.countPiece("lowest", ranks) == 2) // cached path
  }

  test("encoding a training word reproduces its trained segmentation") {
    // after training, each training word must encode to the symbols the
    // trainer left it with (encode and train share the merge operator)
    val vocab = Seq("hug" -> 10L, "pug" -> 5L, "pun" -> 12L, "bun" -> 4L, "hugs" -> 5L)
    val merges = Bpe.train(vocab, nMerges = 6)
    val ranks = Bpe.ranksOf(merges)
    assert(merges.nonEmpty)
    // "ug" (15) and "un" (16) are the dominant pairs; all words encode to
    // ≤ 2 tokens once their top merges are learned
    assert(Bpe.encode("hug", ranks).length <= 2)
    assert(Bpe.encode("pun", ranks).length <= 2)
  }

  test("property: encoding is a lossless segmentation under any merge table") {
    import org.scalacheck.Gen
    val pieceGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    val vocabGen = Gen.listOfN(8,
      for { p <- pieceGen if p.nonEmpty; f <- Gen.choose(1L, 20L) } yield (p, f))
    val cases = for { v <- vocabGen; p <- pieceGen } yield (v, p)
    Iterator.continually(cases.sample).flatten.take(80).foreach { case (vocab, piece) =>
      val ranks = Bpe.ranksOf(Bpe.train(vocab, nMerges = 6))
      val toks = Bpe.encode(piece, ranks)
      // concatenating the tokens must reproduce the piece exactly — a
      // merge can regroup characters but never drop, reorder or invent
      assert(toks.mkString == piece, s"vocab=$vocab piece=$piece toks=${toks.toSeq}")
      assert(Bpe.countPiece(piece, ranks) == toks.length)
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("token_counts_bpe_exact: exact counts ≥ piece-count lower bound, deterministic") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val exact = graft.SparkEntry.queries("token_counts_bpe_exact")(spark, sf.get)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = graft.SparkEntry.queries("token_counts_bpe")(spark, sf.get)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == est.keySet)
    // a merge table only subdivides pre-token pieces: exact ≥ piece count,
    // and with 200 learned merges over a tiny vocab they stay in family
    exact.foreach { case (src, n) =>
      assert(n >= est(src), s"$src: exact $n < piece lower bound ${est(src)}")
    }
    // deterministic end to end (training tiebreaks + expression)
    val again = graft.SparkEntry.queries("token_counts_bpe_exact")(spark, sf.get)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == exact)
  }
}
