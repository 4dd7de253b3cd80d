package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("13-gram overlap tags copied docs, ignores disjoint and short docs") {
    import spark.implicits._
    val evalText = (1 to 20).map(i => s"w$i").mkString(" ") // 20 tokens → 8 grams
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val train = Seq(
      (1L, evalText),                                   // verbatim copy
      (2L, (1 to 20).map(i => s"x$i").mkString(" ")),   // disjoint vocab, 8 grams
      (3L, (1 to 12).map(i => s"w$i").mkString(" ")),   // < 13 tokens
      // half-overlap: 13 eval tokens then 13 fresh ones (26 tokens → 14
      // grams, exactly 1 of which — w1..w13 — is an eval gram)
      (4L, ((1 to 13).map(i => s"w$i") ++ (1 to 13).map(i => s"y$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Decontam.decontaminate(train, evalDocs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_matched"),
          r.getAs[Boolean]("contaminated"))).toMap
    assert(got.keySet == Set(1L, 2L, 4L)) // doc 3 has no 13-grams
    assert(got(1L) == ((8L, 8L, true)))
    assert(got(2L) == ((8L, 0L, false)))
    assert(got(4L) == ((14L, 1L, true)))
  }

  test("near-dup decontam: verbatim jac=1, partial overlap scored, disjoint 0") {
    import spark.implicits._
    val evalText = (1 to 12).map(i => s"w$i").mkString(" ") // 12 tokens → 8 5-gram shingles
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val train = Seq(
      (1L, evalText),                                   // verbatim: jac 1.0
      (2L, (1 to 12).map(i => s"x$i").mkString(" ")),   // disjoint: jac 0
      (3L, "w1 w2 w3"),                                 // < 5 tokens: no shingles, absent
      // shares the first 8 tokens → 4 shared shingles of its 8;
      // jac = 4 / (8 + 8 - 4) = 1/3 → below tau, not contaminated
      (4L, ((1 to 8).map(i => s"w$i") ++ (1 to 4).map(i => s"z$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Decontam.decontaminateNear(train, evalDocs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("max_jac"), r.getAs[Long]("n_eval_hits"),
          r.getAs[Boolean]("contaminated"))).toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    assert(got(1L) == ((1.0, 1L, true)))
    assert(got(2L) == ((0.0, 0L, false)))
    assert(got(4L) == ((0.333333, 0L, false)))
    // tau is a real threshold: the same 1/3-similar pair flips to
    // contaminated when the caller loosens it below the measured jac
    val loose = Decontam.decontaminateNear(train, evalDocs, tau = 0.3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    assert(loose(4L))
  }
}
