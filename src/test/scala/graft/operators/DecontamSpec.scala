package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
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
}
