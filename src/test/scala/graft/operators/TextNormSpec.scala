package graft.operators

import graft.functions.NfcNormalize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** NFC normalization ([[graft.functions.NfcNormalize]]) and the two
  * curation filters added with it: the registered oracle queries exercise
  * them on the (mostly-ASCII) corpus plus one planted row; this spec
  * drives the interesting Unicode cases and the blocklist semantics
  * directly, through both the interpreted and codegen paths. All
  * non-ASCII is written as \u escapes so the decomposed inputs stay
  * decomposed no matter what normalizes this source file.
  */
class TextNormSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def kernel(s: String): String =
    NfcNormalize.normalize(UTF8String.fromString(s)).toString

  test("kernel: combining sequences compose, canonical singletons map, NFC text is untouched") {
    assert(kernel("cafe\u0301") == "caf\u00e9")   // e + COMBINING ACUTE -> e-acute
    assert(kernel("\u212b") == "\u00c5")          // ANGSTROM SIGN -> A-ring
    assert(kernel("nai\u0308ve") == "na\u00efve") // i + COMBINING DIAERESIS -> i-umlaut
    assert(kernel("caf\u00e9 plain") == "caf\u00e9 plain") // already NFC
    assert(kernel("pure ascii 123") == "pure ascii 123")
    // ligature fi is NFC-stable (decomposing it is NFKC's job)
    assert(kernel("\ufb01n") == "\ufb01n")
  }

  test("ascii fast path returns the same UTF8String instance") {
    val in = UTF8String.fromString("only ascii here")
    assert(NfcNormalize.normalize(in) eq in)
  }

  test("expression agrees between interpreted eval and codegen over a DataFrame") {
    import spark.implicits._
    val rows = Seq("cafe\u0301", "\u212b", "nai\u0308ve", "plain", null)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "t")
      .select(col("id"), NfcNormalize.nfc(col("t")).as("n"))
    val got = df.orderBy(col("id")).collect()
      .map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(got.toSeq == Seq("caf\u00e9", "\u00c5", "na\u00efve", "plain", null))
  }

  test("text_normalize query counts changed docs per source") {
    val dir = java.nio.file.Files.createTempDirectory("norm").toString
    import spark.implicits._
    Seq(
      (1L, "cafe\u0301 au lait", "fr", "sA", 13L), // 13 chars raw, 12 composed
      (2L, "all ascii", "en", "sA", 9L),
      (3L, "A\u030angstro\u0308m", "en", "sB", 10L)) // 10 raw, 8 composed
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_normalize")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("sA") == ((2L, 1L, 22L, 21L)), s"got $out")
    assert(out("sB") == ((1L, 1L, 10L, 8L)), s"got $out")
    assert(out("planted")._2 == 1L) // the built-in planted row changed
  }

  test("curation_badwords flags exactly the docs containing a blocked token") {
    val dir = java.nio.file.Files.createTempDirectory("bad").toString
    import spark.implicits._
    Seq(
      (1L, "clean doc about joins", "en", "sA", 21L),
      (2L, "this one mentions dup rows", "en", "sA", 26L),
      (3L, "casino spam casino", "en", "sB", 18L),
      (4L, "dupes is a different token", "en", "sB", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("curation_badwords")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("sA") == ((2L, 1L, 21L))) // doc 2 dropped, doc 1's chars kept
    assert(out("sB") == ((2L, 1L, 26L))) // 'dupes' does not match 'dup'
  }

  test("text_bm25 ranks rarer terms higher and respects the top-10 cap") {
    val out = graft.SparkEntry.queries("text_bm25")(spark, "/root/testdata/sf0.001")
      .collect()
    val byTerm = out.groupBy(_.getString(0))
    assert(byTerm.keySet.subsetOf(Set("join", "vector", "filter", "dup")))
    byTerm.foreach { case (t, rows) =>
      assert(rows.length <= 10, s"$t returned ${rows.length} rows")
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to rows.length), s"$t ranks: $ranks")
      rows.foreach(r => assert(r.getDouble(2) > 0.0))
    }
  }
}
