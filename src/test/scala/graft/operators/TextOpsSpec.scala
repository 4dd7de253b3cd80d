package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the Gopher rule arithmetic on a fixture corpus that actually
  * contains the symbol characters (`#`, `…`, `...`) — the sf testdata has
  * none, so without this the symbol-ratio rule would only ever see zero
  * matches (and a regex group-index bug in it once went unnoticed).
  */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** documents-shaped parquet fixture in a temp dir, loadable via Tables. */
  lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("textops").toString
    val good = ("The quick brown fox jumps over the lazy dog and runs off " +
      "to the hills with great joy that nobody could have predicted. ") * 5
    Seq(
      (1L, good, "web", "en"),
      // heavy symbols: '#' plus both ellipsis spellings
      (2L, "# # # wait… no... maybe… yes... # " * 20, "web", "en"),
      // all-numeric tokens: alpha_word_frac = 0
      (3L, ("42 7 1999 3 " * 30) + "17", "web", "en"),
      // no stop words at all
      (4L, "zebra quagga okapi tapir gnu eland kudu oryx dikdik " * 10, "web", "en"),
      // duplicate-line CHARACTER mass: 30 distinct short lines + one
      // giant line twice → dup_line_frac small, dup_line_char_frac large
      (5L, {
        val distinct = (1 to 30).map(i => s"line of the day $i").mkString("\n")
        val giant = "the quick brown fox of and to with that have be " * 40
        s"$distinct\n$giant\n$giant"
      }, "web", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  def gopher(): Map[Long, org.apache.spark.sql.Row] =
    TextOps.qualityGopher.fn(spark, fixtureDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("symbol-heavy doc is counted and fails the symbol-ratio rule") {
    val r = gopher()(2L)
    assert(r.getAs[Int]("n_symbols") >= 80, "both '…' and '...' must count")
    assert(r.getAs[Double]("symbol_ratio") > 0.1)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("clean doc passes all rules including the new ones") {
    val r = gopher()(1L)
    assert(r.getAs[Double]("alpha_word_frac") >= 0.8)
    assert(r.getAs[Int]("stop_hits") >= 2)
    assert(r.getAs[Boolean]("passes"))
  }

  test("numeric-token doc fails alpha-word fraction") {
    val r = gopher()(3L)
    assert(r.getAs[Double]("alpha_word_frac") < 0.8)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("repeated giant line fails the char-mass rule but not the count rule") {
    val r = gopher()(5L)
    assert(r.getAs[Double]("dup_line_frac") <= 0.3, "count rule should pass")
    assert(r.getAs[Double]("dup_line_char_frac") > 0.2, "char rule should fail")
    assert(!r.getAs[Boolean]("passes"))
  }

  test("stopword-free doc fails stop-word presence") {
    val r = gopher()(4L)
    assert(r.getAs[Int]("stop_hits") < 2)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("text_entropy: uniform repetition scores 0, diverse text scores high") {
    import spark.implicits._
    val dir = Files.createTempDirectory("entropy").toString
    Seq(
      (1L, "spam spam spam spam spam spam spam spam", "en", "rep", 39L),
      (2L, "one two three four five six seven eight nine ten alpha beta gamma delta epsilon zeta", "en", "div", 86L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_entropy")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out("rep") == ((1L, 0.0, 1L)))       // 8x one token: H = 0, flagged low
    assert(out("div")._2 == 4.0)                // 16 distinct tokens: H = log2(16)
    assert(out("div")._3 == 0L)
  }
}
