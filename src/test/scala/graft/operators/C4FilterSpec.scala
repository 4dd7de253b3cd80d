package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The synthetic corpus has no newlines or punctuation, so the oracle
  * exercises the everything-filtered path; this spec drives realistic
  * multi-line fixtures through every C4 rule (terminal punctuation,
  * min words, javascript lines, lorem ipsum / curly-brace pages, min
  * sentence count).
  */
class C4FilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(texts: Seq[(Long, String)]): Map[Long, (Int, Int, Int, Boolean)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("c4").toString
    texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("text_c4_filter")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4))))
      .toMap
  }

  private val goodPage =
    """This is the first proper sentence of the page.
      |Here is another sentence that also ends correctly!
      |Does this page have enough sentences? Yes it does.
      |A fourth line with a full stop at the end.
      |And a fifth sentence to clear the threshold.""".stripMargin

  test("a clean multi-sentence page keeps all lines and passes") {
    val out = run(Seq(1L -> goodPage))
    val (nLines, nKept, nSent, keep) = out(1L)
    assert(nLines == 5 && nKept == 5)
    assert(nSent == 6) // "? Yes it does." line carries two terminators
    assert(keep)
  }

  test("line rules: no terminal punctuation, short lines, javascript") {
    val page = Seq(
      "A line without terminal punctuation",   // dropped: no [.!?"'] at end
      "Too short.",                            // dropped: < 3 words
      "Please enable JavaScript to continue.", // dropped: javascript mention
      "Only this line survives the filter."    // kept
    ).mkString("\n")
    val out = run(Seq(1L -> page))
    val (nLines, nKept, nSent, keep) = out(1L)
    assert(nLines == 4 && nKept == 1)
    assert(nSent == 1)
    assert(!keep) // < 5 sentences after filtering
  }

  test("page rules: lorem ipsum and curly braces reject the whole page") {
    val lorem = goodPage + "\nLorem ipsum dolor sit amet and so on."
    val curly = goodPage + "\nfunction f() { return 1; }"
    val out = run(Seq(1L -> lorem, 2L -> curly, 3L -> goodPage))
    assert(!out(1L)._4, "lorem ipsum page must be rejected")
    assert(!out(2L)._4, "curly-brace page must be rejected")
    assert(out(3L)._4)
  }

  test("quote-terminated lines count as terminal punctuation") {
    val page = Seq(
      "A quoted ending line finishes like \"this\"",
      "Another line ending in a single quote like 'so'").mkString("\n")
    val out = run(Seq(1L -> page))
    assert(out(1L)._2 == 2, s"both quote-terminated lines kept: $out")
  }
}
