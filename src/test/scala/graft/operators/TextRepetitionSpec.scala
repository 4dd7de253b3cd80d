package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture semantics for the Gopher n-gram repetition rules — the
  * registered query is oracle-checked at every SF; these pin the corner
  * cases the synthetic documents distribution may not hit.
  */
class TextRepetitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("textrep").toString
    rows.map { case (id, text) => (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String) =
    graft.SparkEntry.queries("text_repetition")(spark, dir)

  test("a looped phrase fails; varied text passes; short docs emit no row") {
    // doc 1: "ab cd" repeated 30x — every 2-gram is a duplicate, the top
    // 2-gram covers ~half the chars → must fail (top_2gram_frac >> 0.2)
    // doc 2: 60 distinct tokens, no repeated n-gram of any size → passes
    // doc 3: one token — nothing to measure at n>=2 → absent
    val varied = (0 until 60).map(i => s"w${i}x$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, Seq.fill(30)("ab cd").mkString(" ")),
      (2L, varied),
      (3L, "solo")))
    val rows = run(dir).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L))
    val d1 = rows(1L)
    assert(!d1.getBoolean(d1.fieldIndex("passes")))
    assert(d1.getDouble(d1.fieldIndex("top_2gram_frac")) > 0.2)
    // all 120 chars sit inside duplicated 5-grams in the loop
    assert(d1.getDouble(d1.fieldIndex("dup_5gram_frac")) > 0.9)
    val d2 = rows(2L)
    assert(d2.getBoolean(d2.fieldIndex("passes")))
    assert(d2.getDouble(d2.fieldIndex("dup_5gram_frac")) == 0.0)
  }

  test("top n-gram char coverage is exact on a hand-computed fixture") {
    // tokens: "aa bb aa bb cc" → 2-grams: "aa bb"(2), "bb aa"(1),
    // "bb cc"(1); top covers 2*(2+2)=8 chars of 10 total → 0.8
    val dir = docsDir(Seq((7L, "aa bb aa bb cc")))
    val r = run(dir).collect()(0)
    assert(r.getDouble(r.fieldIndex("top_2gram_frac")) == 0.8)
    // dup 2-grams: only "aa bb" (c=2) → same 8/10; but n=5 has a single
    // 5-gram (count 1) → no duplicated chars
    assert(r.getDouble(r.fieldIndex("dup_5gram_frac")) == 0.0)
  }

  test("empty documents table yields an empty, well-typed result") {
    val dir = docsDir(Seq.empty)
    val out = run(dir)
    assert(out.count() == 0)
    assert(out.columns.contains("passes"))
  }
}
