package graft.dedup

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics for the edit-distance near-dup verifier (the
  * registered query is oracle-checked at all SFs).
  */
class EditDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("editdedup").toString
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("near-dups verify; the 5% bar and the blocking key behave as documented") {
    val base = ("x" * 32) + ("word " * 20)  // 132 chars, shared 32-char prefix
    val dir = docsDir(Seq(
      (1L, base),
      (2L, base.dropRight(4) + "edit"),     // dist 4/132 = 3.0% → verified
      (3L, base + ("y" * 40)),              // same prefix, length bucket differs → not a candidate
      (4L, ("z" * 32) + base.drop(32))))    // different prefix → not a candidate
    val got = graft.SparkEntry.queries("dedup_edit_distance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 4L)))
  }

  test("identical docs verify at distance zero; >5% candidates are rejected") {
    val t = ("p" * 32) + ("tail " * 8)      // 72 chars
    val dir = docsDir(Seq(
      (1L, t),
      (2L, t),                              // dist 0 → verified
      (3L, t.dropRight(8) + "QQQQWWWW")))   // dist 8/72 = 11.1% → rejected
    val got = graft.SparkEntry.queries("dedup_edit_distance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 0L)))
  }
}
