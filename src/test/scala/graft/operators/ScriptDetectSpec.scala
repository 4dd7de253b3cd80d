package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Classification semantics for the Unicode script detector — the
  * registered query is oracle-checked; this pins the planted-row
  * classifications and the tie/no-letter edge rules by value.
  */
class ScriptDetectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("planted rows classify to their scripts; ties follow preference; no letters → unknown") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scriptdet").toString
    // one ASCII doc; the planted rows ride in from the query itself
    Seq((1L, "plain english words here", "en", "src", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("text_script_detect")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    assert(rows(1L)._1 == "latin" && rows(1L)._2 == 1.0)
    assert(rows(9000001L)._1 == "cyrillic" && rows(9000001L)._2 == 1.0)
    assert(rows(9000002L)._1 == "cjk")
    assert(rows(9000003L)._1 == "arabic")
    assert(rows(9000004L)._1 == "greek")
    // exact 5-5 latin/cyrillic tie → fixed preference order picks latin
    assert(rows(9000005L) == ("latin", 0.5))
    // digits/punctuation only → unknown with zero fraction
    assert(rows(9000006L) == ("unknown", 0.0))
  }
}
