package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking must survive insertions: two documents
  * sharing a long tail after different-length prefixes produce shared
  * CDC chunks (boundaries re-synchronize on content), while the
  * fixed-stride chunker stays misaligned and sees no duplication —
  * the property CDC exists for.
  */
class CdcDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 200 shared tail tokens: enough for several ~16-token CDC chunks to
  // land fully inside the common region on both sides
  private val tail = (0 until 200).map(i => s"w${i * 7 % 97}x$i").mkString(" ")

  private def writeFixture(prefixLen: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val pfxA = (0 until prefixLen).map(i => s"alpha$i").mkString(" ")
    Seq(
      (1L, s"$pfxA $tail", "en", "sA", 10L),
      (2L, s"uno dos tres $tail", "en", "sB", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("CDC finds the shared tail despite a misaligning insertion; fixed stride does not") {
    // prefix lengths 7 vs 3: misaligned mod 20, so every 20-token stride
    // window differs between the docs
    val dir = writeFixture(7)
    val cdc = graft.SparkEntry.queries("dedup_cdc_chunks")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(cdc.values.sum > 0, s"CDC found no dup chunks: $cdc")
    val fixed = graft.SparkEntry.queries("dedup_paragraph")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(fixed.values.sum == 0, s"fixed stride unexpectedly aligned: $fixed")
  }

  test("identical docs duplicate every chunk under CDC") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc2").toString
    Seq(
      (1L, tail, "en", "sA", 10L),
      (2L, tail, "en", "sB", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("dedup_cdc_chunks")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (src, n, dup) =>
      assert(n == dup, s"$src: $dup of $n chunks duplicated")
    }
  }
}
