package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The synthetic corpus contains no PII, so the oracle exercises the
  * zero path; this spec drives planted emails/phones/IPs through the
  * registered query's expressions.
  */
class PiiScrubSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("planted emails, phones and IPv4s are counted and redacted") {
    import spark.implicits._
    val texts = Seq(
      (1L, "contact alice.smith+spam@mail.example.co for details", "en", "sA", 50L),
      (2L, "call +1 (555) 123-4567 or 555.987.6543 today", "en", "sA", 44L),
      (3L, "server at 192.168.0.1 and 10.0.0.255 responded", "en", "sB", 46L),
      (4L, "no pii in this line at all", "en", "sB", 26L))
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    texts.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_pii_scrub")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val (saEmails, saPhones, _, saClean) = out("sA")
    val (_, _, sbIps, _) = out("sB")
    assert(saEmails == 1)
    assert(saPhones == 2, s"phones: $out")
    assert(sbIps == 2, s"ips: $out")
    // redaction shrank the text: "<PHONE>"/"<EMAIL>" are shorter than
    // what they replace in every planted row
    val rawLen = texts.filter(_._4 == "sA").map(_._2.length).sum
    assert(saClean < rawLen, s"clean $saClean !< raw $rawLen")
    // untouched doc keeps its exact length
    val (_, _, _, sbClean) = out("sB")
    val sbRaw = texts.filter(_._4 == "sB").map(_._2.length).sum
    assert(sbClean < sbRaw) // doc 3 redacted; doc 4 contributes unchanged
  }
}
