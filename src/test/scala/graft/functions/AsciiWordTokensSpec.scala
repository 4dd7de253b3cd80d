package graft.functions

import graft.functions.AsciiWordTokens.asciiTokens
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsciiWordTokensSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("native scanner ≡ regexp_extract_all(lower, '[a-z0-9]+') on varied inputs") {
    val samples = Seq(
      "Hello World 123", "  leading", "trailing  ", "", "ALLCAPS",
      "mixedCase42x", "punct!@#between,words", "tabs\tand\nnewlines",
      "café résumé naïve", "数字123漢字abc", "a", "1", "---", "a-b_c.d",
      "x" * 5000 + " y")
    val df = samples.toDF("s")
    val both = df.select(
      asciiTokens(col("s")).as("native"),
      regexp_extract_all(lower(col("s")), lit("[a-z0-9]+"), lit(0)).as("regex"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch on input: ${r}")
    }
  }

  test("matches on the real documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      asciiTokens(col("text")).as("a"),
      regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("null propagates") {
    val df = Seq(Option.empty[String]).toDF("s")
    assert(df.select(asciiTokens(col("s"))).head().isNullAt(0))
  }
}
