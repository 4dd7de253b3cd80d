package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic check for the corpus data card on a fixture where every
  * statistic is hand-computable, including the discrete-quantile
  * definition (value at row ceil(q·n) of the group sorted by n_chars).
  */
class DatacardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("counts, dup ratio and discrete percentiles on a known group") {
    import spark.implicits._
    // one (en, s) group of 10 docs with n_chars 10..100; two docs share text
    val rows = (1 to 10).map { i =>
      val text = if (i <= 2) "dup dup dup" else s"unique text number $i"
      (i.toLong, text, "en", "s", i * 10L)
    }
    val dir = java.nio.file.Files.createTempDirectory("card").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("corpus_datacard")(spark, dir).collect().head
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_docs") == 10L)
    assert(m("total_chars") == (10 to 100 by 10).sum.toLong)
    assert(m("n_unique") == 9L) // docs 1,2 identical
    assert(m("min_chars") == 10L && m("max_chars") == 100L)
    // p50 = value at row ceil(0.5*10)=5 -> 50; p90 = row ceil(0.9*10)=9 -> 90
    assert(m("p50_chars") == 50L, s"p50: $m")
    assert(m("p90_chars") == 90L, s"p90: $m")
    assert(m("dup_ratio") == 0.1)
  }

  test("odd group size uses ceil indexes") {
    import spark.implicits._
    val rows = (1 to 5).map(i => (i.toLong, s"t $i", "de", "s", i.toLong))
    val dir = java.nio.file.Files.createTempDirectory("card2").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("corpus_datacard")(spark, dir).collect().head
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    // n=5: p50 row ceil(2.5)=3 -> 3; p90 row ceil(4.5)=5 -> 5
    assert(m("p50_chars") == 3L, s"p50: $m")
    assert(m("p90_chars") == 5L, s"p90: $m")
  }
}
