package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("profile counts nulls and distincts exactly on a known frame") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("a")),
      (Some(2L), None), (None, Some("b"))
    ).toDF("id", "s")
    val p = DataQuality.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((4L, 3L, 2L)), "id: 4 rows, 3 non-null, 2 distinct")
    assert(p("s") == ((4L, 3L, 2L)), "s: 4 rows, 3 non-null, 2 distinct")
  }

  test("checks flag the out-of-whitelist languages and pass the structural rules") {
    val rows = DataQuality.dqChecks.fn(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(r.fieldIndex("rule")) ->
        (r.getLong(r.fieldIndex("n_violations")), r.getBoolean(r.fieldIndex("pass")))).toMap
    assert(rows("doc_id_unique")._2, "doc ids are unique in the fixture")
    assert(rows("text_len_matches")._2, "n_chars matches text length in the fixture")
    // the fixture contains zh docs, deliberately outside the whitelist:
    // a rule that can never fail tests nothing
    assert(!rows("lang_in_allowed")._2 && rows("lang_in_allowed")._1 > 0,
      "zh documents must be flagged by the language whitelist")
  }
}
