package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-level distributed ranking (cumCountDesc) and the RFM scoring
  * built on it, on hand-computable fixtures.
  */
class RfmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cumCountDesc equals the one-partition window form, ties counted together") {
    import spark.implicits._
    // values with duplicates across bucket boundaries (bit-length buckets)
    val vals = Seq(1L, 1L, 2L, 3L, 3L, 7L, 8L, 100L, 100L, 100L)
    val df = vals.toDF("x")
    val got = ScaleUtils.cumCountDesc(df, "x", v => length(bin(v)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // desc cum over distinct values: 100->3, 8->4, 7->5, 3->7, 2->8, 1->10
    assert(got == Map(100L -> 3L, 8L -> 4L, 7L -> 5L, 3L -> 7L, 2L -> 8L, 1L -> 10L),
      s"got $got")
  }

  test("rfm scores: quartile cutoffs by value, ties share a score") {
    import spark.implicits._
    // 8 users, one event each on distinct days (recency = user index),
    // value 10*u so monetary ordering mirrors recency
    val rows = (1 to 8).map { u =>
      (u.toLong, java.sql.Timestamp.valueOf(f"2024-01-$u%02d 10:00:00"),
        u.toLong, "view", u * 10.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("events_rfm")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    // n=8 -> cutoff ranks 2,4,6: users 8,7 score 1; 6,5 -> 2; 4,3 -> 3; 2,1 -> 4
    // freq all ties at 1 -> everyone's freq cutoffs equal 1 -> f_score 1 for all
    assert(out == Map((1, 1, 1) -> 2L, (2, 1, 2) -> 2L, (3, 1, 3) -> 2L, (4, 1, 4) -> 2L),
      s"got $out")
  }
}
