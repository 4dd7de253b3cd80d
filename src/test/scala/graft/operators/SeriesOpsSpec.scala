package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ts_gapfill invariants (the DuckDB oracle checks exact values; this
  * spec pins the semantic contract on properties that hold at any SF).
  */
class SeriesOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("gapfill emits a complete calendar with non-null fills and exercises real gaps") {
    val df = SeriesOps.tsGapfill.fn(spark, "/root/testdata/sf0.01").cache()
    try {
      val gaps = df.filter(col("n") === 0)
      assert(gaps.count() > 0, "test data produced no gap days — series key too coarse")
      assert(df.filter(col("ffill_total").isNull || col("interp_total").isNull).count() == 0,
        "every calendar day must have both fills (span endpoints are observations)")
      // observed days pass through untouched: interp == ffill == the day's total
      val observedMismatch = df.filter(col("n") > 0 &&
        col("interp_total") =!= col("ffill_total")).count()
      assert(observedMismatch == 0, "observed days must carry their own total in both fills")
      // per series the calendar is contiguous: row count == span days
      import spark.implicits._
      val bad = df.groupBy(col("event_type"), col("series"))
        .agg(count(lit(1)).as("rows"),
          (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
        .filter(col("rows") =!= col("span")).count()
      assert(bad == 0, "gap-filled calendar must be contiguous per series")
    } finally df.unpersist()
  }
}
