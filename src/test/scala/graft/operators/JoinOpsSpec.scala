package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture semantics for the as-of and range join operators (their
  * registered queries are oracle-checked; these pin the corner cases the
  * synthetic events distribution may not hit).
  */
class JoinOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("joinops").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("as-of join: before-first -1, carries latest forward, equal-ts purchase visible") {
    val us = 1000L // 1 µs in ns: fixture ts values stay µs-aligned
    val dir = eventsDir(Seq(
      (1L, 10L * us, 7L, "click", 0.0),     // before any purchase → -1
      (2L, 20L * us, 7L, "purchase", 10.0),
      (3L, 30L * us, 7L, "click", 0.0),     // → 10
      (4L, 40L * us, 7L, "purchase", 20.0),
      (5L, 40L * us, 7L, "click", 0.0),     // equal ts → sees 20
      (6L, 50L * us, 7L, "click", 0.0),     // → still 20
      (7L, 45L * us, 8L, "click", 0.0),     // other user, no purchases → -1
      (8L, 41L * us, 7L, "view", 99.0)))    // non-click/purchase: ignored
    val got = graft.SparkEntry.queries("j6_asof_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> -1.0, 3L -> 10.0, 5L -> 20.0, 6L -> 20.0, 7L -> -1.0))
    // the scalable shape: no join operator at all — one partition-sorted
    // window pass does the lookup
    val plan = graft.SparkEntry.queries("j6_asof_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
  }

  test("range join: bucketed equi-join reproduces the naive inequality join") {
    import spark.implicits._
    val us = 1000L
    // 200 events over an uneven span — intervals overlap by construction
    val dir = eventsDir((0 until 200).map { i =>
      (i.toLong, (i * i).toLong * us, i.toLong % 5, "view", i / 10.0)
    })
    val got = graft.SparkEntry.queries("j7_range_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // naive truth: same interval synthesis, plain BETWEEN join
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"), col("value"))
    val Array(mn, mx) = e.agg(min("ts_us"), max("ts_us")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val step = math.max((mx - mn) / 50, 1L)
    val naive = (0 until 50).map { i =>
      val lo = mn + i * step
      val hi = mn + i * step + (i % 3 + 1) * step / 2
      val in = e.filter(col("ts_us").between(lo, hi))
        .agg(count(lit(1)), coalesce(sum(round(col("value"), 6)), lit(0.0)))
        .collect()(0)
      i.toLong -> (in.getLong(0), in.getDouble(1))
    }.filter(_._2._1 > 0).toMap
    assert(got.keySet == naive.keySet)
    naive.foreach { case (id, (n, v)) =>
      assert(got(id)._1 == n, s"interval $id count")
      assert(math.abs(got(id)._2 - v) < 1e-6, s"interval $id mass")
    }
  }
}
