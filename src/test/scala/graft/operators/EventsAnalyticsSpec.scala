package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the funnel / cohort / chunking queries on
  * hand-computable fixtures (order constraints are easy to get subtly
  * wrong with plain aggregation).
  */
class EventsAnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("funnel requires each step strictly after the previous one") {
    import spark.implicits._
    // u1: full ordered funnel; u2: click BEFORE first view (stops at view);
    // u3: purchase before click (stops at click); u4: never views
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-02 09:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-02 10:00:00"), 2L, "view", 1.0, "{}"),
      (6L, ts("2024-01-03 08:00:00"), 3L, "purchase", 1.0, "{}"),
      (7L, ts("2024-01-03 09:00:00"), 3L, "view", 1.0, "{}"),
      (8L, ts("2024-01-03 10:00:00"), 3L, "click", 1.0, "{}"),
      (9L, ts("2024-01-04 10:00:00"), 4L, "click", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("events_funnel")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L), s"got $out")
  }

  test("cohort offsets count users against their own first day") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-03 10:00:00"), 1L, "view", 1.0, "{}"),   // u1 offset 2
      (3L, ts("2024-01-02 10:00:00"), 2L, "view", 1.0, "{}"),
      (4L, ts("2024-01-03 10:00:00"), 2L, "view", 1.0, "{}"))   // u2 offset 1
    val dir = java.nio.file.Files.createTempDirectory("cohort").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("events_cohort_retention")(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 1) -> 1L), s"got $out")
  }

  test("chunking: stride-40 windows of 50 tokens with a short tail") {
    import spark.implicits._
    val text = (1 to 95).map(i => s"w$i").mkString(" ") // 95 tokens
    val dir = java.nio.file.Files.createTempDirectory("chunks").toString
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("chunk_passages")(spark, dir).collect()
      .map(r => r.getInt(1) -> r.getInt(2)).toMap
    // starts 0, 40, 80 -> lengths 50, 50, 15
    assert(out == Map(0 -> 50, 1 -> 50, 2 -> 15), s"got $out")
  }

  test("scd2Merge chain-folds arbitrary splits to exactly the full rebuild") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    val raw = graft.util.Tables(spark, sf, "events")
    // three arbitrary chunks folded sequentially — including a split
    // that scatters a user's purchases across chunks out of time order
    var dim = Relational.scd2(raw.filter(col("event_id") % 3 === 1))
    dim = Relational.scd2Merge(dim, raw.filter(col("event_id") % 3 === 2))
    dim = Relational.scd2Merge(dim, raw.filter(col("event_id") % 3 === 0))
    val full = Relational.scd2(raw)
    assert(dim.collect().map(_.toSeq).toSet === full.collect().map(_.toSeq).toSet)
    assert(full.count() > 0)
  }

  test("property: scd2Merge over random splits always equals the full rebuild") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.Gen
    import spark.implicits._
    // tiny ts domain (0..5 µs) and 3 users force frequent equal-(user, ts)
    // collisions ACROSS chunks — the case only the src_event_id lineage
    // tiebreak resolves identically to a rebuild
    val eventGen = for {
      n <- Gen.choose(4, 24)
      rows <- Gen.listOfN(n, for {
        ts <- Gen.choose(0L, 5L)
        user <- Gen.choose(0L, 2L)
        isP <- Gen.oneOf(true, true, false)
        v <- Gen.choose(0, 9999)
        chunk <- Gen.choose(0, 2)
      } yield (ts, user, if (isP) "purchase" else "click", v / 100.0, chunk))
    } yield rows.zipWithIndex.map { case ((ts, u, tpe, v, c), i) =>
      (i.toLong, ts, u, tpe, v, c)
    }
    var iter = 0
    Iterator.continually(eventGen.sample).flatten.take(12).foreach { rows =>
      iter += 1
      val df = rows.toDF("event_id", "ts_raw", "user_id", "event_type", "value", "chunk")
        .withColumn("ts", timestamp_micros(col("ts_raw")))
      val full = Relational.scd2(df).collect().map(_.toSeq).toSet
      var dim = Relational.scd2(df.filter(col("chunk") === 0))
      dim = Relational.scd2Merge(dim, df.filter(col("chunk") === 1))
      dim = Relational.scd2Merge(dim, df.filter(col("chunk") === 2))
      val merged = dim.collect().map(_.toSeq).toSet
      assert(merged === full, s"iteration $iter diverged on rows: $rows")
    }
  }
}
