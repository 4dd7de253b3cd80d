package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val eventsDir: String = {
    // stage the sf0.001 events file into a directory (file-stream source)
    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed streaming agg equals the batch equivalent") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM win_counts")
        .select("win_start", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

      val batchRaw = spark.read.parquet(eventsDir)
      val batch = batchRaw
        .withColumn("ts", graft.util.Tables.tsTimestamp(batchRaw))
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("event_type"), col("n")).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionization closes sessions on gap (batch-mode state machine)") {
    import spark.implicits._
    def ev(id: Long, tMin: Long, user: Long) = EventStream.Event(
      id, new java.sql.Timestamp(tMin * 60000), user, "click", 1.0)
    // user 1: two sessions separated by 2h; user 2: one session
    val events = Seq(
      ev(1, 0, 1), ev(2, 5, 1), ev(3, 10, 1),
      ev(4, 130, 1), ev(5, 131, 1),
      ev(6, 3, 2)).toDS()
    val sessions = EventStream.sessionize(events, gapMs = 30 * 60 * 1000)
      .collect().toSet
    // batch mode: only sessions closed by a later event in the same batch
    // are emitted (open sessions wait for the timeout in true streaming)
    assert(sessions.contains(EventStream.Session(1, 3, 0, 10 * 60000, 3.0)))
  }

  test("true streaming sessionization: timeout emits the open session") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // MemoryStream moved to the runtime subpackage in Spark 4.1
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(input.toDS(), gapMs = 60000,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("live_sessions")
      .outputMode("append").start()
    try {
      def ev(id: Long, tMin: Long) = EventStream.Event(
        id, new java.sql.Timestamp(tMin * 60000), 1L, "click", 1.0)
      // batch 1: three events 1-3min for user 1 → session stays open
      // (events start past t=0: rows at or below the initial watermark
      // are dropped as late)
      input.addData(ev(1, 1), ev(2, 2), ev(3, 3))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM live_sessions").count() == 0)
      // batch 2: an event far past the gap advances the watermark beyond
      // the session's timeout → the old session is emitted by TIMEOUT
      // (not by a closing event in the same batch — the streaming-only
      // code path batch mode never exercises)
      input.addData(ev(4, 120))
      q.processAllAvailable()
      // a third batch lets the timeout fire if the state store processes
      // timeouts on the following trigger
      input.addData(ev(5, 121))
      q.processAllAvailable()
      val sessions = spark.sql("SELECT * FROM live_sessions")
        .as[EventStream.Session].collect()
      assert(sessions.contains(EventStream.Session(1L, 3, 60000, 3 * 60000, 3.0)))
    } finally q.stop()
  }

  test("late events beyond the reorder horizon are counted, not silent") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("session_late_drops")
    def ev(id: Long, tMin: Long) = EventStream.Event(
      id, new java.sql.Timestamp(tMin * 60000), 1L, "click", 1.0)
    // arrival order = event_id; buffer of 2 means event 5 (t=50) arrives
    // after t=200 has already been fed → displaced past the horizon
    val events = Seq(ev(1, 100), ev(2, 200), ev(3, 300), ev(4, 400), ev(5, 50))
      .toDS().repartition(1).sortWithinPartitions("event_id")
    EventStream.sessionize(events, gapMs = 30 * 60000, maxBufferPerUser = 2,
      lateDrops = Some(acc)).collect()
    assert(acc.value == 1, s"expected exactly one counted drop, got ${acc.value}")
  }

  test("sessionization hot key: 1M-event user runs in O(buffer) memory") {
    import spark.implicits._
    // one user, 1M events, 1s apart with a 1h gap every 100k events —
    // locally shuffled so the reorder buffer actually reorders. The
    // buffer holds ≤4096 (ts, value) pairs, not the 1M-event batch.
    val gapMs = 30 * 60 * 1000L
    val n = 1000000
    val perSession = 100000
    val events = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_millis(
        (col("id") % perSession) * 1000L +
          expr(s"id div $perSession") * (perSession * 1000L + 2 * gapMs))
        .as("ts"),
      lit(7L).as("user_id"), lit("click").as("event_type"),
      lit(1.0).as("value"))
      // shuffle within ±1000 positions: out of order, within the horizon
      .withColumn("sortKey", col("event_id") + (pmod(xxhash64(col("event_id")), lit(2000)) - 1000))
      .repartition(1).sortWithinPartitions("sortKey").drop("sortKey")
      .as[EventStream.Event]
    val sessions = EventStream.sessionize(events, gapMs, maxBufferPerUser = 4096)
      .collect()
    // 10 sessions of 100k events each; the last stays open (no closer)
    assert(sessions.length == 9)
    assert(sessions.forall(_.n_events == perSession))
    assert(sessions.forall(_.total_value == perSession.toDouble))
  }

  test("stream_curate keeps a doc at the epoch boundary (doc_id 0)") {
    // regression: event time synthesized as timestamp_seconds(doc_id)
    // put doc 0 AT the epoch = a fresh stream's initial watermark, and
    // Spark dropped it as late; the +1 offset keeps it in
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sc0").toString
    val fifty = (0 until 60).map(i => s"tok$i").mkString(" ")
    Seq(
      (0L, fifty + " zero", "en", "src0", 100L),
      (1L, fifty + " one", "en", "src0", 101L),
      (2L, "short", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("stream_curate")(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L, s"doc 0 must survive: ${out.toSeq}")
  }

  test("streaming as-of enrichment equals the batch window route") {
    import spark.implicits._
    val raw = graft.util.Tables(spark, "/root/testdata/sf0.001", "events")
    val typed = raw.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), graft.util.Tables.tsTimestamp(raw).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event]
    // batch-mode state machine (withWatermark is a no-op on batch)
    val got = EventStream.asofEnrich(typed).toDF()
      .select(col("event_id"), col("user_id"), col("ts_us"),
        round(col("asof_value"), 6).as("asof_value"))
      .collect().map(_.toSeq).toSet
    val want = graft.operators.Relational.j6AsofJoin.fn(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("as-of state carries purchases across micro-batches") {
    import spark.implicits._
    // two files, forced into separate batches: purchases land first,
    // clicks second — the click batch must see state from batch 1
    val dir = java.nio.file.Files.createTempDirectory("asof_batches")
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    Seq(EventStream.Event(1L, ts(1000000L), 7L, "purchase", 42.0))
      .toDF().coalesce(1).write.parquet(dir.resolve("b0").toString)
    Seq(EventStream.Event(2L, ts(2000000L), 7L, "click", 0.0))
      .toDF().coalesce(1).write.parquet(dir.resolve("b1").toString)
    val staged = java.nio.file.Files.createTempDirectory("asof_staged")
    def onePart(sub: String, name: String): Unit = {
      val st = java.nio.file.Files.list(dir.resolve(sub))
      try {
        import scala.jdk.CollectionConverters._
        val part = st.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        java.nio.file.Files.copy(part, staged.resolve(name))
      } finally st.close()
    }
    // batch boundaries controlled by ARRIVAL, not file mtime: the
    // second file lands only after the first batch drains (equal
    // mtimes once made the click file process first, and a purchase
    // arriving after the click correctly yields -1.0 — not the
    // state-carry scenario this test pins)
    onePart("b0", "part-00000.parquet")
    val typed = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
      .as[EventStream.Event]
    val q = EventStream.asofEnrich(typed).toDF()
      .writeStream.format("memory").queryName("asof_two_batches")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // batch 1: the purchase updates state
      onePart("b1", "part-00001.parquet")
      q.processAllAvailable() // batch 2: the click reads carried state
    } finally q.stop()
    val rows = spark.sql("SELECT event_id, asof_value FROM asof_two_batches").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSet === Set((2L, 42.0)))
  }

  test("as-of state survives cross-batch reordering (late purchase, late click)") {
    import spark.implicits._
    // batch 1: purchase@5s (v=99) + click@6s. batch 2 (all LATE, inside
    // the 10-minute watermark): purchase@1s (v=42) — older than the
    // retained one, must NOT clobber it; click@0.5s — before the
    // retained purchase, must get the -1.0 no-match sentinel, not 99;
    // click@7s — still enriched by the retained purchase@5s.
    val dir = java.nio.file.Files.createTempDirectory("asof_ooo")
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    Seq(EventStream.Event(1L, ts(5000000L), 7L, "purchase", 99.0),
        EventStream.Event(2L, ts(6000000L), 7L, "click", 0.0))
      .toDF().coalesce(1).write.parquet(dir.resolve("b0").toString)
    Seq(EventStream.Event(3L, ts(1000000L), 7L, "purchase", 42.0),
        EventStream.Event(4L, ts(500000L), 7L, "click", 0.0),
        EventStream.Event(5L, ts(7000000L), 7L, "click", 0.0))
      .toDF().coalesce(1).write.parquet(dir.resolve("b1").toString)
    val staged = java.nio.file.Files.createTempDirectory("asof_ooo_staged")
    def onePart(sub: String, name: String): Unit = {
      val st = java.nio.file.Files.list(dir.resolve(sub))
      try {
        import scala.jdk.CollectionConverters._
        val part = st.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        java.nio.file.Files.copy(part, staged.resolve(name))
      } finally st.close()
    }
    onePart("b0", "part-00000.parquet")
    val typed = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
      .as[EventStream.Event]
    val q = EventStream.asofEnrich(typed).toDF()
      .writeStream.format("memory").queryName("asof_ooo")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      onePart("b1", "part-00001.parquet")
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT event_id, asof_value FROM asof_ooo").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((2L, 99.0), (4L, -1.0), (5L, 99.0)))
  }

  test("priority-sample fold over arbitrary chunkings equals the global selection") {
    // the mergeability stream_priority_sample relies on: topK(A ∪ B) =
    // topK(topK(A) ∪ B), so ANY arrival chunking folds to the batch answer
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    val docs = graft.util.Tables(spark, sf, "documents")
    def scores(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation
        .priorityScores(df, "doc_id", col("n_chars"), col("lang"))
        .select(col("grp"), col("doc_id"), col("n_chars"), col("xi"))
    def key(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.priorityTopK(df, "doc_id", 50)
        .collect().map(r => (r.getString(r.fieldIndex("grp")),
          r.getLong(r.fieldIndex("doc_id")))).toSet
    val global = key(scores(docs))
    val folded = (0 until 3).foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      case (prev, i) =>
        val chunk = scores(docs.filter(col("doc_id") % 3 === i))
        val merged = prev.map(_.unionByName(chunk)).getOrElse(chunk)
        Some(graft.operators.Curation.priorityTopK(merged, "doc_id", 50)
          .drop("rk").localCheckpoint())
    }.get
    assert(key(folded) === global)
  }
}
