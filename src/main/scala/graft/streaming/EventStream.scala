package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — greenfield extension
  * (the reference is batch-only, SURVEY §2.8): windowed aggregation with
  * watermarking, and stateful sessionization via flatMapGroupsWithState.
  *
  * The events parquet has shipped as both TIMESTAMP(NANOS)-as-long and
  * TIMESTAMP(MICROS); ingest infers the staged directory's real schema
  * with a batch read and normalizes ts once through Tables.tsMicros —
  * never a hard-coded schema (a hard-coded LongType over a micros file
  * silently reads raw micros and compresses the timeline 1000×).
  */
object EventStream {

  /** File-stream source over a directory of events parquet, ts
    * normalized to TimestampType (µs, UTC session) whatever the
    * physical encoding. The schema-inference batch read touches only
    * footers, not data.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema: StructType = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(graft.util.Tables.tsMicros(schema, "ts")))
  }

  /** 5-minute tumbling-window counts per event type with a 10-minute
    * watermark — the canonical streaming agg. At scale the state store
    * holds one row per (window × type): bounded by the watermark.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  // ---- stateful sessionization ----

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Int, first_ts: Long,
                           last_ts: Long, total_value: Double)
  // not `private`: the streaming state-store encoder generates Java that
  // constructs this class; a private nested case class fails Janino
  // compilation ("no applicable constructor") on the state round-trip
  final case class SessionState(n: Int, first: Long, last: Long, total: Double)

  /** Per-user sessions closed after `gapMs` of inactivity — custom state
    * machine via flatMapGroupsWithState (timeout-driven emission).
    *
    * The state machine needs ts order, but sorting by materializing a
    * user's whole batch would let one hot key OOM an executor. Instead
    * events stream through a bounded min-heap reorder buffer holding at
    * most `maxBufferPerUser` (ts, value) pairs — per-user memory is
    * O(maxBufferPerUser) regardless of batch size. An event displaced
    * further than the buffer is late beyond the reorder horizon and is
    * dropped, the same contract the watermark applies across batches —
    * and counted in `lateDrops` (pass a `sparkContext.longAccumulator`)
    * so an operator can SEE reorder-horizon loss instead of silently
    * shipping a run that undercounted sessions.
    */
  final case class FunnelHit(user_id: Long, completed_us: Long)
  // same Janino visibility note as SessionState
  final case class FunnelState(stage: Int, lastUs: Long)

  /** Timestamp → µs since epoch without precision loss (getTime alone
    * truncates to ms; the sub-ms digits live in getNanos).
    */
  private[streaming] def tsToMicros(t: java.sql.Timestamp): Long = {
    val fracMs = t.getNanos / 1000000L
    (t.getTime - fracMs) * 1000L + t.getNanos / 1000L
  }

  /** Per-user ordered funnel detection as a stateful stream — emits one
    * FunnelHit when a user's events complete `steps` with each step's
    * FIRST occurrence strictly after the previous step's timestamp
    * (exactly the batch events_funnel semantics, so the drained stream
    * is oracle-comparable). State is three numbers per user — bounded
    * by user cardinality, not event volume; a 24/7 deployment would add
    * EventTimeTimeout eviction at its funnel-completion horizon (a
    * drain run never times out, so the simple NoTimeout form keeps the
    * batch/stream paths identical).
    *
    * Events are fed in timestamp order through the same bounded
    * reorder heap as [[sessionize]] — all comparisons are in µs, so
    * strict-inequality step boundaries agree with the oracle's
    * timestamp comparisons digit for digit.
    */
  def funnel(events: Dataset[Event],
             steps: Seq[String] = Seq("view", "click", "purchase"),
             maxBufferPerUser: Int = 1 << 14,
             watermarkDelay: String = "10 minutes"): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    val stepOf: Map[String, Int] = steps.zipWithIndex.toMap
    val nSteps = steps.length
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val hits = Vector.newBuilder[FunnelHit]
          def feed(us: Long, tpe: String): Unit =
            if (st.stage < nSteps && stepOf.get(tpe).contains(st.stage) &&
                (st.stage == 0 || us > st.lastUs)) {
              st = FunnelState(st.stage + 1, us)
              if (st.stage == nSteps) hits += FunnelHit(userId, us)
            }
          val heap = new java.util.PriorityQueue[(Long, String)](
            math.min(maxBufferPerUser, 1 << 10),
            Ordering.by((p: (Long, String)) => p._1))
          def pop(): Unit = { val (us, tpe) = heap.poll(); feed(us, tpe) }
          evs.foreach { e =>
            heap.add((tsToMicros(e.ts), e.event_type))
            if (heap.size > maxBufferPerUser) pop()
          }
          while (!heap.isEmpty) pop()
          state.update(st)
          hits.result().iterator
      }
  }

  final case class EnrichedClick(event_id: Long, user_id: Long, ts_us: Long,
                                 asof_value: Double)
  // same Janino visibility note as SessionState. Carries the retained
  // purchase's (ts_us, event_id) — not just its value — so CROSS-batch
  // reordering keeps as-of semantics: a purchase arriving in a later
  // micro-batch replaces the state only if it is newer by the same
  // (ts_us, event_id) total order the in-batch heap replays, and a late
  // click never matches a purchase whose timestamp is after it.
  final case class AsofState(tsUs: Long, eventId: Long, value: Double,
                             has: Boolean)

  /** Streaming point-in-time enrichment — the stream-stream AS-OF join
    * Spark has no native operator for: every click is emitted with the
    * same user's most recent purchase value at-or-before it. State per
    * user is ONE number (the latest purchase value) — bounded by user
    * cardinality, never event volume; a 24/7 deployment would add
    * EventTimeTimeout eviction for users idle past its horizon.
    *
    * Events replay through the same bounded reorder heap as
    * [[sessionize]], ordered by (µs, kind, event_id) with purchases
    * (kind 0) before clicks at equal µs — so a purchase at the click's
    * exact timestamp is visible to it, and among purchases sharing
    * (user, ts) the max event_id is the one whose value survives:
    * digit-for-digit the batch j6 window semantics, which is what the
    * oracle checks.
    */
  def asofEnrich(events: Dataset[Event],
                 maxBufferPerUser: Int = 1 << 14,
                 watermarkDelay: String = "10 minutes"): Dataset[EnrichedClick] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, EnrichedClick](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[AsofState]) =>
          var st = state.getOption.getOrElse(
            AsofState(Long.MinValue, Long.MinValue, 0.0, has = false))
          val out = Vector.newBuilder[EnrichedClick]
          def feed(us: Long, kind: Int, eid: Long, value: Double): Unit =
            if (kind == 0) {
              // keep the purchase that is latest by (ts_us, event_id) —
              // a late-arriving older purchase must not clobber a newer
              // retained one (cross-batch reordering)
              if (!st.has || us > st.tsUs || (us == st.tsUs && eid > st.eventId))
                st = AsofState(us, eid, value, has = true)
            } else out += EnrichedClick(eid, userId, us,
              // as-of: only a purchase at-or-before the click may enrich
              // it; a late click older than the retained purchase gets
              // the no-match sentinel (the single-value state cannot
              // recover the overwritten older purchase — bounded state
              // traded against full multi-version history, disclosed)
              if (st.has && st.tsUs <= us) st.value else -1.0)
          val heap = new java.util.PriorityQueue[(Long, Int, Long, Double)](
            math.min(maxBufferPerUser, 1 << 10),
            Ordering.by((p: (Long, Int, Long, Double)) => (p._1, p._2, p._3)))
          def pop(): Unit = {
            val (us, kind, eid, v) = heap.poll(); feed(us, kind, eid, v)
          }
          evs.foreach { e =>
            val kind = if (e.event_type == "purchase") 0 else 1
            heap.add((tsToMicros(e.ts), kind, e.event_id, e.value))
            if (heap.size > maxBufferPerUser) pop()
          }
          while (!heap.isEmpty) pop()
          state.update(st)
          out.result().iterator
      }
  }

  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000,
                 maxBufferPerUser: Int = 1 << 14,
                 watermarkDelay: String = "10 minutes",
                 lateDrops: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    // EventTimeTimeout REQUIRES a watermark when the source is a
    // stream (AnalysisException otherwise); on a batch Dataset
    // withWatermark is a no-op, so setting it here keeps one code path
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.n, s.first, s.last, s.total))
          } else {
            var cur = state.getOption
            val closed = Vector.newBuilder[Session]
            var lastFed = Long.MinValue
            def feed(t: Long, v: Double): Unit = cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(SessionState(s.n + 1, s.first, t, s.total + v))
              case Some(s) =>
                closed += Session(userId, s.n, s.first, s.last, s.total)
                cur = Some(SessionState(1, t, t, v))
              case None =>
                cur = Some(SessionState(1, t, t, v))
            }
            val heap = new java.util.PriorityQueue[(Long, Double)](
              math.min(maxBufferPerUser, 1 << 10),
              Ordering.by((p: (Long, Double)) => p._1))
            def pop(): Unit = {
              val (t, v) = heap.poll()
              if (t >= lastFed) { lastFed = t; feed(t, v) }
              else lateDrops.foreach(_.add(1)) // displaced past the reorder horizon
            }
            evs.foreach { e =>
              heap.add((e.ts.getTime, e.value))
              if (heap.size > maxBufferPerUser) pop()
            }
            while (!heap.isEmpty) pop()
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
