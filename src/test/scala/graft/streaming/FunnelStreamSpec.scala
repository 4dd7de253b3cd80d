package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Funnel state-machine semantics on hand-built event sequences,
  * including out-of-order arrival inside the reorder buffer and the
  * strict first-occurrence ordering constraint.
  */
class FunnelStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ev(id: Long, t: String, user: Long, tpe: String): EventStream.Event =
    EventStream.Event(id, java.sql.Timestamp.valueOf(t), user, tpe, 1.0)

  private def run(events: Seq[EventStream.Event]): Map[Long, Long] = {
    import spark.implicits._
    EventStream.funnel(events.toDS()).collect()
      .map(h => h.user_id -> h.completed_us).toMap
  }

  test("completion uses first qualifying occurrence of each step") {
    val out = run(Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view"),
      ev(2, "2024-01-01 10:05:00", 1, "click"),
      ev(3, "2024-01-01 10:06:00", 1, "click"),     // later click ignored
      ev(4, "2024-01-01 10:10:00", 1, "purchase"),
      ev(5, "2024-01-01 10:11:00", 1, "purchase"))) // no double-emit
    val expect = java.sql.Timestamp.valueOf("2024-01-01 10:10:00").getTime * 1000L
    assert(out == Map(1L -> expect), s"got $out")
  }

  test("steps out of order never complete; equal timestamps don't qualify") {
    val out = run(Seq(
      // u2: click before any view — view then arrives, no later click
      ev(1, "2024-01-01 09:00:00", 2, "click"),
      ev(2, "2024-01-01 09:30:00", 2, "view"),
      ev(3, "2024-01-01 09:40:00", 2, "purchase"),
      // u3: click exactly at the view timestamp — strict > excludes it
      ev(4, "2024-01-01 11:00:00", 3, "view"),
      ev(5, "2024-01-01 11:00:00", 3, "click"),
      ev(6, "2024-01-01 11:30:00", 3, "purchase")))
    assert(out.isEmpty, s"got $out")
  }

  test("out-of-order arrival inside the reorder buffer is resequenced") {
    // delivered purchase-first; heap replays them in ts order
    val out = run(Seq(
      ev(3, "2024-01-01 12:20:00", 4, "purchase"),
      ev(2, "2024-01-01 12:10:00", 4, "click"),
      ev(1, "2024-01-01 12:00:00", 4, "view")))
    val expect = java.sql.Timestamp.valueOf("2024-01-01 12:20:00").getTime * 1000L
    assert(out == Map(4L -> expect), s"got $out")
  }

  test("sub-millisecond timestamps keep microsecond precision") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00.123456")
    assert(EventStream.tsToMicros(t) ==
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L + 123456L)
  }
}
