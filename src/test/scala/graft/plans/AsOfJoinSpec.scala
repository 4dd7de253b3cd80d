package graft.plans

import graft.operators.AsOfJoinOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator as-of join: semantics against the composed
  * window route on real data, merge-pass edge cases on fixtures, and
  * the physical plan contract (one exchange + sort per side planned by
  * EnsureRequirements, no window, no join blowup).
  */
class AsOfJoinSpec extends AnyFunSuite {

  // own newSession(): asofJoin self-installs an extra planner strategy,
  // which is session-scoped state like MvRewriteSpec's conf
  lazy val spark: SparkSession = {
    val base = SparkSession.builder()
      .master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val s = base.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  private def fixture(rows: Seq[(Long, Long, Long, Double)], name: String): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "k", "ts_us", "v")
  }

  test("custom operator matches the composed j6 window route on events") {
    assume(new java.io.File(sf).exists())
    val custom = AsOfJoinOps.j6AsofCustom.fn(spark, sf)
      .collect().map(_.toSeq).toSet
    val composed = graft.operators.Relational.j6AsofJoin.fn(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(custom.nonEmpty)
    assert(custom === composed)
  }

  test("physical plan: AsOfJoinExec with one exchange and sort per side, no window") {
    assume(new java.io.File(sf).exists())
    val df = AsOfJoinOps.j6AsofCustom.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString()
    assert(countNodes(plan, "AsOfJoinExec") === 1, s"custom exec missing:\n$s")
    assert(!s.contains("WindowExec") && !s.contains("Window "),
      s"window materialization crept in:\n$s")
    // EnsureRequirements must have planned a keyed exchange and a
    // (keys, ts[, tiebreak]) sort for each side — and nothing more
    assert(countNodes(plan, "ShuffleExchangeExec") === 2, s"plan:\n$s")
    assert(countNodes(plan, "SortExec") === 2, s"plan:\n$s")
    // the events scans must stay pruned: neither side reads props
    assert(!s.contains("props"), s"column pruning lost:\n$s")
  }

  private def countNodes(p: SparkPlan, name: String): Int = {
    var n = 0
    def walk(q: SparkPlan): Unit = {
      if (q.getClass.getSimpleName.startsWith(name)) n += 1
      q match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
        case _ =>
      }
      q.children.foreach(walk)
    }
    walk(p)
    n
  }

  test("equal-ts rows match (allowExactMatches) and tiebreak picks the max") {
    val left = fixture(Seq((1L, 10L, 100L, 0.0), (2L, 10L, 50L, 0.0)), "l")
    val right = fixture(Seq(
      (7L, 10L, 100L, 1.0), (9L, 10L, 100L, 2.0), // same key+ts: id 9 wins
      (3L, 10L, 40L, 5.0)), "r")
    val out = AsOfJoinOps.asofJoin(left.drop("v"), right, Seq("k"), "ts_us", "ts_us",
      Seq("v"), tiebreak = Seq("id"))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 2.0) // ts=100 matches both equal-ts rows, max id wins
    assert(out(2L) === 5.0) // only ts=40 is at-or-before 50
  }

  test("tolerance excludes stale matches; unmatched rows keep left-outer nulls") {
    val left = fixture(Seq((1L, 1L, 1000L, 0.0), (2L, 2L, 1000L, 0.0)), "l")
    val right = fixture(Seq((10L, 1L, 100L, 7.0)), "r")
    val out = AsOfJoinOps.asofJoin(left.drop("v"), right, Seq("k"), "ts_us", "ts_us",
      Seq("v"), toleranceUs = Some(500L))
      .select("id", "v").collect()
    assert(out.forall(_.isNullAt(1)), "900µs-old match must fall outside the 500µs tolerance")
    val out2 = AsOfJoinOps.asofJoin(left.drop("v"), right, Seq("k"), "ts_us", "ts_us",
      Seq("v"), toleranceUs = Some(1000L))
      .select("id", "v").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out2(1L) === Some(7.0))
    assert(out2(2L) === None) // no right rows for key 2 at all
  }

  test("null keys and empty right side") {
    import spark.implicits._
    val left = Seq((1L, Some(10L), 100L), (2L, None: Option[Long], 100L))
      .toDF("id", "k", "ts_us")
    val right = fixture(Seq((5L, 10L, 50L, 3.0)), "r")
    val out = AsOfJoinOps.asofJoin(left.drop("v"), right, Seq("k"), "ts_us", "ts_us", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L)) // matched
    assert(out(2L)) // null key never matches
    val empty = AsOfJoinOps.asofJoin(left, right.filter(lit(false)),
      Seq("k"), "ts_us", "ts_us", Seq("v"))
    assert(empty.count() === 2)
    assert(empty.select("v").collect().forall(_.isNullAt(0)))
  }

  test("row count is always the left count (left outer, no fanout on dup ts)") {
    val left = fixture((1L to 50L).map(i => (i, i % 3, i * 10, 0.0)), "l")
    val right = fixture((1L to 200L).map(i => (i, i % 3, i % 40 * 7, 1.0)), "r")
    val out = AsOfJoinOps.asofJoin(left.drop("v"), right, Seq("k"), "ts_us", "ts_us",
      Seq("v"), tiebreak = Seq("id"))
    assert(out.count() === 50)
  }

  test("forward direction: first at-or-after wins, equal-ts tie to the LOWEST id") {
    import graft.plans.AsOfForward
    val left = fixture(Seq((1L, 10L, 100L, 0.0), (2L, 10L, 150L, 0.0),
      (3L, 10L, 300L, 0.0)), "l")
    val right = fixture(Seq(
      (7L, 10L, 100L, 1.0), (9L, 10L, 100L, 2.0), // equal-ts: id 7 (FIRST) wins
      (4L, 10L, 200L, 5.0)), "r")
    val out = AsOfJoinOps.asofJoin(left.drop("v"), right, Seq("k"), "ts_us", "ts_us",
      Seq("v"), tiebreak = Seq("id"), direction = AsOfForward)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(1.0)) // exact-ts match, lowest id
    assert(out(2L) === Some(5.0)) // next at-or-after 150 is 200
    assert(out(3L) === None) // nothing at-or-after 300
  }

  test("forward tolerance bounds rts - lts") {
    import graft.plans.AsOfForward
    val left = fixture(Seq((1L, 1L, 100L, 0.0)), "l")
    val right = fixture(Seq((5L, 1L, 700L, 3.0)), "r")
    def run(tol: Long) = AsOfJoinOps.asofJoin(left.drop("v"), right,
      Seq("k"), "ts_us", "ts_us", Seq("v"),
      toleranceUs = Some(tol), direction = AsOfForward)
      .select("v").collect()
    assert(run(500L).forall(_.isNullAt(0)), "600µs-ahead match outside 500µs tolerance")
    assert(run(600L).head.getDouble(0) === 3.0)
  }

  test("nearest direction: closer side wins, equal distance prefers backward") {
    import graft.plans.AsOfNearest
    val left = fixture(Seq(
      (1L, 10L, 100L, 0.0), // backward at 90 (Δ10) vs forward at 130 (Δ30) → backward
      (2L, 10L, 125L, 0.0), // backward at 90 (Δ35) vs forward at 130 (Δ5) → forward
      (3L, 10L, 110L, 0.0), // Δ20 both sides → backward preferred
      (4L, 20L, 500L, 0.0)), "l") // no right rows for key 20 → null
    val right = fixture(Seq((5L, 10L, 90L, 1.0), (6L, 10L, 130L, 2.0)), "r")
    val out = AsOfJoinOps.asofJoin(left.drop("v"), right, Seq("k"), "ts_us", "ts_us",
      Seq("v"), tiebreak = Seq("id"), direction = AsOfNearest)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(1.0))
    assert(out(2L) === Some(2.0))
    assert(out(3L) === Some(1.0))
    assert(out(4L) === None)
  }

  test("nearest falls back across sides when tolerance excludes the closer one") {
    import graft.plans.AsOfNearest
    // backward at Δ400, forward at Δ100: nearest picks forward; with a
    // tolerance of 50 both are excluded; with 150 only forward survives
    val left = fixture(Seq((1L, 1L, 1000L, 0.0)), "l")
    val right = fixture(Seq((5L, 1L, 600L, 1.0), (6L, 1L, 1100L, 2.0)), "r")
    def run(tol: Option[Long]) = AsOfJoinOps.asofJoin(left.drop("v"), right,
      Seq("k"), "ts_us", "ts_us", Seq("v"), direction = AsOfNearest,
      toleranceUs = tol).select("v").collect()
    assert(run(None).head.getDouble(0) === 2.0)
    assert(run(Some(150L)).head.getDouble(0) === 2.0)
    assert(run(Some(50L)).forall(_.isNullAt(0)))
    // tolerance excluding forward only: backward (Δ400) survives at 450
    assert(run(Some(450L)).head.getDouble(0) === 2.0) // fwd Δ100 still closer
  }

  test("merge semantics equal a reference nested-loop computation on a random fixture") {
    val rnd = new scala.util.Random(42)
    val lrows = (1L to 300L).map(i => (i, rnd.nextInt(7).toLong, rnd.nextInt(1000).toLong, 0.0))
    val rrows = (1L to 300L).map(i => (i, rnd.nextInt(7).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
    val out = AsOfJoinOps.asofJoin(fixture(lrows, "l").drop("v"), fixture(rrows, "r"),
      Seq("k"), "ts_us", "ts_us", Seq("v"), tiebreak = Seq("id"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val expected = lrows.map { case (id, k, ts, _) =>
      val cands = rrows.filter(r => r._2 == k && r._3 <= ts)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._3, r._1))._4))
    }.toMap
    assert(out === expected)
  }
}
