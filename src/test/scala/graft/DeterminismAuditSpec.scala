package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide output-order determinism audit: every query with a DuckDB
  * oracle must either end in a global Sort (so the row order the driver
  * hashes is a pure function of the data) or be provably single-row (an
  * ungrouped aggregate), and its oracle SQL must carry the matching
  * terminal ORDER BY. Without this, an aggregate tail leaves rows in
  * partition order — which varies with cpu count and AQE — and any
  * row-order-sensitive comparison flips nondeterministically
  * (CORRECTNESS_r06's text_vocab_stats red row).
  */
class DeterminismAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Streaming queries run a full stream on construction; their memory-sink
    * read-back order is checked by their own specs and the driver's
    * comparison has proven order-insensitive for them across six rounds
    * (e.g. stream_windows, 8953 unsorted rows, hash-green). Audited for
    * the ORDER BY on the SQL side only where they sort.
    */
  private def streamingNames = streaming.StreamQueries.all.map(_.name).toSet

  /** True when the plan's terminal shape pins a deterministic output order:
    * a global Sort possibly under projections/limits, or an ungrouped
    * (single-row) aggregate.
    */
  private def deterministicTail(p: LogicalPlan): Boolean = p match {
    // ≤1 output row has exactly one order; this also covers shapes the
    // optimizer rewrites past the Aggregate case below, e.g. the join
    // of two ungrouped aggregates in sketch_merge_audit (whose terminal
    // sort EliminateSorts removes precisely because maxRows is 1)
    case _ if p.maxRows.exists(_ <= 1L) => true
    case s: Sort if s.global => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case proj: Project => deterministicTail(proj.child)
    case l: GlobalLimit => deterministicTail(l.child)
    case l: LocalLimit => deterministicTail(l.child)
    case a: SubqueryAlias => deterministicTail(a.child)
    case f: Filter => deterministicTail(f.child)
    case w: WithCTE => deterministicTail(w.plan)
    case _ => false
  }

  test("every oracled batch query pins its output order (terminal Sort or single-row)") {
    assume(new java.io.File(sf).exists())
    val offenders = SparkEntry.allDefs
      .filter(_.oracle.isDefined)
      .filterNot(d => streamingNames.contains(d.name))
      .flatMap { d =>
        val plan = d.fn(spark, sf).queryExecution.optimizedPlan
        if (deterministicTail(plan)) None
        else Some(s"${d.name}: ${plan.nodeName} tail — add a terminal orderBy (and ORDER BY in the oracle SQL)")
      }
    assert(offenders.isEmpty, s"order-nondeterministic oracled queries:\n${offenders.mkString("\n")}")
  }
}
