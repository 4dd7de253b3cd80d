package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug.codegenStringSeq
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide generated-method-size audit — the systematic form of
  * round 7's lesson: CollapseProject merges staged projections, and a
  * merged expression tree whose generated method passes Janino but
  * exceeds HotSpot's 8000-bytecode huge-method limit runs INTERPRETED —
  * a silent ~100× slowdown that only surfaces at real data sizes (the
  * k=256 cell assignment burned 45 CPU-minutes/core on a million rows
  * before tools/ScalePipeline caught it). Every registered batch
  * query's whole-stage-codegen subtrees are compiled here and their
  * max method bytecode size asserted under the JIT limit.
  */
class CodegenAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    // static plans: codegenStringSeq cannot see inside an unexecuted
    // AdaptiveSparkPlanExec
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val JitHugeMethodLimit = 8000

  private def streamingNames = streaming.StreamQueries.all.map(_.name).toSet

  test("every batch query's generated methods stay under the JIT huge-method limit") {
    assume(new java.io.File(sf).exists())
    val offenders = SparkEntry.allDefs
      .filterNot(d => streamingNames.contains(d.name))
      .flatMap { d =>
        val stats =
          try codegenStringSeq(d.fn(spark, sf).queryExecution.executedPlan)
          catch { case e: Throwable => fail(s"${d.name}: codegen dump failed: $e") }
        stats.flatMap { case (subtree, _, st) =>
          if (st.maxMethodCodeSize <= 0)
            Some(s"${d.name}: compile failure (interpreted fallback) in\n$subtree")
          else if (st.maxMethodCodeSize >= JitHugeMethodLimit)
            Some(s"${d.name}: ${st.maxMethodCodeSize} bytecodes (un-JIT-able) in\n${subtree.linesIterator.take(3).mkString("\n")}")
          else None
        }
      }
    assert(offenders.isEmpty,
      s"un-JIT-able generated methods:\n${offenders.mkString("\n")}")
  }
}
