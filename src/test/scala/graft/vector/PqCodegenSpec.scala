package graft.vector

import graft.util.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug.codegenStringSeq
import org.scalatest.funsuite.AnyFunSuite

/** Proves (rather than assumes) that the PQ encode / LUT projections
  * survive whole-stage codegen AT JIT-ABLE METHOD SIZES. The per-subspace
  * withColumn staging in PqOps is collapsed back into one Project by
  * CollapseProject, so all M×Ks DotProductConst loops land in one
  * generated class — what keeps it viable is CodegenContext's automatic
  * expression splitting into sub-methods. This spec compiles the actual
  * generated code and asserts every method stays under the HotSpot
  * huge-method limit (8000 bytecodes), above which the JIT refuses the
  * method and the hot loop runs interpreted bytecode. A Janino compile
  * failure (the silent interpreted-expression fallback) also fails here,
  * because codegenStringSeq reports it as a missing/oversized compile.
  */
class PqCodegenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    // static plans: codegenStringSeq cannot see inside an unexecuted
    // AdaptiveSparkPlanExec, and the codegen shape is the same either way
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val JitHugeMethodLimit = 8000

  test("PQ encode's collapsed projection compiles with every method JIT-able") {
    assume(new java.io.File(sf).exists())
    val c = Tables(spark, sf, "embeddings")
    val codebooks = PqOps.trainCodebooks(c)
    val df = PqOps.encode(c, codebooks)
    val stats = codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty, "encode fell out of whole-stage codegen entirely")
    stats.foreach { case (subtree, _, st) =>
      assert(st.maxMethodCodeSize > 0,
        s"codegen failed to compile (silent interpreted fallback):\n$subtree")
      assert(st.maxMethodCodeSize < JitHugeMethodLimit,
        s"generated method ${st.maxMethodCodeSize} bytecodes exceeds the " +
          s"JIT huge-method limit in subtree:\n$subtree")
    }
  }

  test("cell assignment at k=256 compiles with every method JIT-able") {
    // the size at which the old greatest-over-structs form blew the JIT
    // limit and a 1M-row ScalePipeline assignment pass ran interpreted
    assume(new java.io.File(sf).exists())
    val centroids = (0L until 256L).map(c =>
      (c, Seq.tabulate(64)(i => ((c * 31 + i) % 97).toDouble / 97.0)))
    val df = VectorOps.assignCells(Tables(spark, sf, "embeddings"), centroids)
    val stats = codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty, "assignment fell out of whole-stage codegen")
    stats.foreach { case (subtree, _, st) =>
      assert(st.maxMethodCodeSize > 0,
        s"codegen failed to compile (silent interpreted fallback):\n$subtree")
      assert(st.maxMethodCodeSize < JitHugeMethodLimit,
        s"generated method ${st.maxMethodCodeSize} bytecodes exceeds the " +
          s"JIT huge-method limit in subtree:\n$subtree")
    }
  }

  test("ADC scan (LUT build + score) compiles with every method JIT-able") {
    assume(new java.io.File(sf).exists())
    val df = PqOps.pqTopK(spark, sf)
    val stats = codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty)
    stats.foreach { case (subtree, _, st) =>
      assert(st.maxMethodCodeSize > 0,
        s"codegen failed to compile (silent interpreted fallback):\n$subtree")
      assert(st.maxMethodCodeSize < JitHugeMethodLimit,
        s"generated method ${st.maxMethodCodeSize} bytecodes exceeds the " +
          s"JIT huge-method limit in subtree:\n$subtree")
    }
  }
}
