package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram repetition statistics as ONE native kernel call.
  *
  * The declarative form (nested transform/sequence lambdas → explode →
  * three hash aggregations) is semantically right but pays interpreted
  * higher-order-function evaluation per gram plus a corpus×9 shuffle of
  * string keys — measured 10.3 s at sf0.1, the slowest query in the
  * bench. The stats are a pure per-document function, so they belong in
  * a map stage: this kernel runs the 9 n-gram passes in a tight
  * JIT-compiled loop with a per-document hash map and returns the 10
  * longs the rule set needs. Same fused-kernel rationale as PqKernels:
  * codegen emits one static call, identical for eval and codegen paths.
  * Per-document transient memory is O(grams in that document), the same
  * bound the explode carried — but nothing is shuffled at all.
  *
  * Output layout: [total_token_chars,
  *   top2, top3, top4,      — max over grams of count × gram_chars
  *   dup5 … dup10]          — Σ over grams with count ≥ 2 of count × chars
  * where gram_chars excludes the joining spaces. Identical values to
  * the exploded form (the DuckDB oracle mirror is unchanged).
  */
object TextKernels {

  private val MinN = 2
  private val MaxN = 10

  def repetitionStats(a: ArrayData): ArrayData = {
    val nTok = a.numElements()
    val toks = new Array[String](nTok)
    var total = 0L
    var i = 0
    while (i < nTok) {
      val t = a.getUTF8String(i).toString
      toks(i) = t
      total += t.length
      i += 1
    }
    val out = new Array[Long](1 + 3 + 6)
    out(0) = total
    var n = MinN
    while (n <= MaxN) {
      if (nTok >= n) {
        // gram -> count; chars derive from key length minus separators
        val counts = new java.util.HashMap[String, Int]()
        val sb = new java.lang.StringBuilder(64)
        var s = 0
        while (s + n <= nTok) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(s + j))
            j += 1
          }
          val key = sb.toString
          counts.put(key, counts.getOrDefault(key, 0) + 1)
          s += 1
        }
        var top = 0L
        var dup = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue.toLong
          val chars = c * (e.getKey.length - (n - 1))
          if (chars > top) top = chars
          if (c >= 2) dup += chars
        }
        if (n <= 4) out(n - 1) = top // slots 1..3 for n = 2..4
        else out(n - 1) = dup        // slots 4..9 for n = 5..10
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  def repetitionStats(toks: Column): Column =
    Bridge.column(RepetitionStatsKernel(Bridge.expression(toks)))
}

/** array<string> tokens → array<long> of 10 repetition statistics. */
case class RepetitionStatsKernel(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernels.repetitionStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.repetitionStats($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}
