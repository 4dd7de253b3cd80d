package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** 64-bit SimHash (Charikar) of a token array in one per-row pass:
  * term frequencies accumulate into 64 signed bit-sums, sign → bit.
  * Replaces explode → groupBy(doc,token) → 64-aggregate (two shuffles)
  * with a map-side expression — the signature, like MinHashSig, belongs
  * in the scan stage, and doGenCode keeps it inside whole-stage codegen
  * via a static-kernel call (HashKernels rationale).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SimHashSig.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashSig.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash_sig"
}

object SimHashSig {

  /** The per-row kernel (static for generated-code calls). */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    // term frequencies (token-hash → tf); weighting matches the previous
    // explode+groupBy formulation (per-token tf, not binary presence)
    val tf = new java.util.HashMap[java.lang.Long, Int](math.min(n, 1 << 10))
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      tf.merge(h, 1, (a, b) => a + b)
      i += 1
    }
    val sums = new Array[Int](64)
    tf.forEach { (h, cnt) =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += cnt else sums(b) -= cnt
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhashSig(c: Column): Column =
    Bridge.column(SimHashSig(Bridge.expression(c)))
}
