package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** All hyperplane-LSH table signatures of a float vector in ONE native
  * kernel: table t's signature sets bit p iff
  * <v, plane_{offset + t·nPlanes + p}> > 0. The composable form — an
  * `array()` of per-table sums of `CASE WHEN dot_const(...) > 0` bits —
  * unrolled 64 dot loops + CASE chains into a 29 523-bytecode generated
  * method, far past the JIT huge-method limit, so the signature scan ran
  * un-JIT-compiled (CodegenAuditSpec). Codegen here is a single call
  * into a static JIT-compiled t×p×dim loop nest over the flattened
  * constant plane table.
  */
case class LshSigsConst(child: Expression, planesFlat: Array[Double],
                        dim: Int, nPlanes: Int, offset: Int, nTables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sigs expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    LshSigs.sigs(v.asInstanceOf[ArrayData], planesFlat, dim, nPlanes, offset, nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pl = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshSigs.sigs($a, $pl, $dim, $nPlanes, $offset, $nTables);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lsh_sigs"
}

object LshSigs {

  def sigs(a: ArrayData, planes: Array[Double], dim: Int,
           nPlanes: Int, offset: Int, nTables: Int): ArrayData = {
    val n = math.min(a.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        val base = (offset + t * nPlanes + p) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += a.getFloat(i).toDouble * planes(base + i); i += 1 }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  /** planes: row-major [nTotalPlanes][dim]. */
  def lshSigs(v: Column, planes: Array[Array[Double]], nPlanes: Int,
              offset: Int, nTables: Int): Column = {
    val dim = if (planes.isEmpty) 0 else planes(0).length
    val flat = new Array[Double](planes.length * dim)
    planes.indices.foreach(j => System.arraycopy(planes(j), 0, flat, j * dim, dim))
    Bridge.column(LshSigsConst(Bridge.expression(v), flat, dim, nPlanes, offset, nTables))
  }
}
