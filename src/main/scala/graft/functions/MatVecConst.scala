package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Constant-matrix rotation of a float-vector column:
  * out(c) = (float)(Σ_i x_i·rows(c)(i) − offs(c)) — the centered
  * projection z = V·x − V·μ used by the PCA/OPQ family, as ONE native
  * kernel call. The unrolled form (an `array(...)` of 64 per-component
  * `dot_const` casts) was value-identical but generated a 12 141-byte
  * method — over HotSpot's 8000-byte huge-method limit, so the rotation
  * hot loop ran un-JIT-compiled (same failure mode PqKernels documents
  * at its header). Here the matrix ships once per task via the
  * references array and eval/codegen share one static loop nest.
  *
  * Arithmetic is kept EXACTLY as the unrolled form computed it: the dot
  * accumulates in double in ascending element order, the offset
  * subtracts in double, and only the final value narrows to float — so
  * the replayed-literal oracles of ann_pca_topk/embedding_pca/
  * ann_opq_topk hash-match unchanged.
  */
object MatVecKernel {
  /** rowsFlat is row-major [nRows × dim]; the input vector is read up to
    * min(dim, |x|) per row (short inputs zero-extend, long ones
    * truncate — dot_const's min(n, |w|) contract).
    */
  def rotate(a: ArrayData, rowsFlat: Array[Double], offs: Array[Double],
             dim: Int): ArrayData = {
    val nRows = offs.length
    val n = math.min(a.numElements(), dim)
    val out = new Array[Float](nRows)
    var c = 0
    while (c < nRows) {
      val base = c * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * rowsFlat(base + i); i += 1 }
      out(c) = (dot - offs(c)).toFloat
      c += 1
    }
    new GenericArrayData(out)
  }
}

case class MatVecConst(child: Expression, rowsFlat: Array[Double],
                       offs: Array[Double], dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"matvec_const expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    MatVecKernel.rotate(v.asInstanceOf[ArrayData], rowsFlat, offs, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rf = ctx.addReferenceObj("rowsFlat", rowsFlat, "double[]")
    val of = ctx.addReferenceObj("offs", offs, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MatVecKernel.rotate($a, $rf, $of, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "matvec_const"
}

object MatVecConst {
  /** rows: projection rows V_c; offs: the precomputed V_c·μ offsets. */
  def matVec(v: Column, rows: Array[Array[Double]], offs: Array[Double]): Column = {
    require(rows.length == offs.length, "rows/offsets length mismatch")
    val dim = rows.headOption.map(_.length).getOrElse(0)
    val flat = new Array[Double](rows.length * dim)
    rows.zipWithIndex.foreach { case (r, c) =>
      System.arraycopy(r, 0, flat, c * dim, math.min(r.length, dim))
    }
    Bridge.column(MatVecConst(Bridge.expression(v), flat, offs, dim))
  }
}
