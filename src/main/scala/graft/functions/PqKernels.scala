package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Whole-vector PQ kernels as single native expressions. The previous
  * form staged one `greatest(struct(dot_const ...))` argmax per subspace
  * and relied on withColumn staging to bound generated-method size — but
  * CollapseProject merges the stages back into one Project, and the
  * merged M×Ks unrolled expression tree generated a 34 375-bytecode
  * method (PqCodegenSpec), 4× over HotSpot's 8000-bytecode huge-method
  * limit, so the encode hot loop ran un-JIT-compiled. Here codegen emits
  * ONE call into a static JIT-compiled loop nest over a flattened
  * constant codebook (shipped once per task via the references array),
  * identical for eval and codegen paths, with generated methods of a few
  * dozen bytecodes.
  */
object PqKernels {

  /** codes(m) = argmax_j (<x_m, c_mj> - ||c_mj||²/2), ties to lowest j —
    * exactly the old greatest-over-(score, -code, code) ordering.
    */
  def encode(a: ArrayData, cb: Array[Double], halfs: Array[Double],
             m: Int, subDim: Int, ks: Int): ArrayData = {
    val n = a.numElements()
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < ks) {
        val base = (mm * ks + j) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          val idx = mm * subDim + i
          if (idx < n) dot += a.getFloat(idx).toDouble * cb(base + i)
          i += 1
        }
        val score = dot - halfs(mm * ks + j)
        if (score > bestScore) { bestScore = score; best = j }
        j += 1
      }
      codes(mm) = best
      mm += 1
    }
    new GenericArrayData(codes)
  }

  /** lut(m)(j) = <x_m, c_mj> — the per-query ADC table. */
  def luts(a: ArrayData, cb: Array[Double],
           m: Int, subDim: Int, ks: Int): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](m)
    var mm = 0
    while (mm < m) {
      val row = new Array[Double](ks)
      var j = 0
      while (j < ks) {
        val base = (mm * ks + j) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          val idx = mm * subDim + i
          if (idx < n) dot += a.getFloat(idx).toDouble * cb(base + i)
          i += 1
        }
        row(j) = dot
        j += 1
      }
      out(mm) = new GenericArrayData(row)
      mm += 1
    }
    new GenericArrayData(out)
  }

  /** Flattens codebooks(m)(j)(i) row-major and precomputes the
    * half-squared-norm table the encode argmax subtracts.
    */
  def flatten(codebooks: Array[Array[Array[Double]]],
              subDim: Int): (Array[Double], Array[Double]) = {
    val m = codebooks.length
    val ks = if (m == 0) 0 else codebooks(0).length
    val cb = new Array[Double](m * ks * subDim)
    val halfs = new Array[Double](m * ks)
    for (mm <- 0 until m; j <- 0 until ks) {
      val ct = codebooks(mm)(j)
      var s = 0.0
      for (i <- 0 until subDim) {
        cb((mm * ks + j) * subDim + i) = ct(i)
        s += ct(i) * ct(i)
      }
      halfs(mm * ks + j) = s / 2.0
    }
    (cb, halfs)
  }

  /** Nearest-cell argmax: best dot against k flattened centroids, ties
    * to the LOWEST cell id (the lexicographic (sim, -cell, cell) max the
    * old greatest-over-structs form computed).
    */
  def nearestCell(a: ArrayData, cb: Array[Double], cells: Array[Long],
                  dim: Int): Long = {
    val n = math.min(a.numElements(), dim)
    var best = 0
    var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < cells.length) {
      val base = j * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * cb(base + i); i += 1 }
      if (dot > bestDot || (dot == bestDot && cells(j) < cells(best))) {
        bestDot = dot; best = j
      }
      j += 1
    }
    cells(best)
  }

  def pqCodes(v: Column, codebooks: Array[Array[Array[Double]]], subDim: Int): Column = {
    val (cb, halfs) = flatten(codebooks, subDim)
    Bridge.column(PqEncodeCodes(Bridge.expression(v), cb, halfs,
      codebooks.length, subDim, if (codebooks.isEmpty) 0 else codebooks(0).length))
  }

  def pqLuts(v: Column, codebooks: Array[Array[Array[Double]]], subDim: Int): Column = {
    val (cb, _) = flatten(codebooks, subDim)
    Bridge.column(PqLutTable(Bridge.expression(v), cb,
      codebooks.length, subDim, if (codebooks.isEmpty) 0 else codebooks(0).length))
  }
}

/** array<float> → nearest cell id (BIGINT) against constant norm-scaled
  * centroids. Replaces a `greatest` over k (sim, -cell, cell) structs:
  * at k=256 that unrolled form generated a method far over the JIT
  * huge-method limit and ran interpreted — ~100× slower on a
  * million-row assignment pass (caught by tools/ScalePipeline).
  */
case class NearestCellConst(child: Expression, cbFlat: Array[Double],
                            cells: Array[Long], dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PqKernels.nearestCell(v.asInstanceOf[ArrayData], cbFlat, cells, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cbFlat", cbFlat, "double[]")
    val cs = ctx.addReferenceObj("cells", cells, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqKernels.nearestCell($a, $cb, $cs, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_cell"
}

object NearestCellConst {
  /** centroids: (cell, already-norm-scaled vector). */
  def nearestCell(v: Column, centroids: Seq[(Long, Array[Double])]): Column = {
    val dim = centroids.headOption.map(_._2.length).getOrElse(0)
    val cb = new Array[Double](centroids.length * dim)
    val cells = new Array[Long](centroids.length)
    centroids.zipWithIndex.foreach { case ((cell, ct), j) =>
      cells(j) = cell
      System.arraycopy(ct, 0, cb, j * dim, math.min(ct.length, dim))
    }
    Bridge.column(NearestCellConst(Bridge.expression(v), cb, cells, dim))
  }
}

/** array<float> → array<int> of M PQ codes against a constant codebook. */
case class PqEncodeCodes(child: Expression, cbFlat: Array[Double],
                         halfs: Array[Double], m: Int, subDim: Int, ks: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], cbFlat, halfs, m, subDim, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cbFlat", cbFlat, "double[]")
    val hf = ctx.addReferenceObj("halfs", halfs, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqKernels.encode($a, $cb, $hf, $m, $subDim, $ks);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_codes"
}

/** array<float> → array<array<double>> ADC lookup table. */
case class PqLutTable(child: Expression, cbFlat: Array[Double],
                      m: Int, subDim: Int, ks: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_luts expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PqKernels.luts(v.asInstanceOf[ArrayData], cbFlat, m, subDim, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cbFlat", cbFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqKernels.luts($a, $cb, $m, $subDim, $ks);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_luts"
}

/** Exact nearest-centroid by squared L2 over a constant centroid table,
  * ties to the lowest centroid index — the assignment step of Lloyd's
  * k-means as one native kernel call (same JIT-compiled-loop rationale
  * as NearestCellConst, which is the max-DOT form used by IVF and
  * cannot express the per-centroid ||c||² bias min-L2 needs). Over
  * integer-valued inputs below 2^24 every product and partial sum is an
  * exactly-represented integer in double arithmetic, so the result is
  * bit-deterministic and engine-independent — the property the
  * quantized k-means oracle relies on.
  */
object CentroidL2 {
  /** argmin_j ||a - c_j||², ties to lowest j; -1 on an empty table. */
  def nearestL2(a: ArrayData, cb: Array[Double], k: Int, dim: Int): Long = {
    val n = math.min(a.numElements(), dim)
    var best = -1L
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      val base = j * dim
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val diff = a.getFloat(i).toDouble - cb(base + i)
        d2 += diff * diff
        i += 1
      }
      if (d2 < bestD) { bestD = d2; best = j }
      j += 1
    }
    best
  }

  /** min_j ||a - c_j||² as a long (exact for integer-valued inputs);
    * -1 on an empty table.
    */
  def minDistL2(a: ArrayData, cb: Array[Double], k: Int, dim: Int): Long = {
    val n = math.min(a.numElements(), dim)
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      val base = j * dim
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val diff = a.getFloat(i).toDouble - cb(base + i)
        d2 += diff * diff
        i += 1
      }
      if (d2 < bestD) bestD = d2
      j += 1
    }
    if (j == 0) -1L else bestD.toLong
  }

  def nearest(v: Column, centroids: Seq[Array[Double]]): Column =
    Bridge.column(NearestCentroidL2(Bridge.expression(v),
      flat(centroids), centroids.length, dimOf(centroids)))

  def minDist(v: Column, centroids: Seq[Array[Double]]): Column =
    Bridge.column(MinCentroidDistL2(Bridge.expression(v),
      flat(centroids), centroids.length, dimOf(centroids)))

  private def dimOf(cs: Seq[Array[Double]]): Int =
    cs.headOption.map(_.length).getOrElse(0)

  private def flat(cs: Seq[Array[Double]]): Array[Double] = {
    val dim = dimOf(cs)
    val cb = new Array[Double](cs.length * dim)
    cs.zipWithIndex.foreach { case (c, j) =>
      System.arraycopy(c, 0, cb, j * dim, math.min(c.length, dim))
    }
    cb
  }
}

/** array<float> → centroid index with the minimum squared L2 distance. */
case class NearestCentroidL2(child: Expression, cbFlat: Array[Double],
                             k: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_l2 expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    CentroidL2.nearestL2(v.asInstanceOf[ArrayData], cbFlat, k, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cbFlat", cbFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CentroidL2.nearestL2($a, $cb, $k, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid_l2"
}

/** array<float> → minimum squared L2 distance to the constant table. */
case class MinCentroidDistL2(child: Expression, cbFlat: Array[Double],
                             k: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_centroid_dist_l2 expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    CentroidL2.minDistL2(v.asInstanceOf[ArrayData], cbFlat, k, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cbFlat", cbFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CentroidL2.minDistL2($a, $cb, $k, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "min_centroid_dist_l2"
}
