package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Hashing-trick text embedding (Weinberger et al. 2009, the
  * feature-hashing encoder behind Vowpal Wabbit / sklearn
  * HashingVectorizer): token hash h lands in dimension ((h mod d)+d)
  * mod d with sign(h) as its contribution, accumulated then
  * L2-normalized. One kernel call per document over the FNV token
  * hashes — the corpus→vector "embed" stage as a pure shuffle-free map,
  * with the same output contract (unit-norm double vector) as a learned
  * encoder, so the ANN/semantic-dedup family downstream swaps encoders
  * 1:1. Deterministic and SQL-expressible: the FNV fold replays in
  * DuckDB (the LSH dedup precedent) and the normalize is exact-integer
  * sums through IEEE sqrt/divide — bit-identical across engines.
  */
object FeatureHashKernel {
  /** th: per-token signed FNV-1a hashes. Returns the unit-L2 d-dim
    * signed-count vector (all-zero input or full cancellation → zeros).
    */
  def embed(th: ArrayData, dim: Int): ArrayData = {
    val acc = new Array[Long](dim)
    var i = 0
    val n = th.numElements()
    while (i < n) {
      val h = th.getLong(i)
      val idx = (((h % dim) + dim) % dim).toInt
      acc(idx) += (if (h < 0) -1L else 1L)
      i += 1
    }
    var ss = 0.0
    var d = 0
    while (d < dim) { ss += acc(d).toDouble * acc(d).toDouble; d += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Double](dim)
    d = 0
    while (d < dim) { out(d) = if (nrm > 0) acc(d).toDouble / nrm else 0.0; d += 1 }
    new GenericArrayData(out)
  }
}

case class FeatureHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_hash_embed expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    FeatureHashKernel.embed(v.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FeatureHashKernel.embed($a, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "feature_hash_embed"
}

object FeatureHashEmbed {
  def featureEmbed(tokenHashes: Column, dim: Int): Column =
    Bridge.column(FeatureHashEmbed(Bridge.expression(tokenHashes), dim))
}
