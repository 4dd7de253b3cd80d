package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** One-permutation MinHash signature of a shingle-hash set, as a single
  * per-row pass: bin = shingle mod `perms`, min per bin, empty bins
  * densified by rotation (borrow the min of the nearest non-empty bin to
  * the right, wrapping — Shrivastava & Li, "Densifying One Permutation
  * Hashing via Rotation", ICML 2014). Rotation keeps the collision
  * probability of every signature position an unbiased Jaccard estimate;
  * a fixed per-bin sentinel would make all short docs agree on their
  * empty bins and inflate LSH candidate volume.
  *
  * This turns signature computation into a map-side scan — the previous
  * formulation (explode → groupBy(doc, bin) → groupBy(doc)) shuffled
  * every (doc, shingle) pair twice; at 100 TB that's the difference
  * between a full-corpus shuffle and none at all.
  */
case class MinHashSig(child: Expression, perms: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HashKernels.minhash(v.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minhash($c, $perms);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def minhashSig(c: Column, perms: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), perms))
}
