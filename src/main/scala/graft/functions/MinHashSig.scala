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

/** LSH band buckets of a MinHash signature: bucket b = the chained
  * xxhash64 of signature rows [b·r, b·r+r) — BIT-IDENTICAL to Spark's
  * variadic `xxhash64(sig[b·r+1], ..., sig[b·r+r])` (left fold of
  * XXH64.hashLong with the running hash as seed, initial seed 42), so
  * persisted MinHash indexes built with the expression form stay
  * probe-compatible. One kernel call replaces nBands inlined hash-mix
  * chains that pushed the banding stage past the JIT huge-method limit
  * (CodegenAuditSpec).
  */
case class MinHashBandBuckets(child: Expression, perms: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_buckets expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    MinHashSig.bandBuckets(v.asInstanceOf[ArrayData], perms, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.bandBuckets($c, $perms, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_band_buckets"
}

object MinHashSig {
  def minhashSig(c: Column, perms: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), perms))

  def bandBuckets(sig: ArrayData, perms: Int, r: Int): ArrayData = {
    val nBands = perms / r
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 42L
      var i = 0
      while (i < r) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
          sig.getLong(b * r + i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def bandBucketsCol(c: Column, perms: Int, rowsPerBand: Int): Column =
    Bridge.column(MinHashBandBuckets(Bridge.expression(c), perms, rowsPerBand))
}
