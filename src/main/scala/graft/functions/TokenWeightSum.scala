package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Hashed bag-of-words linear score: Σ over token occurrences of
  * `weights[floorMod(hash(token), weights.length)]` — the inference hot
  * path of a fasttext/CCNet-style linear quality classifier. The learned
  * weight vector ships once per task as a codegen reference object (like
  * [[DotProductConst]]); each row is one primitive loop over its tokens,
  * no feature vector is ever materialized. Token hash is FNV-1a 64 over
  * the raw UTF-8 bytes (FnvKernels.fnvUtf8 — no String allocation per
  * token); the training-side featurizer uses the identical hash so
  * train/serve features agree bit-for-bit, and FNV keeps the bucket
  * assignment SQL-expressible so the trained model's scoring pass
  * replays in the DuckDB oracle (the LSH dedup family's hash choice,
  * for the same reason — murmur3 would be opaque to the replay).
  */
case class TokenWeightSum(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_weight_sum expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        s += weights(java.lang.Math.floorMod(
          FnvKernels.fnvUtf8(a.getUTF8String(i)), weights.length.toLong).toInt)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $s += $w[(int) java.lang.Math.floorMod(
         |      graft.functions.FnvKernels.fnvUtf8($a.getUTF8String($i)), (long) $w.length)];
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_weight_sum"
}

object TokenWeightSum {
  def tokenWeightSum(tokens: Column, weights: Array[Double]): Column =
    Bridge.column(TokenWeightSum(Bridge.expression(tokens), weights))

  /** The matching featurizer-side bucket index for a token. */
  def bucket(token: String, dim: Int): Int =
    java.lang.Math.floorMod(
      FnvKernels.fnvUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(token)),
      dim.toLong).toInt
}
