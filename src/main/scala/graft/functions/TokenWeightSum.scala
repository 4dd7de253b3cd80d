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
  * no feature vector is ever materialized. Token hash is
  * `UTF8String.hashCode` (Spark's murmur3 over the raw bytes), computed
  * directly on the array slots — no String allocation per token — and
  * the training-side featurizer uses the identical hash so train/serve
  * features agree bit-for-bit.
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
        s += weights(java.lang.Math.floorMod(a.getUTF8String(i).hashCode, weights.length))
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
         |    $s += $w[java.lang.Math.floorMod($a.getUTF8String($i).hashCode(), $w.length)];
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
      org.apache.spark.unsafe.types.UTF8String.fromString(token).hashCode, dim)
}
