package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native asymmetric-distance-computation score for product-quantized
  * candidates: Σ_m lut[m][codes[m]] over a per-query lookup table
  * (array<array<double>>, M × Ks) and a candidate's code list
  * (array<int>, M entries).
  *
  * This is THE inner loop of a PQ scan — every (query, candidate) pair
  * pays it, and at 100 TB that is the whole job. The composable form
  * (`aggregate(zip_with(lut, codes, (l, c) -> l[c]), ...)`) allocates an
  * M-element intermediate array and evaluates two lambdas per pair;
  * this expression is M primitive lookups inlined into whole-stage
  * codegen (the DotProductConst/CosineSimilarity lesson).
  *
  * Contract matches the HOF form: score over min(|lut|, |codes|)
  * subspaces; a code outside its table (or a null entry) contributes 0.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_score expects (array<array<double>>, array<int>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = math.min(lut.numElements(), codes.numElements())
    var s = 0.0
    var i = 0
    while (i < m) {
      if (!lut.isNullAt(i) && !codes.isNullAt(i)) {
        val sub = lut.getArray(i)
        val c = codes.getInt(i)
        if (c >= 0 && c < sub.numElements() && !sub.isNullAt(c))
          s += sub.getDouble(c)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      s"""
         |int $m = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$l.isNullAt($i) && !$r.isNullAt($i)) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $sub = $l.getArray($i);
         |    int $c = $r.getInt($i);
         |    if ($c >= 0 && $c < $sub.numElements() && !$sub.isNullAt($c)) {
         |      $s += $sub.getDouble($c);
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_score"
}

object AdcScore {
  def adcScore(lut: Column, codes: Column): Column =
    Bridge.column(AdcScore(Bridge.expression(lut), Bridge.expression(codes)))
}
