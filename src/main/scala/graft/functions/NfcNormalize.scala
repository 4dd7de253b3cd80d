package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * standard first step of a text-curation pipeline (canonical-compose
  * accents, canonical singletons like U+212B ANGSTROM SIGN → U+00C5) so
  * that exact dedup, shingling and token counts see one byte form per
  * canonically-equal string.
  *
  * Spark ships no built-in for this (the usual fallback is a Scala UDF,
  * which breaks whole-stage codegen and pays per-row encoder overhead).
  * This expression stays inside codegen and fast-paths the dominant case:
  * ASCII bytes can never change under NFC, so a vectorizable byte scan
  * skips `java.text.Normalizer` entirely for ASCII rows — at web scale
  * the overwhelming majority — and `Normalizer.isNormalized` (quick-check
  * property, no allocation) covers most of the rest; only rows that
  * actually need composing pay the String round-trip.
  *
  * Semantics match DuckDB's `nfc_normalize` (utf8proc NFC) for the
  * oracle comparison — both implement Unicode canonical composition.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Static kernel: generated code calls this directly so the stage stays
    * inside whole-stage codegen (HashKernels rationale).
    */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column wrapper. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
