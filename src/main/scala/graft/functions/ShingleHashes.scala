package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle hashing for the dedup pipeline. The composable form
  * (`transform(sequence(...), i -> xxhash64(substring/slice ...))`)
  * allocates a position array plus a substring per window; these
  * expressions do one scan with xxHash64 over byte/long windows, and
  * their doGenCode emits a direct static-kernel call so the scan stage
  * stays inside whole-stage codegen (HashKernels scaladoc). Inputs
  * shorter than one window hash as a single whole-input shingle.
  */

/** Distinct xxHash64 of every n-byte window of a string. */
case class CharNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HashKernels.charNgram(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.charNgram($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_ngram_hashes"
}

/** Distinct xxHash64 of every w-element window of an array<long>
  * (pre-hashed tokens → word shingles).
  */
case class LongWindowHashes(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_window_hashes expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HashKernels.longWindows(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.longWindows($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "long_window_hashes"
}

/** ALL w-element window hashes of an array<long> in position order
  * (no dedup; empty when shorter than one window) — the
  * position-preserving sibling of LongWindowHashes, for
  * span-coverage math where the window's start index matters.
  */
case class LongWindowHashesAll(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_window_hashes_all expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HashKernels.longWindowsAll(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.longWindowsAll($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "long_window_hashes_all"
}

/** Distinct winnowing fingerprints of a string: window-min over
  * polynomial k-gram hashes (HashKernels.winnow — one O(len) deque pass;
  * the composable HOF form paid O(len·w) array slicing plus an md5
  * string per gram and benched ~10× slower at sf0.1).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HashKernels.winnow(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.winnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

/** Fused normalize + n-gram hash: equivalent to
  * `char_ngram_hashes(trim(regexp_replace(lower(s), '[^a-z0-9]+', ' ')), n)`
  * as one byte scan — lower-fold, collapse non-alnum runs to a single
  * space, trim, then the n-byte window hashes. The composable chain's
  * inlined lower/regexp/trim codegen pushed the char-shingle signature
  * projection past the JIT huge-method limit (CodegenAuditSpec). Same
  * fold-into-ASCII caveat as ascii_tokens (~3 code points).
  */
case class NormCharNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_char_ngram_hashes expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.normCharNgram(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.normCharNgram($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "norm_char_ngram_hashes"
}

object ShingleHashes {

  /** Byte-level normalize (lower-fold, non-alnum runs → one space, trim)
    * then delegate to the charNgram kernel over the normalized bytes.
    */
  def normCharNgram(str: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = str.getBytes
    val buf = new Array[Byte](s.length)
    var out = 0
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val b0 = s(i)
      val b = if (b0 >= 'A' && b0 <= 'Z') (b0 + 32).toByte else b0
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && out > 0) { buf(out) = ' '; out += 1 }
        pendingSpace = false
        buf(out) = b
        out += 1
      } else pendingSpace = true
      i += 1
    }
    HashKernels.charNgram(UTF8String.fromBytes(buf, 0, out), n)
  }

  def charNgramHashes(c: Column, n: Int): Column =
    Bridge.column(CharNgramHashes(Bridge.expression(c), n))
  def normCharNgramHashes(c: Column, n: Int): Column =
    Bridge.column(NormCharNgramHashes(Bridge.expression(c), n))
  def longWindowHashes(c: Column, w: Int): Column =
    Bridge.column(LongWindowHashes(Bridge.expression(c), w))
  def longWindowHashesAll(c: Column, w: Int): Column =
    Bridge.column(LongWindowHashesAll(Bridge.expression(c), w))
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), k, w))
}
