package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash kernels for the LSH dedup pipelines.
  *
  * Why a second hash family next to the xxHash64 kernels: the MinHash /
  * SimHash signature VALUES surface in the LSH pipelines' bucketing, so
  * a DuckDB oracle can only replay those pipelines if the hash itself is
  * SQL-expressible. FNV-1a is a strict per-byte left fold —
  * `h = (h ⊕ byte) · prime mod 2⁶⁴` — which DuckDB evaluates exactly as
  * `list_reduce` over HUGEINT with `xor` and a modular multiply (the
  * 131-mod-1e9+7 winnowing hash precedent, upgraded to 64 bits so
  * hash-as-set-proxy stays collision-free at corpus scale). Quality is
  * ample for shingle binning (FNV-1a is the textbook non-cryptographic
  * byte hash); speed is a multiply+xor per byte, same order as xxHash64
  * on the short inputs these paths hash.
  *
  * The xxHash64 kernels (HashKernels/AsciiWordTokens) stay as-is for
  * every path whose hashes never surface in output semantics
  * (jaccard-exact set proxies, TokenizeRewrite's xxhash64 fusion).
  */
object FnvKernels {

  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** FNV-1a over a UTF8String's bytes, no allocation. */
  def fnvUtf8(s: UTF8String): Long = {
    var h = Offset
    var i = 0
    val n = s.numBytes
    while (i < n) {
      h = (h ^ (s.getByte(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }

  /** FNV-1a over a byte range. */
  def fnv(bytes: Array[Byte], from: Int, len: Int): Long = {
    var h = Offset
    var i = from
    val end = from + len
    while (i < end) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }

  /** FNV-1a over the little-endian bytes of `count` longs starting at
    * `from` — the word-shingle / band-bucket combiner.
    */
  def fnvLongs(arr: ArrayData, from: Int, count: Int): Long = {
    var h = Offset
    var j = 0
    while (j < count) {
      val v = arr.getLong(from + j)
      var b = 0
      while (b < 8) {
        h = (h ^ ((v >>> (8 * b)) & 0xffL)) * Prime
        b += 1
      }
      j += 1
    }
    h
  }

  /** ASCII tokenizer + FNV-1a per token — same token boundaries and
    * case-fold as AsciiWordTokens.tokenHashes, FNV instead of xxHash64.
    */
  def tokenHashes(str: UTF8String): ArrayData = {
    val s = str.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    var i = 0
    val n = s.length
    var h = Offset
    var inTok = false
    while (i <= n) {
      val b0 = if (i < n) s(i) else ' '.toByte
      val isTok = (b0 >= 'a' && b0 <= 'z') || (b0 >= '0' && b0 <= '9') ||
        (b0 >= 'A' && b0 <= 'Z')
      if (isTok) {
        val b = if (b0 >= 'A' && b0 <= 'Z') (b0 + 32).toByte else b0
        if (!inTok) { h = Offset; inTok = true }
        h = (h ^ (b & 0xffL)) * Prime
      } else if (inTok) {
        out += h
        inTok = false
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct FNV-1a of every w-element window of an array<long> (LE
    * bytes); whole-array hash when shorter than one window.
    */
  def longWindows(arr: ArrayData, w: Int): ArrayData = {
    val len = arr.numElements()
    if (len < w)
      return new GenericArrayData(Array[Any](fnvLongs(arr, 0, len)))
    val seen = new java.util.HashSet[java.lang.Long](math.min(len, 1 << 12))
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(len, 1 << 12))
    var i = 0
    while (i <= len - w) {
      val h = fnvLongs(arr, i, w)
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct FNV-1a of every n-byte window of the BYTE-NORMALIZED text
    * (lower-fold, non-alnum runs → single space, trim — the
    * ShingleHashes.normCharNgram normalization); whole-input hash when
    * shorter than one window.
    */
  def normCharNgram(str: UTF8String, n: Int): ArrayData = {
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
    if (out < n)
      return new GenericArrayData(Array[Any](fnv(buf, 0, out)))
    val seen = new java.util.HashSet[java.lang.Long](math.min(out, 1 << 12))
    val res = new scala.collection.mutable.ArrayBuffer[Any](math.min(out, 1 << 12))
    i = 0
    while (i <= out - n) {
      val h = fnv(buf, i, n)
      if (seen.add(h)) res += h
      i += 1
    }
    new GenericArrayData(res.toArray)
  }

  /** LSH band buckets of a signature: bucket b = FNV-1a over the LE
    * bytes of signature rows [b·r, b·r+r).
    */
  def bandBuckets(sig: ArrayData, perms: Int, r: Int): ArrayData = {
    val nBands = perms / r
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      out(b) = fnvLongs(sig, b * r, r)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over the FNV token-hash multiset — same vote logic
    * as SimHashSig.simhash with the replayable token hash.
    */
  def simhash(str: UTF8String): Long = {
    val th = tokenHashes(str)
    val n = th.numElements()
    val tf = new java.util.HashMap[java.lang.Long, Int](math.min(n, 1 << 10))
    var i = 0
    while (i < n) {
      tf.merge(th.getLong(i), 1, (a, b) => a + b)
      i += 1
    }
    val sums = new Array[Int](64)
    tf.forEach { (h, cnt) =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += cnt else sums(b) -= cnt
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** string → array<bigint> FNV token hashes (fused tokenize+hash). */
case class FnvTokenHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv_token_hashes expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    FnvKernels.tokenHashes(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FnvKernels.tokenHashes($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fnv_token_hashes"
}

/** array<bigint> → array<bigint> distinct FNV window hashes. */
case class FnvLongWindowHashes(child: Expression, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv_long_window_hashes expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    FnvKernels.longWindows(v.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FnvKernels.longWindows($c, $w);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fnv_long_window_hashes"
}

/** string → array<bigint> distinct normalized char-n-gram FNV hashes. */
case class FnvNormCharNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv_norm_char_ngram_hashes expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    FnvKernels.normCharNgram(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FnvKernels.normCharNgram($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fnv_norm_char_ngram_hashes"
}

/** array<bigint> signature → array<bigint> FNV band buckets. */
case class FnvBandBuckets(child: Expression, perms: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv_band_buckets expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    FnvKernels.bandBuckets(v.asInstanceOf[ArrayData], perms, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FnvKernels.bandBuckets($c, $perms, $rowsPerBand);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fnv_band_buckets"
}

/** string → bigint FNV-token SimHash signature. */
case class FnvSimHashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv_simhash_sig expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    FnvKernels.simhash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FnvKernels.simhash($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fnv_simhash_sig"
}

object FnvHashes {
  def fnvTokenHashes(c: Column): Column =
    Bridge.column(FnvTokenHashes(Bridge.expression(c)))
  def fnvLongWindowHashes(c: Column, w: Int): Column =
    Bridge.column(FnvLongWindowHashes(Bridge.expression(c), w))
  def fnvNormCharNgramHashes(c: Column, n: Int): Column =
    Bridge.column(FnvNormCharNgramHashes(Bridge.expression(c), n))
  def fnvBandBuckets(c: Column, perms: Int, rowsPerBand: Int): Column =
    Bridge.column(FnvBandBuckets(Bridge.expression(c), perms, rowsPerBand))
  def fnvSimHashSig(c: Column): Column =
    Bridge.column(FnvSimHashSig(Bridge.expression(c)))
}
