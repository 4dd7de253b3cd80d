package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle hashing for the dedup pipeline. The composable form
  * (`transform(sequence(...), i -> xxhash64(substring/slice ...))`)
  * allocates a position array plus a substring per window; these
  * expressions do one scan with xxHash64 over byte/long windows.
  * Inputs shorter than one window hash as a single whole-input shingle.
  */

/** Distinct xxHash64 of every n-byte window of a string. */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val len = bytes.length
    if (len < n)
      return new GenericArrayData(Array[Any](
        XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)))
    val seen = new java.util.HashSet[java.lang.Long](math.min(len, 1 << 12))
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(len, 1 << 12))
    var i = 0
    val limit = len - n
    while (i <= limit) {
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, n, 42L)
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_ngram_hashes"
}

/** Distinct xxHash64 of every w-element window of an array<long>
  * (pre-hashed tokens → word shingles).
  */
case class LongWindowHashes(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_window_hashes expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val buf = new Array[Byte](8 * w)
    def pack(from: Int, count: Int): Long = {
      var j = 0
      while (j < count) {
        val h = arr.getLong(from + j)
        var b = 0
        while (b < 8) { buf(j * 8 + b) = (h >>> (8 * b)).toByte; b += 1 }
        j += 1
      }
      XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        8 * count, 42L)
    }
    if (len < w)
      return new GenericArrayData(Array[Any](pack(0, len)))
    val seen = new java.util.HashSet[java.lang.Long](math.min(len, 1 << 12))
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(len, 1 << 12))
    var i = 0
    val limit = len - w
    while (i <= limit) {
      val h = pack(i, w)
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "long_window_hashes"
}

object ShingleHashes {
  def charNgramHashes(c: Column, n: Int): Column =
    Bridge.column(CharNgramHashes(Bridge.expression(c), n))
  def longWindowHashes(c: Column, w: Int): Column =
    Bridge.column(LongWindowHashes(Bridge.expression(c), w))
}
