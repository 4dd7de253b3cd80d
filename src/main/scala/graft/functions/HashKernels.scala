package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the hash expressions. Top-level object methods get
  * static forwarders, so whole-stage-generated Java calls them directly
  * (`HashKernels.charNgram(s, 5)`) — the expressions stay inside codegen
  * instead of falling back to interpreted per-row eval, which both costs
  * dispatch/boxing per row and forces row materialization mid-stage.
  */
object HashKernels {

  /** Distinct xxHash64 of every n-byte window of a string; whole-input
    * hash when shorter than one window.
    */
  def charNgram(s: UTF8String, n: Int): ArrayData = {
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

  /** Distinct xxHash64 of every w-element window of an array<long>;
    * whole-array hash when shorter than one window.
    */
  def longWindows(arr: ArrayData, w: Int): ArrayData = {
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

  /** One-permutation MinHash with rotation densification (see MinHashSig
    * scaladoc for the algorithm contract).
    */
  def minhash(arr: ArrayData, perms: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](perms)
    val seen = new Array[Boolean](perms)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val bin = (((h % perms) + perms) % perms).toInt
      if (!seen(bin) || h < mins(bin)) { mins(bin) = h; seen(bin) = true }
      i += 1
    }
    val out = new Array[Any](perms)
    var j = 0
    while (j < perms) {
      if (seen(j)) out(j) = mins(j)
      else {
        // rotation densification: nearest non-empty bin to the right
        var d = 1
        var src = -1
        while (d < perms && src < 0) {
          if (seen((j + d) % perms)) src = (j + d) % perms
          d += 1
        }
        // src < 0 ⇔ empty shingle set: fall back to per-bin sentinel
        out(j) = if (src < 0) Long.MinValue + j else mins(src)
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
