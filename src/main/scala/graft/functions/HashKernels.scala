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

  /** ALL w-element window hashes of an array<long>, in position order —
    * index in the output IS the window's 0-based start, so
    * `posexplode` recovers (start, hash) pairs for span-coverage math
    * (exact-substring dedup). No dedup, no whole-array fallback:
    * inputs shorter than one window have no windows and return empty.
    */
  def longWindowsAll(arr: ArrayData, w: Int): ArrayData = {
    val len = arr.numElements()
    if (len < w) return new GenericArrayData(Array.empty[Any])
    val buf = new Array[Byte](8 * w)
    def pack(from: Int): Long = {
      var j = 0
      while (j < w) {
        val h = arr.getLong(from + j)
        var b = 0
        while (b < 8) { buf(j * 8 + b) = (h >>> (8 * b)).toByte; b += 1 }
        j += 1
      }
      XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        8 * w, 42L)
    }
    val out = new Array[Any](len - w + 1)
    var i = 0
    while (i <= len - w) { out(i) = pack(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct winnowing fingerprints (Schleimer et al. 2003, the MOSS
    * scheme): hash every k-byte window with a base-131 polynomial mod
    * 1e9+7, then keep each w-hash sliding window's MINIMUM via a
    * monotonic deque — one O(len) pass, no per-window rescans. The gram
    * hash is plain modular arithmetic (not xxHash) so an external SQL
    * engine can reproduce it term-by-term for the oracle: h(i) =
    * (Σ_j byte(i+j)·131^(k-1-j)) mod 1e9+7, with the Horner form here
    * congruent by modular arithmetic. Texts with no full window (len <
    * k+w-1) fingerprint to the empty array.
    */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var j = 0
      // per-step mod keeps acc < (p-1)*131+255 for ANY k; congruent to
      // the single final mod the SQL mirror applies (k terms fit a long)
      while (j < k) { acc = (acc * 131L + (bytes(i + j) & 0xffL)) % 1000000007L; j += 1 }
      h(i) = acc
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long](1 << 10)
    val out = new scala.collection.mutable.ArrayBuffer[Any](1 << 10)
    // dq holds indices with increasing hash value; front = window min.
    // Ties pop eagerly (>=) — only the min VALUE is collected, so which
    // tied position survives is irrelevant.
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    i = 0
    while (i < n) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) { val m = h(dq(head)); if (seen.add(m)) out += m }
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
