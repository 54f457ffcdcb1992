package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text kernels shared by the native expressions' interpreted
  * `nullSafeEval` AND their generated code. A top-level object gets
  * Java static forwarders, so `doGenCode` can emit a plain
  * `graft.functions.TextKernels.winnow(...)` call — one JVM method call
  * per row instead of breaking the whole-stage codegen span with a
  * CodegenFallback (which forces an interpreted Projection boundary
  * around every operator that uses the expression).
  */
object TextKernels {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Winnowing fingerprint: md5 of every `w`-char sliding window, keep
    * the `k` smallest DISTINCT hex digests, joined with '|'.
    */
  def winnow(input: UTF8String, w: Int, k: Int): UTF8String = {
    val text = input.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    // windows: positions 1..max(len-w+1, 1) (substring caps at the end,
    // matching substr semantics on short docs)
    val nWin = math.max(text.length - (w - 1), 1)
    val top = new java.util.TreeSet[String]()
    var i = 0
    while (i < nWin) {
      val end = math.min(i + w, text.length)
      md.reset()
      val bytes = text.substring(i, end).getBytes("UTF-8")
      val dig = md.digest(bytes)
      val sb = new java.lang.StringBuilder(32)
      var b = 0
      while (b < dig.length) {
        sb.append(hexDigits((dig(b) >> 4) & 0xf))
        sb.append(hexDigits(dig(b) & 0xf))
        b += 1
      }
      top.add(sb.toString)
      if (top.size > k) top.pollLast()
      i += 1
    }
    val out = new java.lang.StringBuilder(33 * k)
    val it = top.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) out.append('|')
      out.append(it.next()); first = false
    }
    UTF8String.fromString(out.toString)
  }

  /** 32-bit SimHash over the DISTINCT space-separated words: bit j of
    * each word's signature is bit (31−j) of the first four md5 digest
    * bytes (== the j-th binary digit of the first 8 hex chars MSB-first,
    * exactly the nibble math of the SQL form this replaces); the output
    * char j is '1' iff the ±1 vote sum over words is ≥ 0.
    *
    * split(" ", -1) matches Spark's `split` (trailing empties kept).
    */
  def simhash32(input: UTF8String): UTF8String = {
    val seen = new java.util.HashSet[String]()
    val words = input.toString.split(" ", -1)
    val acc = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < words.length) {
      if (seen.add(words(i))) {
        md.reset()
        val dig = md.digest(words(i).getBytes("UTF-8"))
        val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        var j = 0
        while (j < 32) {
          acc(j) += (if (((v >> (31 - j)) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(32)
    var j = 0
    while (j < 32) { sb.append(if (acc(j) >= 0) '1' else '0'); j += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Distinct word n-gram shingles of a space-separated text. */
  def shingles(input: UTF8String, n: Int): ArrayData = {
    val words = input.toString.split(' ')
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
