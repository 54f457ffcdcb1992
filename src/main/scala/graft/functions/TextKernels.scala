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
    // windows: positions 1..max(len-w+1, 1) in CODEPOINTS (SQL substring
    // counts codepoints, not UTF-16 units — astral chars must not shift
    // the windows), capped at the end for short docs
    val cpLen = text.codePointCount(0, text.length)
    val nWin = math.max(cpLen - (w - 1), 1)
    val top = new java.util.TreeSet[String]()
    var i = 0
    var from = 0 // UTF-16 index of codepoint i, advanced incrementally
    while (i < nWin) {
      val end = text.offsetByCodePoints(from, math.min(w, cpLen - i))
      md.reset()
      val bytes = text.substring(from, end).getBytes("UTF-8")
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
      if (i < nWin) from = text.offsetByCodePoints(from, 1)
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
  /** Unicode NFC normalization (UAX #15, via the JDK's Normalizer) — the
    * standard pre-tokenization canonicalization (decomposed e + combining
    * acute → precomposed é, etc.). Fast path: already-NFC input (all
    * ASCII corpora) returns the SAME UTF8String, zero allocation. DuckDB's
    * utf8proc `nfc_normalize` produces identical bytes, which is what
    * makes the oracle contract byte-exact. */
  def nfc(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

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

  /** 64-bit SimHash over the DISTINCT space-separated words, as a signed
    * long: bit j (MSB-first, j = 0..63) of each word's vector is bit
    * (63−j) of the first EIGHT md5 digest bytes — the natural widening of
    * [[simhash32]], whose 32 bits are exactly this signature's upper half
    * (same first four digest bytes, same vote rule; pinned in
    * KernelEquivalenceSpec). Bit (63−j) of the result is set iff the ±1
    * vote sum over words at position j is ≥ 0.
    *
    * A long, not a bit-string: Hamming banding at scale wants integer
    * band keys (`(sig >>> s) & 0xffff` — 16-bit bands, lossless for
    * Hamming ≤ 3 by pigeonhole) and `bit_count(a ^ b)` verification, with
    * 8-byte shuffle rows instead of 64-char strings. 32-bit signatures
    * make band keys 8-bit → dense corpora collide every bucket (the q93
    * round-3 bound); 16-bit keys restore selectivity.
    */
  def simhash64(input: UTF8String): Long = {
    val seen = new java.util.HashSet[String]()
    val words = input.toString.split(" ", -1)
    val acc = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < words.length) {
      if (seen.add(words(i))) {
        md.reset()
        val dig = md.digest(words(i).getBytes("UTF-8"))
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          acc(j) += (if (((v >>> (63 - j)) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) >= 0) sig |= (1L << (63 - j)); j += 1 }
    sig
  }

  /** k-component MinHash signature straight from the text: components
    * 2i and 2i+1 are the 60-bit halves (hex nibbles 0-14 and 16-30) of
    * md5(i ":" gram), min'd over the distinct word n-gram shingles —
    * bit-identical to min-aggregating the SQL form over exploded
    * shingles (Dedup.minhashSignature / the q24 oracle), but one per-row
    * eval with NO explode+groupBy shuffle. Returns null when the doc has
    * fewer than n words (no grams — such docs cannot be candidates,
    * matching the agg form which simply never sees them). */
  def minhash(input: UTF8String, n: Int, k: Int): ArrayData = {
    val words = input.toString.split(" ", -1)
    if (words.length < n) return null
    val half = k / 2
    val acc = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var w = 0
      while (w < n) {
        if (w > 0) sb.append(' ')
        sb.append(words(i + w))
        w += 1
      }
      val gram = sb.toString
      if (seen.add(gram)) {
        var c = 0
        while (c < half) {
          md.reset()
          md.update(s"$c:".getBytes("UTF-8"))
          val dig = md.digest(gram.getBytes("UTF-8"))
          var v1 = 0L; var v2 = 0L
          var x = 0
          while (x < 15) {
            val n1 = if (x % 2 == 0) (dig(x / 2) >> 4) & 0xf else dig(x / 2) & 0xf
            v1 = (v1 << 4) | n1
            val y = x + 16
            val n2 = if (y % 2 == 0) (dig(y / 2) >> 4) & 0xf else dig(y / 2) & 0xf
            v2 = (v2 << 4) | n2
            x += 1
          }
          if (v1 < acc(2 * c)) acc(2 * c) = v1
          if (v2 < acc(2 * c + 1)) acc(2 * c + 1) = v2
          c += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc.map(v => v: Any))
  }

  /** xxhash64 (seed 42, Spark's default — identical values to
    * xxhash64(gram) over exploded shingles) of each DISTINCT word n-gram:
    * the map-side form of shingles→explode→xxhash64, so per-doc gram
    * sets exist as arrays with no shuffle. */
  def shingleHashes(input: UTF8String, n: Int): ArrayData = {
    val words = input.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[Long]()
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
      val u = UTF8String.fromString(sb.toString)
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(u, 42L))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Content-defined-chunking cut positions: cut after codepoint i
    * (1-based, i in [w, len)) iff the first four md5 bytes of the
    * trailing w-gram, read as an unsigned 32-bit MSB-first value, have
    * their low `maskBits` bits zero. Bit-identical to the SQL
    * composition `cast(conv(substring(md5(substring(t, i-w+1, w)), 1,
    * 8), 16, 10) as bigint) % 2^maskBits = 0` — the first 8 hex chars
    * ARE the first 4 digest bytes — but one per-row JVM pass instead of
    * an interpreted higher-order filter re-slicing the string per
    * position (the q117 sf0.1 cost was 19.8 s in the HOF form; the
    * kernel stays inside whole-stage codegen). Windows count CODEPOINTS,
    * matching SQL substring/length semantics on non-ASCII text. */
  def cdcCuts(input: UTF8String, w: Int, maskBits: Int): ArrayData = {
    val text = input.toString
    val cpLen = text.codePointCount(0, text.length)
    if (cpLen < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val mask = (1L << maskBits) - 1L
    val cuts = new java.util.ArrayList[Any]()
    var i = w      // candidate cut = end of the gram, codepoints 1-based
    var from = 0   // UTF-16 index of codepoint (i - w)
    while (i < cpLen) {
      val end = text.offsetByCodePoints(from, w)
      md.reset()
      val dig = md.digest(text.substring(from, end).getBytes("UTF-8"))
      val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      if ((h & mask) == 0L) cuts.add(i)
      from = text.offsetByCodePoints(from, 1)
      i += 1
    }
    new GenericArrayData(cuts.toArray)
  }

  /** Distinct word n-gram shingles of a space-separated text. */
  def shingles(input: UTF8String, n: Int): ArrayData = {
    val words = input.toString.split(" ", -1)
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

  /** One Aho–Corasick pass over the case-folded token stream: per-phrase
    * match counts (all occurrences, overlapping included) in phrase-list
    * order. The automaton arrives as a codegen reference object — built
    * once per plan, reused for every row. */
  def acPhraseCounts(input: UTF8String, auto: AcAutomaton): ArrayData = {
    val toks = input.toString.toLowerCase(java.util.Locale.ROOT)
      .split(" ", -1)
    val counts = new Array[Long](auto.nPhrases)
    auto.countInto(toks, counts)
    new GenericArrayData(counts)
  }
}
