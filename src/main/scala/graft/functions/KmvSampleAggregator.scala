package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.10 custom-Aggregator slot — value-carrying KMV bottom-k
  * SAMPLE: the [[KmvSketchAggregator]] idea (keep the k smallest distinct
  * md5-derived hashes) extended to carry one long VALUE alongside each
  * kept hash. Because the hash is uniform on the row's key, the kept rows
  * are a uniform-without-replacement sample of the group — and because
  * "bottom-k of a set" is a pure function of the input SET, the sample is
  * identical under any row order, partitioning, or merge tree, so
  * downstream statistics (order-statistic quantiles in
  * [[graft.operators.Analytics.kmvQuantiles]]) hash-match a DuckDB oracle
  * that replays the same rank-by-hash window. This is the classic
  * bottom-k sampling scheme (Cohen & Kaplan, "Summarizing data using
  * bottom-k sketches", PODC'07) with the hash doubling as the random tag.
  *
  * Why this matters at 100 TB: an exact per-group quantile needs a
  * per-group sort (the q156 two-pass rank); this sketch answers the same
  * question with 2k longs of state per group (k=64 → 1 KB), map-side
  * partial aggregation, and O(k) merges — the shape that lets one pass
  * compute quantile profiles for millions of groups. Error is the usual
  * bottom-k order-statistic bound, O(1/sqrt(k)) in rank space.
  *
  * IN = (hash, value) — the hash computed in the query plan via codegen'd
  * md5/conv (the [[graft.operators.Curation.hashBucket]] convention) so
  * the oracle replicates it bit-for-bit; BUF = OUT = interleaved pairs
  * `[h0,v0, h1,v1, …]` sorted ascending by hash, at most 2k longs.
  * Registered on the SQL surface as `graft_kmvsample64(hash, value)`.
  */
final case class KmvSampleAggregator(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(k > 0, s"KMV sample size must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Binary search over the even (hash) slots; Arrays.binarySearch-style
    * contract: pair index if found, -(insertion pair index)-1 if not. */
  private def search(buf: Array[Long], h: Long): Int = {
    var lo = 0
    var hi = buf.length / 2 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = buf(2 * mid)
      if (v == h) return mid
      if (v < h) lo = mid + 1 else hi = mid - 1
    }
    -lo - 1
  }

  /** Insert one (hash, value), keeping pairs hash-sorted, distinct on
    * hash, capped at k. The saturated fast path (hash ≥ current max,
    * buffer full) allocates nothing — the common case on large groups. */
  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val n = buf.length / 2
    val h = in._1
    if (n == k && h > buf(2 * (n - 1))) return buf
    val pos = search(buf, h)
    if (pos >= 0) {
      // hash already kept — a set, not a multiset; on a (negligible-
      // probability) 60-bit collision between distinct ids keep min(value)
      // so the result is merge-order-independent and agrees with the
      // streaming relational fold (SketchState.foreachBatchKmvSample).
      if (in._2 < buf(2 * pos + 1)) buf(2 * pos + 1) = in._2
      return buf
    }
    val ins = -pos - 1
    val outN = if (n < k) n + 1 else k
    val out = new Array[Long](2 * outN)
    System.arraycopy(buf, 0, out, 0, 2 * ins)
    out(2 * ins) = h
    out(2 * ins + 1) = in._2
    System.arraycopy(buf, 2 * ins, out, 2 * ins + 2, 2 * outN - 2 * ins - 2)
    out
  }

  /** Sorted-merge on hash with dedup (min-value on hash match, matching
    * [[reduce]]), truncated to k pairs. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val cap = math.min(k, a.length / 2 + b.length / 2)
    val out = new Array[Long](2 * cap)
    var i = 0; var j = 0; var o = 0
    var last = 0L; var first = true
    var done = false
    while (!done && (i < a.length || j < b.length)) {
      var h = 0L; var v = 0L
      if (j >= b.length || (i < a.length && a(i) <= b(j))) {
        h = a(i); v = a(i + 1); i += 2
      } else { h = b(j); v = b(j + 1); j += 2 }
      if (!first && h == last) {
        // duplicate of the last kept hash — keep min(value), even when
        // the buffer is already full (the kept pair may still improve)
        if (v < out(2 * (o - 1) + 1)) out(2 * (o - 1) + 1) = v
      } else if (o < cap) {
        out(2 * o) = h; out(2 * o + 1) = v; o += 1
        last = h; first = false
      } else done = true // full and h > last: all further hashes larger
    }
    if (o == cap) out else java.util.Arrays.copyOf(out, 2 * o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
