package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.10 custom-Aggregator slot — KMV (k-minimum-values) distinct
  * sketch (Bar-Yossef et al. 2002; the bottom-k form in Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset Operations",
  * SIGMOD'07).
  *
  * The sketch keeps the k smallest DISTINCT hash values seen. Unlike HLL
  * (whose register layout is engine-private) the KMV state is a plain
  * sorted Long array and the result is a pure function of the input SET —
  * independent of row order, partitioning, and merge tree shape — so the
  * whole sketch, not just a tolerance band around its estimate, is
  * oracle-checkable in DuckDB with a rank window over the same md5-derived
  * hashes (the [[graft.operators.Curation.hashBucket]] convention).
  *
  * Why this matters at 100 TB: the state is k longs (k=256 → 2 KB) per
  * group regardless of input size, reduce is O(log k) search + O(k) copy
  * only when the element actually lands in the bottom k (a vanishing
  * fraction once the sketch saturates), and merge is a linear sorted-merge
  * — so Spark plans it with map-side partial aggregation like any built-in,
  * and per-segment sketches union into corpus rollups without revisiting
  * rows. Distinct estimate: exact |S| while |S| < k, else
  * (k-1) * 2^60 / kthMin (hashes are uniform on [0, 2^60) — 15 hex chars
  * of md5). Two sketches also yield set-overlap estimates (Jaccard via the
  * k-min of the merged sketch — see q149) that HLL cannot produce without
  * inclusion-exclusion error stacking.
  *
  * IN = the 60-bit hash of the key (computed in the query plan via
  * codegen'd md5/conv so the oracle replicates it bit-for-bit);
  * BUF = OUT = the sorted ascending array of the k smallest distinct
  * hashes. Registered on the SQL surface as `graft_kmv256(hash)`.
  */
final case class KmvSketchAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"KMV sketch size must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert one hash, keeping the buffer sorted-distinct-capped-at-k.
    * The saturated fast path (h >= current max, buffer full) is the
    * overwhelmingly common case on large inputs and allocates nothing. */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n == k && h >= buf(n - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present — a set, not a multiset
    val ins = -pos - 1
    val outLen = if (n < k) n + 1 else k
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  /** Sorted-merge with dedup, truncated to k — the union sketch. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var o = 0
    var last = 0L; var first = true
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val x = a(i); i += 1; x
        } else { val x = b(j); j += 1; x }
      if (first || v != last) { out(o) = v; o += 1; last = v; first = false }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
