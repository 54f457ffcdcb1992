package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.10 custom-Aggregator slot — MinHash signature union.
  *
  * MinHash signatures are mergeable sketches: the signature of a union of
  * document sets is the element-wise min of the per-document signatures.
  * That makes dedup INCREMENTAL — a new batch's signatures fold into the
  * stored per-corpus signature without revisiting old documents (the same
  * union trick HLL uses for distinct counts).
  *
  * IN = one row's k-component signature (Array[Long], the layout
  * [[graft.operators.Dedup.minhashSignature]] produces via array(s0..)),
  * BUF = OUT = the running element-wise min. Registered via `udaf()` so
  * it is callable from the SQL surface as `graft_minhash_union(sig)` —
  * Spark plans it with partial aggregation (map-side combine) like any
  * built-in, which is exactly why an Aggregator beats a collect+fold.
  *
  * A null/zero-length buffer means "no rows yet" (Aggregator zero must be
  * immutable and k is data-driven, so the first reduce sizes it).
  */
final case class MinHashUnionAggregator()
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def minInto(acc: Array[Long], x: Array[Long]): Array[Long] =
    if (x == null || x.isEmpty) acc
    else if (acc.isEmpty) x.clone()
    else {
      require(acc.length == x.length,
        s"signature length mismatch: ${acc.length} vs ${x.length}")
      var i = 0
      while (i < acc.length) { if (x(i) < acc(i)) acc(i) = x(i); i += 1 }
      acc
    }

  override def reduce(acc: Array[Long], in: Array[Long]): Array[Long] =
    minInto(acc, in)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    minInto(a, b)

  override def finish(acc: Array[Long]): Array[Long] = acc

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
