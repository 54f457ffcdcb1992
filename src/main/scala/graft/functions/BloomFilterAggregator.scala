package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.10 custom-Aggregator slot — Bloom-filter bitset union.
  *
  * IN = one key's k bit positions (Array[Long], each in [0, mBits) —
  * produced by [[graft.operators.Bloom.positions]] from md5 so the
  * positions are engine-portable), BUF = OUT = the filter's bit words
  * (Array[Long] of length mBits/64, little-endian within each word:
  * position p lives at word p>>6, bit p&63).
  *
  * A Bloom filter is a mergeable sketch: the filter of a union of key
  * sets is the bitwise OR of the per-set filters. Spark therefore plans
  * this with partial aggregation — each map task ORs its partition's
  * keys into a local bitset and only the mBits/8-byte words cross the
  * wire, never the keys. That is the point at 100 TB: an archive of
  * billions of keys compresses to a broadcastable bitmap (~1.2 GB at
  * 10 bits/key for 10^9 keys), and batch-side membership probes become
  * per-row bit arithmetic with ZERO shuffle and zero join against the
  * archive. False positives are the documented price; [[graft.operators
  * .Bloom]] composes the filter as a PRE-filter in front of the exact
  * probe join, so they cost extra work, never wrong answers.
  *
  * The empty-array zero means "no keys yet" (the Aggregator zero must be
  * immutable; the first reduce sizes the buffer), mirroring
  * [[MinHashUnionAggregator]].
  */
final case class BloomFilterAggregator(mBits: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
  private def words = mBits / 64

  override def zero: Array[Long] = Array.emptyLongArray

  private def sized(acc: Array[Long]): Array[Long] =
    if (acc.isEmpty) new Array[Long](words) else acc

  override def reduce(acc0: Array[Long], pos: Array[Long]): Array[Long] = {
    val acc = sized(acc0)
    if (pos != null) {
      var i = 0
      while (i < pos.length) {
        val p = pos(i)
        require(p >= 0 && p < mBits, s"bit position $p outside [0, $mBits)")
        acc((p >> 6).toInt) |= 1L << (p & 63)
        i += 1
      }
    }
    acc
  }

  override def merge(a0: Array[Long], b: Array[Long]): Array[Long] =
    if (b.isEmpty) a0
    else {
      val a = sized(a0)
      var i = 0
      while (i < b.length) { a(i) |= b(i); i += 1 }
      a
    }

  override def finish(acc: Array[Long]): Array[Long] = sized(acc)

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
