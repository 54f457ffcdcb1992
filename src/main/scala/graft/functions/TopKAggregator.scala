package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.10's second custom-Aggregator slot — grouped top-k by score.
  *
  * IN = one row's (score, id); BUF = OUT = the current top-k as a
  * DESC-score (ASC-id tie-break) sorted sequence, bounded at k — so the
  * aggregation state is O(k) per group no matter how many rows flow in,
  * and partial buffers merge associatively (merge-sort + trim). Spark
  * plans a udaf with partial aggregation, which is the 100 TB win over a
  * `row_number()` window: the window shape must SORT every group's full
  * row set on one partition, while this folds map-side to k rows per
  * group per partition before anything shuffles — high-cardinality
  * grouped top-k never materializes a group's full extent anywhere.
  *
  * Determinism: (score DESC, id ASC) is a total order whenever ids are
  * unique within a group, so the result is partitioning-independent —
  * what makes q101 oracle-checkable against the window form.
  */
final case class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive: $k")

  // explicit comparator, NOT Ordering.by(-score): negating Long.MinValue
  // overflows back to Long.MinValue and would rank the worst score first
  private def ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(x: (Long, Long), y: (Long, Long)): Int = {
      val c = java.lang.Long.compare(y._1, x._1) // score DESC
      if (c != 0) c else java.lang.Long.compare(x._2, y._2) // id ASC
    }
  }

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(acc: Seq[(Long, Long)],
      in: (Long, Long)): Seq[(Long, Long)] =
    if (acc.length == k && ord.lteq(acc.last, in)) acc // can't displace
    else ((acc :+ in).sorted(ord)).take(k)

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(acc: Seq[(Long, Long)]): Seq[(Long, Long)] = acc

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
