package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.10 custom-Aggregator slot — Misra–Gries heavy hitters.
  *
  * Frequency estimation over a token stream with O(capacity) state:
  * the classic Misra–Gries summary (1982) with the mergeable-summaries
  * combine rule (Agarwal et al., PODS 2012): add counters pointwise,
  * then subtract the (capacity+1)-th largest count from all and drop
  * non-positive entries. Guarantees: every estimate UNDER-counts by at
  * most N/(capacity+1) (never over-counts), and any token with true
  * frequency above that bound is guaranteed present — which is exactly
  * the "what are the dominant tokens/domains/urls in 100 TB" question
  * answered WITHOUT a full-width shuffle: map tasks each carry a
  * capacity-entry map, and only those maps move. Contrast
  * [[TopKAggregator]], which ranks rows by a GIVEN score; this one
  * derives the counts itself.
  *
  * Determinism contract: when `capacity` ≥ the number of distinct
  * tokens, no decrement ever fires and the summary IS the exact count
  * map regardless of partitioning or merge order — the regime q119's
  * oracle checks. Below that, estimates depend on merge order (inherent
  * to the sketch); the error BOUND, not the exact values, is the spec
  * (HeavyHittersSpec pins it on an adversarial stream).
  */
final case class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], tok: String): Map[String, Long] =
    if (tok == null) m
    else m.get(tok) match {
      case Some(c) => m.updated(tok, c + 1L)
      case None if m.size < capacity => m.updated(tok, 1L)
      case None => // decrement-all step: the stream "pays" one of each
        m.flatMap { case (k, v) =>
          if (v > 1L) Some(k -> (v - 1L)) else None
        }
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest count, keep positives
      val cut = sum.values.toIndexedSeq
        .sorted(Ordering[Long].reverse)(capacity)
      sum.flatMap { case (k, v) =>
        if (v - cut > 0L) Some(k -> (v - cut)) else None
      }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
