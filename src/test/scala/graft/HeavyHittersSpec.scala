package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAggregator

/** Misra–Gries sketch: exact below capacity (partitioning-invariant),
  * bounded under-count above it, heavy tokens never lost. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sketch(tokens: Seq[String], capacity: Int,
      partitions: Int): Map[String, Long] = {
    import spark.implicits._
    val mg = udaf(MisraGriesAggregator(capacity))
    tokens.toDF("t").repartition(partitions)
      .agg(mg(col("t")).as("m"))
      .collect().head.getMap[String, Long](0).toMap
  }

  test("exact regime: capacity ≥ distinct ⇒ exact counts, invariant " +
      "under partitioning") {
    val tokens = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(9)("c") ++ Seq("d")
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(sketch(tokens, capacity = 8, partitions = 1) === truth)
    assert(sketch(tokens, capacity = 8, partitions = 5) === truth)
  }

  test("approximate regime: never over-counts, under-counts ≤ N/(k+1), " +
      "heavy hitters survive") {
    // adversarial tail: 3 heavy tokens + 60 singletons, capacity 8
    val rnd = new scala.util.Random(11)
    val tokens = rnd.shuffle(
      Seq.fill(300)("hh1") ++ Seq.fill(200)("hh2") ++ Seq.fill(120)("hh3") ++
        (1 to 60).map(i => s"rare$i"))
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = tokens.size
    val cap = 8
    val est = sketch(tokens, cap, partitions = 4)
    assert(est.size <= cap, "state must stay bounded")
    est.foreach { case (t, e) =>
      assert(e <= truth(t), s"$t over-counted: $e > ${truth(t)}")
      assert(truth(t) - e <= n / (cap + 1),
        s"$t under-counted past the bound")
    }
    // every token with true count > N/(k+1) is guaranteed present
    Seq("hh1", "hh2", "hh3").foreach { t =>
      assert(truth(t) > n / (cap + 1))
      assert(est.contains(t), s"heavy hitter $t lost")
    }
  }
}
