package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.KmvSketchAggregator

/** KMV bottom-k distinct sketch: the state is a pure function of the
  * input SET (order/partitioning/merge-shape invariant — that is what
  * lets q148/q149 hash-match a DuckDB oracle), exact below k, and the
  * saturated estimate lands within the ~1/sqrt(k) band. */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sketch(hashes: Seq[Long], k: Int,
      partitions: Int): Seq[Long] = {
    import spark.implicits._
    val kmv = udaf(KmvSketchAggregator(k))
    hashes.toDF("h").repartition(partitions)
      .agg(kmv(col("h")).as("sk"))
      .collect().head.getSeq[Long](0)
  }

  test("exact regime: fewer than k distinct ⇒ the sketch IS the sorted " +
      "distinct set, invariant under partitioning") {
    val hs = Seq(7L, 3L, 3L, 99L, 7L, 12L, 0L)
    val want = hs.distinct.sorted
    assert(sketch(hs, k = 16, partitions = 1) === want)
    assert(sketch(hs, k = 16, partitions = 5) === want)
  }

  test("saturated regime: sketch = k smallest distinct, invariant under " +
      "row order, partitioning, and duplication") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(500)(rnd.nextLong() & ((1L << 60) - 1))
    val want = base.distinct.sorted.take(64)
    assert(sketch(rnd.shuffle(base), 64, partitions = 1) === want)
    assert(sketch(rnd.shuffle(base ++ base), 64, partitions = 13) === want)
  }

  test("merge is the union sketch: merge(sk(A), sk(B)) == sk(A ∪ B)") {
    val agg = KmvSketchAggregator(32)
    val rnd = new scala.util.Random(21)
    val a = Seq.fill(200)(rnd.nextLong() & ((1L << 60) - 1))
    val b = Seq.fill(200)(rnd.nextLong() & ((1L << 60) - 1))
    def fold(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(fold(a), fold(b))
    assert(merged.toSeq === (a ++ b).distinct.sorted.take(32))
  }

  test("estimate accuracy: saturated (k-1)*2^60/kth within 3/sqrt(k) " +
      "of the true distinct count") {
    val k = 256
    val rnd = new scala.util.Random(3)
    val n = 20000
    val hs = (1 to n).map(i =>
      // md5-like spread: hash the index, mask to the 60-bit space
      scala.util.hashing.MurmurHash3.stringHash(s"v$i").toLong
        .abs * 2654435761L & ((1L << 60) - 1))
    val distinct = hs.distinct.size
    val sk = sketch(hs, k, partitions = 8)
    assert(sk.length == k)
    val est = (k - 1).toDouble * math.pow(2, 60) / sk.last
    val relErr = math.abs(est - distinct) / distinct
    assert(relErr < 3.0 / math.sqrt(k),
      s"relative error $relErr (est $est vs true $distinct)")
  }
}
