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

  // ---- KmvSampleAggregator (value-carrying bottom-k sample) ----

  private def samplePairs(pairs: Seq[(Long, Long)], k: Int,
      partitions: Int): Seq[Long] = {
    import spark.implicits._
    val agg = udaf(graft.functions.KmvSampleAggregator(k))
    pairs.toDF("h", "v").repartition(partitions)
      .agg(agg(col("h"), col("v")).as("sk"))
      .collect().head.getSeq[Long](0)
  }

  test("sample aggregator keeps the k hash-smallest pairs with their " +
      "values, invariant under partitioning and row order") {
    val pairs = Seq(50L -> 500L, 10L -> 100L, 30L -> 300L, 20L -> 200L,
      40L -> 400L, 10L -> 999L /* dup hash: first-kept is irrelevant
        because real callers derive the hash from a unique id */ )
    val expectHashes = Seq(10L, 20L, 30L)
    for (p <- Seq(1, 3, 7); shuffled <- Seq(pairs, pairs.reverse)) {
      val got = samplePairs(shuffled, k = 3, partitions = p)
      assert(got.length == 6)
      assert(got.grouped(2).map(_.head).toSeq == expectHashes)
      // distinct-hash pairs carry their own values
      assert(got.grouped(2).toSeq.filter(_.head != 10L) ==
        Seq(Seq(20L, 200L), Seq(30L, 300L)))
    }
  }

  test("sample merge law: merge(fold(A), fold(B)) == fold(A ++ B)") {
    val agg = graft.functions.KmvSampleAggregator(4)
    val a = Seq(9L -> 90L, 2L -> 20L, 7L -> 70L)
    val b = Seq(1L -> 10L, 8L -> 80L, 3L -> 30L, 5L -> 50L)
    def fold(xs: Seq[(Long, Long)]) = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(fold(a), fold(b)).toSeq ==
      fold(a ++ b).toSeq)
    assert(fold(a ++ b).toSeq == Seq(1L, 10L, 2L, 20L, 3L, 30L, 5L, 50L))
  }

  test("sample collision rule: duplicate hash keeps min(value) in any " +
      "reduce/merge order — matches the streaming relational fold") {
    val agg = graft.functions.KmvSampleAggregator(2)
    def fold(xs: Seq[(Long, Long)]) = xs.foldLeft(agg.zero)(agg.reduce)
    // same hash 5, different values: min wins regardless of arrival order
    assert(fold(Seq(5L -> 50L, 5L -> 10L)).toSeq == Seq(5L, 10L))
    assert(fold(Seq(5L -> 10L, 5L -> 50L)).toSeq == Seq(5L, 10L))
    // collision arriving via the saturated fast path (h == current max)
    assert(fold(Seq(1L -> 11L, 5L -> 50L, 5L -> 10L)).toSeq ==
      Seq(1L, 11L, 5L, 10L))
    // merge sides disagreeing on a kept hash's value: min wins, both ways
    val x = fold(Seq(1L -> 11L, 5L -> 50L))
    val y = fold(Seq(5L -> 10L, 9L -> 90L))
    assert(agg.merge(x, y).toSeq == Seq(1L, 11L, 5L, 10L))
    assert(agg.merge(y, x).toSeq == Seq(1L, 11L, 5L, 10L))
    // duplicate of the LAST kept hash after the buffer saturates still
    // improves the kept value (the o==cap tail case)
    val p = fold(Seq(1L -> 11L, 5L -> 50L))
    val q = fold(Seq(2L -> 22L, 5L -> 10L))
    assert(agg.merge(p, q).toSeq == Seq(1L, 11L, 2L, 22L))
    val p2 = fold(Seq(1L -> 11L, 2L -> 22L))
    val q2 = fold(Seq(2L -> 2L, 9L -> 90L))
    assert(agg.merge(p2, q2).toSeq == Seq(1L, 11L, 2L, 2L))
  }
}
