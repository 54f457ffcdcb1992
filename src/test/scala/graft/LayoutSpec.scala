package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order keys: bit-exact vs a Scala reference interleave, and the
  * tile-locality property that makes the curve prunable in every
  * participating dimension. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zorder2 matches the reference interleave (edges + seeded values)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (1L, 2L)) ++ (1 to 200).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zorder2($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === refZ(x, y, 16), s"($x,$y)")
    }
  }

  test("tile locality: a 2^k-aligned tile shares the z-prefix — one sort " +
      "key prunes both dimensions") {
    // all points inside the tile [x0, x0+2^k) × [y0, y0+2^k) (aligned)
    // agree on z >> 2k; a point outside in EITHER dim does not
    val k = 4
    val (x0, y0) = (0xab00L, 0x3c40L) // 2^k-aligned corners
    val inTile = for (dx <- 0 until (1 << k); dy <- Seq(0, (1 << k) - 1))
      yield refZ(x0 + dx, y0 + dy, 16) >> (2 * k)
    assert(inTile.distinct.size === 1)
    val prefix = inTile.head
    assert(refZ(x0 + (1 << k), y0, 16) >> (2 * k) !== prefix)
    assert(refZ(x0, y0 + (1 << k), 16) >> (2 * k) !== prefix)
  }

  test("compactionPlan: greedy per-partition binpack covers every file " +
      "exactly once, in order, never crossing partitions") {
    import spark.implicits._
    val files = Seq(
      // partition p1: 100+100+100 | 250 | 40 → bins 0,1,2 at target 250
      ("p1", "a", 100L), ("p1", "b", 100L), ("p1", "c", 100L),
      ("p1", "d", 250L), ("p1", "e", 40L),
      // p2: one oversized file occupies bins alone
      ("p2", "a", 900L), ("p2", "b", 10L))
      .toDF("part", "file", "bytes")
    val got = Layout.compactionPlan(files, "part", "file", "bytes", 250L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got(("p1", 0L)) === ((3L, 300L, "a", "c"))) // cum crosses 250 at c
    assert(got(("p1", 1L)) === ((1L, 250L, "d", "d"))) // d opens past 250
    assert(got(("p1", 2L)) === ((1L, 40L, "e", "e")))  // e's prefix 550 → bin 2
    assert(got(("p2", 0L)) === ((1L, 900L, "a", "a")))
    assert(got(("p2", 3L)) === ((1L, 10L, "b", "b"))) // 900 div 250 = bin 3
    // conservation: every byte and file lands in exactly one bin
    assert(got.values.map(_._1).sum === files.count())
    assert(got.values.map(_._2).sum ===
      files.agg(sum($"bytes")).collect()(0).getLong(0))
  }

  test("pruningEfficiency: sorting by the predicate column prunes all " +
      "non-straddling zones, an uncorrelated sort prunes none, and the " +
      "hit count is layout-invariant") {
    import spark.implicits._
    import graft.operators.Layout
    // v cycles 0..99 under id order (uncorrelated); sorted by v the
    // range [20,39] occupies exactly 2 of 10 perfectly-aligned zones
    val df = (0L until 1000L).map(i => (i, i % 100)).toDF("id", "v")
    def run(sorts: Seq[org.apache.spark.sql.Column], label: String) =
      Layout.pruningEfficiency(df, sorts, "v", bucketRows = 100,
          lo = 20, hi = 39, label = label)
        .collect().head
    val byV = run(Seq($"v"), "by_v")
    assert((byV.getLong(1), byV.getLong(2), byV.getLong(4))
      === ((10L, 8L, 200L)), byV)
    val byId = run(Seq($"id"), "by_id")
    // every 100-row id-zone contains a full 0..99 cycle: nothing prunes
    assert((byId.getLong(1), byId.getLong(2), byId.getLong(4))
      === ((10L, 0L, 200L)), byId)
  }

  test("stringEncodingAdvisor: hand-computed dictionary and " +
      "front-coding numbers, empty-neighbor safety") {
    import spark.implicits._
    import graft.operators.Layout
    // values sorted: ab, abc, abd, x -> lcps: (ab,abc)=2, (abc,abd)=2,
    // (abd,x)=0 -> prefix_saved = 4; occurrences: ab x3, abc x1,
    // abd x1, x x2 -> n=7, raw=2*3+3+3+1*2=14, dict=2+3+3+1=9
    val df = Seq("ab", "ab", "ab", "abc", "abd", "x", "x").toDF("s")
    val r = Layout.stringEncodingAdvisor(df, "s").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
      === ((7L, 4L, 571428L, 14L, 9L, 4L)))
    // a single distinct value has no neighbor pairs: saved = 0
    val one = Layout.stringEncodingAdvisor(
      Seq("solo", "solo").toDF("s"), "s").collect().head
    assert((one.getLong(1), one.getLong(5)) === ((1L, 0L)))
  }
}
