package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Stored-ANALYZE lifecycle laws: serve ≡ in-query sketch, merge ≡
  * rebuild, forget ≡ rebuild-on-remaining (with the subset guard and
  * replay no-op), geometry drift refused, and join sizing from two
  * stored artifacts ≡ the in-query estimator. */
class StatsIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(t: String) =
    java.nio.file.Files.createTempDirectory(t).toString

  private def keysDf(rows: Seq[String]) = rows.toDF("k")

  private def cellsOf(dir: String) =
    StatsIndex.storedCells(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("build + servedFreq equals the in-query sketch estimate") {
    val dir = tmp("stats_build")
    val data = keysDf(Seq("a", "a", "a", "b", "b", "c"))
    StatsIndex.build(data, "k", dir, 4, 16)
    val probes = Seq("a", "b", "c", "never").toDF("k")
    val served = StatsIndex.servedFreq(spark, probes, "k", dir, 4, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val inQuery = Analytics.cmsEstimate(
        Analytics.cmsSketch(data, "k", 4, 16), probes, "k", 4, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served === inQuery)
    assert(served("never") === 0L)
    assert(StatsIndex.storedRowCount(spark, dir)
      .collect()(0).getLong(0) === 6L)
  }

  test("mergeBatch equals rebuild on the union, cell for cell") {
    val dirM = tmp("stats_merge"); val dirR = tmp("stats_rebuild")
    val first = keysDf(Seq("a", "a", "b"))
    val second = keysDf(Seq("b", "c", "c", "d"))
    StatsIndex.build(first, "k", dirM, 4, 16)
    StatsIndex.mergeBatch(spark, second, "k", dirM, 4, 16)
    StatsIndex.build(first.unionByName(second), "k", dirR, 4, 16)
    assert(cellsOf(dirM) === cellsOf(dirR))
    assert(StatsIndex.storedRowCount(spark, dirM)
      .collect()(0).getLong(0) === 7L)
  }

  test("removeBatch equals rebuild on the remaining; subset guarded; replay no-ops") {
    val dir = tmp("stats_forget"); val dirR = tmp("stats_forget_r")
    val keep = keysDf(Seq("a", "a", "b"))
    val gone = keysDf(Seq("c", "c", "d"))
    StatsIndex.build(keep.unionByName(gone), "k", dir, 4, 16)
    StatsIndex.removeBatch(spark, gone, "k", dir, 4, 16, epoch = 1L,
      fenceTag = "rtbf")
    StatsIndex.build(keep, "k", dirR, 4, 16)
    assert(cellsOf(dir) === cellsOf(dirR))
    // replayed delivery: same epoch is a no-op, counts stay intact
    val before = cellsOf(dir)
    StatsIndex.removeBatch(spark, gone, "k", dir, 4, 16, epoch = 1L,
      fenceTag = "rtbf")
    assert(cellsOf(dir) === before)
    // non-subset batch fails loudly, store untouched
    val e = intercept[IllegalArgumentException] {
      StatsIndex.removeBatch(spark, keysDf(Seq("zz", "zz")), "k", dir,
        4, 16, epoch = 2L, fenceTag = "rtbf")
    }
    assert(e.getMessage.contains("not a subset"))
    assert(cellsOf(dir) === before)
  }

  test("geometry drift is refused before any write") {
    val dir = tmp("stats_geom")
    StatsIndex.build(keysDf(Seq("a")), "k", dir, 4, 16)
    val e = intercept[IllegalArgumentException] {
      StatsIndex.mergeBatch(spark, keysDf(Seq("b")), "k", dir, 4, 32)
    }
    assert(e.getMessage.contains("geometry"))
    val e2 = intercept[IllegalArgumentException] {
      StatsIndex.servedFreq(spark, keysDf(Seq("a")), "k", dir, 8, 16)
    }
    assert(e2.getMessage.contains("geometry"))
  }

  test("servedJoinSize from two stored artifacts equals the in-query estimator") {
    val dirL = tmp("stats_jl"); val dirR = tmp("stats_jr")
    val left = keysDf(Seq("a", "a", "a", "b"))
    val right = keysDf(Seq("a", "b", "b", "c"))
    StatsIndex.build(left, "k", dirL, 4, 16)
    StatsIndex.build(right, "k", dirR, 4, 16)
    val served = StatsIndex.servedJoinSize(spark, dirL, dirR, 4, 16)
      .collect()(0)
    val inQuery = Analytics.cmsJoinSizeAudit(left, "k", right, "k",
      4, 16).collect()(0)
    assert(served.getAs[Long]("est_rows") ===
      inQuery.getAs[Long]("est_rows"))
    assert(served.getAs[Long]("n_left") === 4L)
    assert(served.getAs[Long]("n_right") === 4L)
    // and the estimate still never undercounts the exact size (5)
    assert(served.getAs[Long]("est_rows") >= 5L)
  }
}
