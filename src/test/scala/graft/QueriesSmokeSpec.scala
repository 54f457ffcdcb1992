package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query plans and executes at sf0.001, oracle
  * coverage is complete, and names are aligned (the t2 gate's local twin
  * is tools/check.py — this spec only guards regressions cheaply). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and distinct name") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    val missing = qs.keySet -- os.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q46 HLL approx distinct lands within tolerance on every group") {
    val sf2 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q46_hll_distinct")(spark, sf2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_tol")),
        s"${r.getString(0)}: HLL estimate outside 5% tolerance")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
