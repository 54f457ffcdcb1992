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
    // approximate operators are rows-only checked by design
    val oracleExempt = Set("q46_hll_distinct")
    val missing = qs.keySet -- os.keySet -- oracleExempt
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q46 HLL approx distinct is within its 2% rsd of exact") {
    import org.apache.spark.sql.functions._
    val sf2 = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q46_hll_distinct")(spark, sf2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf2)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.10,
        s"$k: approx=${approx(k)} exact=$n")
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
