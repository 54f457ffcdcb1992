package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** §2.10 — the custom Catalyst expressions are callable from SQL after
  * registration, with the same semantics as the Column API. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_dot and graft_shingles work on the SQL surface") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 32.0)
    val grams = spark.sql(
      "SELECT graft_shingles('a b c d a b c', 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(grams === Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("registration is idempotent and null-safe") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(NULL, array(1.0D)) AS d").collect()(0)
    assert(r.isNullAt(0))
    val s = spark.sql("SELECT graft_shingles('a b', 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(s === Seq.empty)
  }
}
