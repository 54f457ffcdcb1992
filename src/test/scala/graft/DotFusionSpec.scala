package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DotFusionRule
import org.apache.spark.sql.graftbridge.Bridge

/** SURVEY §4 — the dot-fusion optimizer rule rewrites the declarative
  * aggregate(zip_with(...)) pattern into the native graft_dot and
  * preserves results. Applied directly to the analyzed plan here (the
  * extension-injected path needs a fresh session; builder wiring is
  * covered by GraftExtensions). */
class DotFusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("fuses the composed dot pattern and preserves the value") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("dot"))
    val before = df.queryExecution.analyzed
    val after = DotFusionRule(before)
    assert(!before.toString.contains("graft_dot"))
    assert(after.toString.contains("graft_dot"),
      s"rule did not fire on:\n$before")
    assert(df.collect()(0).getDouble(0) === 32.0)
  }

  test("does not fire on non-double or non-zero-seed folds") {
    import spark.implicits._
    val sum = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (acc, x) => acc + x).as("notdot")) // seed 1.0 ≠ 0.0
    val plan = DotFusionRule(sum.queryExecution.analyzed)
    assert(!plan.toString.contains("graft_dot"))
  }

  test("does not fire when the multiply is not x*y of the zip lambda") {
    import spark.implicits._
    val base = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    // x*x — sum of squares of the left side, NOT a dot product
    val squares = base
      .select(aggregate(zip_with(col("a"), col("b"), (x, _) => x * x),
        lit(0.0), (acc, v) => acc + v).as("sq"))
    val sqPlan = DotFusionRule(squares.queryExecution.analyzed)
    assert(!sqPlan.toString.contains("graft_dot"))
    assert(squares.collect()(0).getDouble(0) === 5.0) // 1 + 4, not 1*3+2*4

    // acc+acc — doubles the accumulator, not a fold of the elements
    val accacc = base
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, _) => acc + acc).as("aa"))
    val aaPlan = DotFusionRule(accacc.queryExecution.analyzed)
    assert(!aaPlan.toString.contains("graft_dot"))
  }

  test("fused form preserves NULL on ragged (unequal-length) arrays") {
    import spark.implicits._
    val ragged = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0)))
      .toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))
    val before = ragged.queryExecution.analyzed
    val after = DotFusionRule(before)
    assert(after.toString.contains("graft_dot")) // fires, but guarded
    // composed semantics: zip_with null-pads → aggregate yields NULL
    assert(ragged.collect()(0).isNullAt(0))
    // and the rewritten plan agrees
    val fused = Bridge.ofRows(spark, after)
    assert(fused.collect()(0).isNullAt(0))
  }
}
