package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AggView

/** Incremental aggregate matview: build∘merge ≡ rebuild on the net
  * multiset (the Σ-delta law), retraction-to-zero groups vanish,
  * malformed CDC ops raise, generations advance atomically.
  */
class AggViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("aggview_spec").toString
    new java.io.File(d).delete(); d
  }

  test("build -> mergeCdc(I/D) equals a from-scratch build on the net rows") {
    import spark.implicits._
    val base = Seq(("a", 100L), ("a", 200L), ("b", 50L), ("c", 7L))
      .toDF("k", "v")
    val delta = Seq(
      ("a", 300L, "I"),          // new insert
      ("b", 50L, "D"),           // retract b's only row → group vanishes
      ("c", 9L, "I"), ("c", 7L, "D")) // churn on c
      .toDF("k", "v", "op")
    val dir = freshDir()
    AggView.build(base, Seq("k"), col("v"), dir)
    assert(AggView.currentGen(dir) === 0L)
    AggView.mergeCdc(spark, delta, Seq("k"), col("v"), "op", dir)
    assert(AggView.currentGen(dir) === 1L)
    val got = AggView.serve(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // net: a = {100,200,300}, b = {}, c = {9}
    assert(got === Map("a" -> ((3L, 600L)), "c" -> ((1L, 9L))))
  }

  test("mergeCdc raises on a NULL or unknown op instead of dropping rows") {
    import spark.implicits._
    val dir = freshDir()
    AggView.build(Seq(("a", 1L)).toDF("k", "v"), Seq("k"), col("v"), dir)
    for (bad <- Seq(Some("U"), None)) {
      val delta = Seq(("a", 2L, bad.orNull)).toDF("k", "v", "op")
      val e = intercept[Exception] {
        AggView.mergeCdc(spark, delta, Seq("k"), col("v"), "op", dir)
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("bad CDC op")), s"op=$bad: $e")
    }
    // failed merges must not have advanced the generation
    assert(AggView.currentGen(dir) === 0L)
  }

  test("merges chain: each epoch folds into the previous generation") {
    import spark.implicits._
    val dir = freshDir()
    AggView.build(Seq(("x", 10L)).toDF("k", "v"), Seq("k"), col("v"), dir)
    AggView.mergeCdc(spark, Seq(("x", 5L, "I")).toDF("k", "v", "op"),
      Seq("k"), col("v"), "op", dir)
    AggView.mergeCdc(spark, Seq(("x", 10L, "D"), ("y", 1L, "I"))
      .toDF("k", "v", "op"), Seq("k"), col("v"), "op", dir)
    assert(AggView.currentGen(dir) === 2L)
    val got = AggView.serve(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map("x" -> ((1L, 5L)), "y" -> ((1L, 1L))))
    // time travel: every retained generation still serves its snapshot
    def at(g: Long): Map[String, (Long, Long)] =
      AggView.serveAt(spark, dir, g).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(at(0L) === Map("x" -> ((1L, 10L))))
    assert(at(1L) === Map("x" -> ((2L, 15L))))
    assert(at(2L) === got)
    intercept[IllegalArgumentException] { AggView.serveAt(spark, dir, 3L) }
  }
}
