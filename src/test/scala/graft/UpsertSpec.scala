package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Upsert

/** SURVEY §2.4 W1/W2/W4/W8 semantics, incl. the never-downgrade guard
  * (cmds/archive.py:162) and idempotence. */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("W1 insertIfAbsent never force-broadcasts the base key set") {
    // at 100 TB the base side is the unbroadcastable one; the plan must
    // carry no broadcast HINT on it (AQE may still pick broadcast from
    // runtime stats — the point is the operator doesn't force it)
    val base = spark.range(10000).select($"id".cast("string").as("user_id"),
      lit("u").as("username"))
    val incoming = Seq(("x", "new")).toDF("user_id", "username")
    val out = Upsert.insertIfAbsent(base, incoming, Seq("user_id"))
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("resolvedhint"),
      s"broadcast hint found in insertIfAbsent plan:\n$optimized")
  }

  test("W1 insertIfAbsent: first-in-batch wins, existing keys ignored") {
    val base = Seq(("u1", "old")).toDF("user_id", "username")
    val incoming = Seq(
      ("u1", "SHOULD_IGNORE"), ("u2", "first"), ("u2", "second")
    ).toDF("user_id", "username")
    val out = Upsert.insertIfAbsent(base, incoming, Seq("user_id"),
      orderCol = Some("username"))
    val m = out.as[(String, String)].collect().toMap
    assert(m === Map("u1" -> "old", "u2" -> "first"))
  }

  test("W1 idempotence: re-inserting the same batch changes nothing") {
    val base = Seq(("u1", "a")).toDF("user_id", "username")
    val batch = Seq(("u2", "b")).toDF("user_id", "username")
    val once = Upsert.insertIfAbsent(base, batch, Seq("user_id"), Some("username"))
    val twice = Upsert.insertIfAbsent(once, batch, Seq("user_id"), Some("username"))
    assert(twice.count() === once.count())
  }

  test("W2 guardedUpsert: inserts new, updates only when guard holds (cmds/archive.py:152-175)") {
    val base = Seq(
      ("v1", "title1", 100L), ("v2", "title2", 200L)
    ).toDF("video_id", "title", "filesize")
    val incoming = Seq(
      ("v1", "better", 150L),                        // guard ok → update
      ("v2", null.asInstanceOf[String], 250L),       // null title → guard fails
      ("v3", "new", 50L)                             // absent → insert
    ).toDF("video_id", "title", "filesize")
    val out = Upsert.guardedUpsert(base, incoming, "video_id",
      Upsert.colIn("title").isNotNull && Upsert.colIn("filesize").isNotNull,
      setCols = Seq("title", "filesize"))
    val m = out.as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("v1") === (("better", 150L)))
    assert(m("v2") === (("title2", 200L))) // not downgraded
    assert(m("v3") === (("new", 50L)))
  }

  test("W4 replaceByKey: delete-then-insert playlist semantics (cmds/archive.py:289-294)") {
    val base = Seq(("p1", "old"), ("p2", "keep")).toDF("playlist_id", "title")
    val repl = Seq(("p1", "new")).toDF("playlist_id", "title")
    val out = Upsert.replaceByKey(base, repl, Seq("playlist_id"))
    val m = out.as[(String, String)].collect().toMap
    assert(m === Map("p1" -> "new", "p2" -> "keep"))
  }

  test("W8 withDefault fills only NULLs (schema.sql:66)") {
    val df = Seq(("a", null.asInstanceOf[java.lang.Long]), ("b", 5L: java.lang.Long))
      .toDF("k", "v")
    val out = Upsert.withDefault(df, "v", lit(99L))
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 99L, "b" -> 5L))
  }
}
