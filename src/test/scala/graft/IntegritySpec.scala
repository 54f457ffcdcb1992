package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Integrity

/** SURVEY §1.5 / §2.3 — FK algebra: validation, restrict, cascade,
  * recursive comment-tree cascade to fixpoint. */
class IntegritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("J1 fkViolations finds orphans, ignores NULL fks") {
    val parent = Seq("u1", "u2").toDF("user_id")
    val child = Seq(
      ("c1", "u1"), ("c2", "u9"), ("c3", null.asInstanceOf[String])
    ).toDF("comment_id", "author")
    val v = Integrity.fkViolations(child, "author", parent, "user_id")
      .select("comment_id").as[String].collect().sorted
    assert(v === Array("c2"))
  }

  test("J4 restrictViolations: referenced parents block deletion (schema.sql:14,67)") {
    val del = Seq("ch1", "ch2").toDF("channel_id")
    val videos = Seq(("v1", "ch1")).toDF("video_id", "channel")
    val blocked = Integrity.restrictViolations(del, "channel_id", videos, "channel")
      .as[String].collect()
    assert(blocked === Array("ch1"))
  }

  test("J2 cascade keeps only non-matching children (schema.sql:25,39)") {
    val deleted = Seq("v1").toDF("video_id")
    val tags = Seq((1L, "v1", "t"), (2L, "v2", "t")).toDF("id", "video", "tag")
    val surv = Integrity.cascade(tags, "video", deleted, "video_id")
      .select("id").as[Long].collect()
    assert(surv === Array(2L))
  }

  test("J3 recursive cascade follows a 4-deep reply chain to fixpoint (schema.sql:41)") {
    // c1 → c2 → c3 → c4 chain plus unrelated c5; delete seed = c1
    val comments = Seq(
      ("c1", null.asInstanceOf[String]), ("c2", "c1"), ("c3", "c2"),
      ("c4", "c3"), ("c5", null.asInstanceOf[String]), ("c6", "c5")
    ).toDF("comment_id", "parent")
    val deleted = Integrity.cascadeRecursive(comments, "comment_id", "parent",
      Seq("c1").toDF("comment_id"))
      .as[String].collect().sorted
    assert(deleted === Array("c1", "c2", "c3", "c4"))
  }

  test("J3 pointer-doubling cascade matches the level-wise fixpoint") {
    // deterministic pseudo-random parent forest: 500 nodes, parent of n
    // is some earlier node or a root (no cycles); seeds = two subtree
    // roots. Both strategies must return the identical deleted set.
    val rows = (1 to 500).map { n =>
      // parent index must not be a multiple of n (n*k % n == 0 always) —
      // mix the bits first so depths/branching actually vary
      val p = if (n % 7 == 1) null.asInstanceOf[String]
      else "n" + ((((n * 2654435761L) >>> 13) % n).toInt.abs.max(1).min(n - 1))
      ("n" + n, p)
    }
    val df = rows.toDF("comment_id", "parent")
    // n999 is a dangling seed (no row in the table): still deleted
    val seeds = Seq("n1", "n8", "n999").toDF("comment_id")
    val a = Integrity.cascadeRecursive(df, "comment_id", "parent", seeds)
      .as[String].collect().sorted
    val b = Integrity.cascadeRecursiveDoubling(df, "comment_id", "parent", seeds)
      .as[String].collect().sorted
    assert(a.nonEmpty && a.contains("n999") && (a sameElements b),
      s"level-wise ${a.length} vs doubling ${b.length}")
  }

  test("J3 doubling handles deep chains within log rounds (4-deep)") {
    val comments = Seq(
      ("c1", null.asInstanceOf[String]), ("c2", "c1"), ("c3", "c2"),
      ("c4", "c3"), ("c5", null.asInstanceOf[String]), ("c6", "c5")
    ).toDF("comment_id", "parent")
    val deleted = Integrity.cascadeRecursiveDoubling(comments, "comment_id",
      "parent", Seq("c1").toDF("comment_id"))
      .as[String].collect().sorted
    assert(deleted === Array("c1", "c2", "c3", "c4"))
  }

  test("W5 unarchiveVideo cascades comments (incl. replies) and tags") {
    val comments = Seq(
      ("c1", "v1", null.asInstanceOf[String]), // root comment on v1
      ("c2", "v1", "c1"),                      // reply
      ("c3", "v2", null.asInstanceOf[String])  // other video
    ).toDF("comment_id", "video", "parent")
    val tags = Seq((1L, "v1", "a"), (2L, "v2", "b")).toDF("id", "video", "tag")
    val (survC, survT) = Integrity.unarchiveVideo(
      Seq("v1").toDF("video_id"), "video_id", comments, tags)
    assert(survC.select("comment_id").as[String].collect().sorted === Array("c3"))
    assert(survT.select("id").as[Long].collect() === Array(2L))
  }
}
