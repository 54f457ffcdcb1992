package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Refine

/** SURVEY §2.7 F1-F16 edge cases (nulls, sentinels, malformed input). */
class RefineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: Seq[String]): Seq[Any] =
    input.toDF("x").select(c.as("r")).collect().map(_.get(0)).toSeq

  test("F1 video-id validation: 11-char alphabet only (utils.py:19-24)") {
    val r = one(Refine.isValidVideoId($"x"),
      Seq("dQw4w9WgXcQ", "short", "dQw4w9WgXcQQQ", "dQw4w9WgXc!", "dQw4w9WgXc_"))
    assert(r === Seq(true, false, false, false, true))
  }

  test("F2 query-string strip (cmds/archive.py:88)") {
    val r = one(Refine.stripQuery($"x"),
      Seq("http://a/b.jpg?sig=1&x=2", "http://a/b.jpg", "a?b?c"))
    assert(r === Seq("http://a/b.jpg", "http://a/b.jpg", "a"))
  }

  test("F3 file extension (cmds/archive.py:211)") {
    val r = one(Refine.fileExt($"x"),
      Seq("http://a/b/c.webp?v=1", "x.tar.gz", "noext"))
    assert(r === Seq("webp", "gz", "noext"))
  }

  test("F4 default-description blanking (cmds/archive.py:105)") {
    val r = one(Refine.blankDefault($"x", "DEFAULT"), Seq("DEFAULT", "mine", ""))
    assert(r === Seq("", "mine", ""))
  }

  test("F7 upload_date YYYYMMDD parse (cmds/archive.py:112)") {
    val r = Seq("20230115", "bad", null.asInstanceOf[String]).toDF("x")
      .select(Refine.parseUploadDate($"x").cast("string").as("r"))
      .collect().map(_.get(0)).toSeq
    assert(r === Seq("2023-01-15 00:00:00", null, null))
  }

  test("F7 ISO timestamp parse incl. Z suffix (cmds/archive.py:339)") {
    val r = Seq("2024-01-02T03:04:05Z", "2024-01-02 03:04:05")
      .toDF("x").select(Refine.parseIsoTs($"x").cast("string").as("r"))
      .collect().map(_.get(0)).toSeq
    assert(r === Seq("2024-01-02 03:04:05", "2024-01-02 03:04:05"))
  }

  test("F8 category head null-safe on missing/empty (cmds/archive.py:113)") {
    val df = Seq(
      (1L, Seq("Music", "Live")), (2L, Seq.empty[String])
    ).toDF("id", "x")
    val withNull = df.union(Seq((3L, null.asInstanceOf[Seq[String]])).toDF("id", "x"))
    val r = withNull.orderBy($"id")
      .select(Refine.headCategory($"x").as("r")).collect().map(_.get(0)).toSeq
    assert(r === Seq("Music", null, null))
  }

  test("F9 root sentinel → NULL keeps real parents (cmds/archive.py:183)") {
    val r = one(Refine.rootToNull($"x"), Seq("root", "c123", "ROOT"))
    assert(r === Seq(null, "c123", "ROOT"))
  }

  test("F10 watch-id extraction (cmds/archive.py:334)") {
    val r = one(Refine.extractWatchId($"x"), Seq(
      "https://www.youtube.com/watch?v=dQw4w9WgXcQ",
      "https://www.youtube.com/watch?v=dQw4w9WgXcQ&t=1s",
      "no id here"))
    assert(r === Seq("dQw4w9WgXcQ", "dQw4w9WgXcQ", ""))
  }

  test("F11 scrub + playlist synthesis + stem trim (cmds/archive.py:233,236,304)") {
    assert(one(Refine.scrubWhitespace($"x"), Seq(" a b c ")) === Seq("abc"))
    assert(one(Refine.synthPlaylistId($"x"), Seq("My List")) ===
      Seq("PLLOCAL_My_List"))
    assert(one(Refine.trimVideosSuffix($"x"),
      Seq("Favorites videos", "videos first")) ===
      Seq("Favorites", "videos first"))
  }

  test("F12 duration formatting floors to 1 decimal (utils.py:27-39)") {
    val r = Seq(45L, 90L, 7200L, 5430L).toDF("x")
      .select(Refine.fmtDuration($"x").as("r")).collect().map(_.get(0)).toSeq
    assert(r === Seq("45 seconds", "1.5 minutes", "2.0 hours", "1.5 hours"))
  }

  test("F13 ANSI stripping matches the reference's ANSI_ESCAPE (utils.py:12)") {
    val esc = "\u001b"
    val r = one(Refine.stripAnsi($"x"), Seq(
      s"$esc[31mred$esc[0m", // CSI color codes
      "keep [2m plain", // no ESC byte -> untouched
      s"two-byte ${esc}M escape")) // ESC + @-Z form
    assert(r === Seq("red", "keep [2m plain", "two-byte  escape"))
  }

  test("F16 yes/maybe/no classification (utils.py:14-16)") {
    val r = one(Refine.yesNo($"x"),
      Seq("YES", "go ahead", "nah", "don't", "perhaps", "dunno"))
    assert(r === Seq(1, 1, 0, 0, -1, -2))
  }
}
