package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.VideoIngest

/** E1 golden pipeline on a yt-dlp-shaped fixture (FIXTURES.md A2 edge
  * rows: default description, ?query thumbnails, root parents, missing
  * categories, RYD fallback). */
class VideoIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val infoDf = {
    val jsonl = Seq(
      // full row: default desc (blanked), thumbnail w/ query, RYD present
      """{"id":"vid00000001","fulltitle":"T1",
         "description":"Enjoy the videos and music you love, upload original content, and share it all with friends, family, and the world on YouTube.",
         "channel_id":"ch1","channel":"Chan One","channel_url":"http://c/1",
         "uploader":"Upl One","uploader_id":"u1","channel_follower_count":10,
         "thumbnail":"http://t/1.webp?sig=abc","duration":60,
         "view_count":100,"like_count":5,"age_limit":0,"live_status":"not_live",
         "upload_date":"20230102","availability":"public","width":1920,
         "height":1080,"fps":30.0,"audio_channels":2,
         "categories":["Music","Other"],"filesize_approx":1234,
         "tags":["rock","live"],
         "comments":[
           {"id":"c1","author_id":"u2","author":"A2","text":"hi","like_count":1,
            "is_favorited":false,"author_is_uploader":false,"parent":"root",
            "timestamp":1700000000},
           {"id":"c2","author_id":"u3","author":"A3","text":"re","like_count":0,
            "is_favorited":true,"author_is_uploader":false,"parent":"c1",
            "timestamp":1700000100}]}""",
      // sparse row: no categories/comments/tags, no RYD, custom desc
      """{"id":"vid00000002","fulltitle":null,"description":"mine",
         "channel_id":"ch1","channel":null,"uploader":null,"uploader_id":"u1",
         "thumbnail":"http://t/2.jpg","upload_date":null,
         "view_count":7,"like_count":null}"""
    ).map(_.replaceAll("\n\\s*", ""))
    import spark.implicits._
    spark.read.schema(Schemas.ytdlpInfo).json(jsonl.toDS)
  }

  private lazy val ryd = {
    import spark.implicits._
    Seq(("vid00000001", 50L, 3L, 4.5, 999L))
      .toDF("id", "likes", "dislikes", "rating", "viewCount")
  }

  test("refineMetadata: F2/F4/F5/F6/F7/F8 chain") {
    val v = VideoIngest.refineMetadata(infoDf, ryd)
    assert(v.schema.fieldNames.toSeq === Schemas.videos.fieldNames.toSeq)
    val r1 = v.filter(col("video_id") === "vid00000001").collect()(0)
    assert(r1.getAs[String]("description") === "") // F4 blanked
    assert(r1.getAs[String]("thumbnail_url") === "http://t/1.webp") // F2
    assert(r1.getAs[Long]("likes") === 50L) // F5: RYD wins
    assert(r1.getAs[Long]("views") === 999L)
    assert(r1.getAs[String]("category") === "Music") // F8
    assert(r1.getAs[Long]("filesize") === 1234L) // F6 rename
    assert(r1.getAs[java.sql.Timestamp]("upload_timestamp").toString
      .startsWith("2023-01-02"))
    val r2 = v.filter(col("video_id") === "vid00000002").collect()(0)
    assert(r2.getAs[String]("description") === "mine")
    assert(r2.getAs[Long]("likes") === 0L || r2.isNullAt(r2.fieldIndex("likes"))) // no RYD, null like_count
    assert(r2.getAs[Long]("views") === 7L) // fallback to view_count
    assert(r2.isNullAt(r2.fieldIndex("category")))
  }

  test("dimensions: users/channels coalesce chains (F5)") {
    import spark.implicits._
    val u = VideoIngest.users(infoDf).as[(String, String)].collect().toMap
    assert(u === Map("u1" -> "Upl One")) // uploader ?? channel ?? uploader_id
    val ch = VideoIngest.channels(infoDf).collect()
    assert(ch.length === 1)
    assert(ch(0).getAs[String]("name") === "Chan One")
  }

  test("comments explode: F9 root→NULL, F14 bool flags, epoch→ts") {
    import spark.implicits._
    val c = VideoIngest.comments(infoDf)
    val rows = c.orderBy($"comment_id").collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("parent"))) // root → NULL
    assert(rows(1).getAs[String]("parent") === "c1")
    assert(rows(1).getAs[Boolean]("is_favorited"))
    assert(rows(0).getAs[java.sql.Timestamp]("timestamp").toInstant
      .getEpochSecond === 1700000000L)
    val authors = VideoIngest.commentAuthors(infoDf).as[(String, String)]
      .collect().toMap
    assert(authors === Map("u2" -> "A2", "u3" -> "A3"))
  }

  test("tags + video_tags: distinct vocabulary, deterministic surrogate id") {
    import spark.implicits._
    val t = VideoIngest.tags(infoDf).as[String].collect().sorted
    assert(t === Array("live", "rock"))
    val vt = VideoIngest.videoTags(infoDf)
    assert(vt.count() === 2)
    // deterministic across evaluations (replay idempotence)
    val ids1 = vt.orderBy($"tag").select("id").as[Long].collect()
    val ids2 = VideoIngest.videoTags(infoDf).orderBy($"tag").select("id")
      .as[Long].collect()
    assert(ids1 === ids2)
  }
}
