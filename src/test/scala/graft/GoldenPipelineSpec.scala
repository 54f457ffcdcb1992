package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Integrity
import graft.pipelines.VideoIngest
import graft.sinks.JdbcUpsertSink
import graft.sources.Sources

/** SURVEY §5.4 — end-to-end golden pipeline: yt-dlp JSONL fixture → E1
  * derivation → JDBC sink (Derby) → catalog state assertions → FK
  * integrity → cascade unarchive. The full write path a user of the
  * reference exercises, replayed through the Spark engine.
  */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val jsonlPath = {
    val p = Files.createTempFile("golden", ".jsonl")
    val lines = Seq(
      """{"id":"vid00000001","fulltitle":"First","description":"d1","channel_id":"ch1","channel":"Chan","uploader":"Upl","uploader_id":"u1","channel_follower_count":5,"thumbnail":"http://t/1.webp?x=1","duration":10,"view_count":100,"like_count":3,"upload_date":"20230101","availability":"public","categories":["Music"],"tags":["rock","live"],"comments":[{"id":"c1","author_id":"u2","author":"A2","text":"hi","like_count":1,"is_favorited":false,"author_is_uploader":false,"parent":"root","timestamp":1700000000},{"id":"c2","author_id":"u3","author":"A3","text":"re","like_count":0,"is_favorited":false,"author_is_uploader":false,"parent":"c1","timestamp":1700000100}]}""",
      """{"id":"vid00000002","fulltitle":"Second","description":"d2","channel_id":"ch1","channel":"Chan","uploader":"Upl","uploader_id":"u1","thumbnail":"http://t/2.jpg","duration":20,"view_count":50,"like_count":2,"upload_date":"20230202","availability":"public","tags":["rock"],"comments":[{"id":"c3","author_id":"u2","author":"A2","text":"x","like_count":0,"is_favorited":false,"author_is_uploader":false,"parent":"root","timestamp":1700000200}]}""")
    Files.writeString(p, lines.mkString("\n"))
    p.toString
  }

  test("E1 end-to-end: JSONL → derive relations → Derby → integrity → unarchive") {
    import spark.implicits._
    val info = Sources.ytdlpJsonl(spark, jsonlPath)
    val ryd = Seq.empty[(String, Long, Long, Double, Long)]
      .toDF("id", "likes", "dislikes", "rating", "viewCount")

    // derive the relation updates (E1)
    val videos = VideoIngest.refineMetadata(info, ryd)
    val users = VideoIngest.users(info)
      .unionByName(VideoIngest.commentAuthors(info))
      .dropDuplicates("user_id")
    val channels = VideoIngest.channels(info)
    val comments = VideoIngest.comments(info)
    val tags = VideoIngest.tags(info)
    val videoTags = VideoIngest.videoTags(info)

    // FK integrity before writing (J1): no orphans among derived updates
    assert(Integrity.fkViolations(comments, "author", users, "user_id").isEmpty)
    assert(Integrity.fkViolations(comments, "video",
      videos.select($"video_id"), "video_id").isEmpty)
    assert(Integrity.fkViolations(videoTags, "tag", tags, "name").isEmpty)
    assert(Integrity.fkViolations(videos, "channel", channels, "channel_id")
      .isEmpty)

    // sink of record: Derby (subset of columns for the golden check)
    val sink = JdbcUpsertSink("jdbc:derby:memory:golden;create=true",
      "videos", Seq("video_id"))
    sink.execDdl("""CREATE TABLE videos (
      video_id VARCHAR(11) PRIMARY KEY, title VARCHAR(100),
      category VARCHAR(50), filesize BIGINT)""")
    val slim = videos.select($"video_id", $"title", $"category", $"filesize")
    sink.upsert(slim, guard =
      (r: Row) => !r.isNullAt(r.fieldIndex("title")))
    assert(sink.queryCount() === 2)
    assert(sink.queryCount("category = 'Music'") === 1)

    // replay (exactly-once) then an upgraded row passes the guard
    sink.upsert(slim, (r: Row) => !r.isNullAt(r.fieldIndex("title")))
    assert(sink.queryCount() === 2)

    // catalog shape assertions
    assert(users.count() === 3) // u1 + comment authors u2, u3
    assert(comments.count() === 3)
    assert(videoTags.count() === 3) // (v1 rock, v1 live, v2 rock)
    assert(tags.count() === 2)

    // W5/J2/J3: unarchive vid00000001 → c1 and its reply c2 go, c3 stays
    val (survComments, survTags) = Integrity.unarchiveVideo(
      Seq("vid00000001").toDF("video_id"), "video_id", comments, videoTags)
    assert(survComments.select("comment_id").as[String].collect().toSet
      === Set("c3"))
    assert(survTags.select("tag").as[String].collect().toSet === Set("rock"))
  }
}
