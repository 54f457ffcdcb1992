package graft

import org.apache.spark.sql.types._

/** The 9-relation yark catalog as Spark StructTypes, plus the ingest-side
  * yt-dlp info-document schema.
  *
  * Type mapping (SURVEY §1.4): SQLite TEXT→String, INTEGER→Long,
  * flag-INTEGER→Boolean, epoch-INTEGER→Timestamp (UTC session),
  * REAL→Double, BLOB→Binary. All non-PK columns nullable, matching
  * `/root/reference/schema.sql` (implicit NULLs).
  */
object Schemas {

  /** schema.sql:3-6 */
  val users: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("username", StringType)))

  /** schema.sql:8-15 */
  val channels: StructType = StructType(Seq(
    StructField("channel_id", StringType, nullable = false),
    StructField("uploader_id", StringType),
    StructField("name", StringType),
    StructField("channel_follower_count", LongType),
    StructField("url", StringType)))

  /** schema.sql:17-19 */
  val tags: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false)))

  /** schema.sql:21-27 */
  val videoTags: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("video", StringType),
    StructField("tag", StringType)))

  /** schema.sql:29-42 — INTEGER flags → Boolean, epoch → Timestamp. */
  val comments: StructType = StructType(Seq(
    StructField("comment_id", StringType, nullable = false),
    StructField("video", StringType),
    StructField("author", StringType),
    StructField("content", StringType),
    StructField("likes", LongType),
    StructField("is_favorited", BooleanType),
    StructField("author_is_uploader", BooleanType),
    StructField("parent", StringType),
    StructField("timestamp", TimestampType)))

  /** schema.sql:44-68 — 22-column fact table; BLOB thumbnail → Binary. */
  val videos: StructType = StructType(Seq(
    StructField("video_id", StringType, nullable = false),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("channel", StringType),
    StructField("thumbnail", BinaryType),
    StructField("thumbnail_url", StringType),
    StructField("duration", LongType),
    StructField("views", LongType),
    StructField("age_limit", LongType),
    StructField("live_status", StringType),
    StructField("likes", LongType),
    StructField("dislikes", LongType),
    StructField("rating", DoubleType),
    StructField("upload_timestamp", TimestampType),
    StructField("availability", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("fps", DoubleType),
    StructField("audio_channels", LongType),
    StructField("category", StringType),
    StructField("filesize", LongType),
    StructField("archived", TimestampType)))

  /** schema.sql:70-74 — append-only watch log, deliberately no FK. */
  val history: StructType = StructType(Seq(
    StructField("history_id", LongType, nullable = false),
    StructField("video", StringType),
    StructField("watched", TimestampType)))

  /** schema.sql:76-84 */
  val playlists: StructType = StructType(Seq(
    StructField("playlist_id", StringType, nullable = false),
    StructField("channel", StringType),
    StructField("created", TimestampType),
    StructField("updated", TimestampType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("visibility", StringType)))

  /** schema.sql:86-92 — ordered membership (autoinc `pl` preserves order). */
  val playlistVideos: StructType = StructType(Seq(
    StructField("pl", LongType, nullable = false),
    StructField("playlist", StringType),
    StructField("video", StringType),
    StructField("added", TimestampType)))

  /** Ingest-side yt-dlp info document (fields consumed by
    * `__refine_metadata`/`video`, cmds/archive.py:82-198): nested
    * comments/tags/categories arrive as array columns and are exploded
    * into the child relations. */
  val ytdlpInfo: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("fulltitle", StringType),
    StructField("description", StringType),
    StructField("channel_id", StringType),
    StructField("channel", StringType),
    StructField("channel_url", StringType),
    StructField("uploader", StringType),
    StructField("uploader_id", StringType),
    StructField("channel_follower_count", LongType),
    StructField("thumbnail", StringType),
    StructField("duration", LongType),
    StructField("view_count", LongType),
    StructField("like_count", LongType),
    StructField("age_limit", LongType),
    StructField("live_status", StringType),
    StructField("upload_date", StringType), // "YYYYMMDD"
    StructField("availability", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("fps", DoubleType),
    StructField("audio_channels", LongType),
    StructField("categories", ArrayType(StringType)),
    StructField("filesize_approx", LongType),
    StructField("tags", ArrayType(StringType)),
    StructField("comments", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("author_id", StringType),
      StructField("author", StringType),
      StructField("text", StringType),
      StructField("like_count", LongType),
      StructField("is_favorited", BooleanType),
      StructField("author_is_uploader", BooleanType),
      StructField("parent", StringType),
      StructField("timestamp", LongType)))))))

  /** RYD enrichment record (cmds/archive.py:99-117). */
  val ryd: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("likes", LongType),
    StructField("dislikes", LongType),
    StructField("rating", DoubleType),
    StructField("viewCount", LongType)))

  /** Takeout watch-history entry (cmds/archive.py:322-339). */
  val takeoutHistory: StructType = StructType(Seq(
    StructField("titleUrl", StringType),
    StructField("time", StringType)))
}
