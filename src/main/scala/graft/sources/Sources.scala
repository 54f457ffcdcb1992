package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Schemas

/** Document sources from the reference (SURVEY §2.1):
  *  - S4 Takeout watch-history: one JSON array of objects → multiLine read
  *    with the explicit schema (cmds/archive.py:321-331).
  *  - S5 Takeout playlist CSV with header (see PlaylistIngest.readCsv).
  *  - S6 yt-dlp info documents: pre-fetched JSONL, nested
  *    comments/tags/categories as array columns (cmds/archive.py:62-67).
  *
  * Explicit schemas everywhere — schema inference is a full extra pass
  * over the data at 100 TB and makes nullability nondeterministic.
  */
object Sources {

  /** S4 — Takeout watch-history JSON array. */
  def takeoutHistoryJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(Schemas.takeoutHistory)
      .json(path)

  /** S6 — yt-dlp info JSONL (one document per line). */
  def ytdlpJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.ytdlpInfo).json(path)

  /** S4 streaming twin — watch-history events as JSONL files landing in a
    * directory (the file-source form of the history ingest; new files are
    * discovered per micro-batch, offsets tracked in the checkpoint). */
  def takeoutHistoryStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Schemas.takeoutHistory).json(dir)
}
