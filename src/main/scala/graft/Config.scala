package graft

import org.apache.spark.sql.SparkSession

/** §2.10 — the reference's JSON config store gating optional pipeline
  * stages (cmds/configs.py:6,15-33; read at cmds/archive.py:62,85):
  * `thumbnails` gates the blob fetch (S9), `comments` gates comment
  * extraction. Mapped to Spark job conf keys so plan construction — not
  * runtime branching — decides which stages exist (the cheap-first
  * optimization in SURVEY §4).
  */
final case class Config(thumbnails: Boolean, comments: Boolean)

object Config {
  val Defaults: Config = Config(thumbnails = true, comments = true)

  /** Read from spark conf: spark.graft.thumbnails / spark.graft.comments. */
  def fromSpark(spark: SparkSession): Config = Config(
    thumbnails = spark.conf.get("spark.graft.thumbnails", "true").toBoolean,
    comments = spark.conf.get("spark.graft.comments", "true").toBoolean)
}
