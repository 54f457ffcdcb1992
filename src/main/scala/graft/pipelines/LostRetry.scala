package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Retry

/** The lost-video retry loop (cmds/archive.py:355-366) as a periodic
  * batch job (Trigger.AvailableNow semantics — SURVEY §2.9): scan rows
  * with availability='lost', attempt recovery through a fetch function
  * with bounded retry (S7), and mark successes 'recovered'.
  *
  * State lives in the sink table itself (no operator state), exactly like
  * the reference; re-running the job is idempotent because recovered rows
  * leave the 'lost' scan set.
  */
object LostRetry {

  /** One pass: returns the updated table. `fetch` is the recovery call
    * (network in production, stub in tests); executed per-partition on
    * executors. */
  def run(videos: DataFrame, fetch: String => Option[String],
      attempts: Int = 3, backoffMs: Long = 0)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val lost = videos.filter(col("availability") === "lost")
      .select(col("video_id")).as[String]
    val recovered = lost.mapPartitions { ids =>
      ids.flatMap { id =>
        Retry.withRetry(attempts, backoffMs, _ => ())(() =>
          fetch(id).getOrElse(throw new RuntimeException("miss")))
          .map(title => (id, title))
      }
    }.toDF("r_id", "r_title")
    videos.join(broadcast(recovered), col("video_id") === col("r_id"), "left")
      .withColumn("availability",
        when(col("r_id").isNotNull, lit("recovered"))
          .otherwise(col("availability")))
      .withColumn("title", coalesce(col("r_title"), col("title")))
      .drop("r_id", "r_title")
  }
}
