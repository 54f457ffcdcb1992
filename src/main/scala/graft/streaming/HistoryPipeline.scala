package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Refine

/** The reference's watch-history ingest (E3, cmds/archive.py:317-352) as a
  * Structured Streaming pipeline: Takeout JSON events (titleUrl, time) →
  * id extraction (F10) → validity filter (F1) → timestamp parse (F7) →
  * dedup on (video, watched) (D2) → append sink.
  *
  * Works identically on a batch or streaming DataFrame (same transform
  * function — Structured Streaming's unified API). The streaming form adds
  * a watermark + dropDuplicatesWithinWatermark so operator state stays
  * bounded: the reference accepts arbitrarily late rows into an idempotent
  * PK-guarded sink, which maps to a generous watermark + idempotent
  * foreachBatch merge (SURVEY §2.9).
  */
object HistoryPipeline {

  /** Shared refine chain: raw (titleUrl, time) → (video, watched). */
  def refine(raw: DataFrame): DataFrame =
    raw
      .filter(col("titleUrl").isNotNull) // unavailable entries (A2 counter)
      .withColumn("video",
        Refine.scrubWhitespace(Refine.extractWatchId(col("titleUrl"))))
      .filter(Refine.isValidVideoId(col("video")))
      .withColumn("watched", Refine.parseIsoTs(col("time")))
      .filter(col("watched").isNotNull)
      .select(col("video"), col("watched"))

  /** Batch form with exact dedup (D2: distinct on the (video, watched)
    * pair, cmds/archive.py:340). */
  def batch(raw: DataFrame): DataFrame =
    refine(raw).dropDuplicates("video", "watched")

  /** Streaming form: watermarked dedup keeps state bounded while matching
    * the reference's accept-late-rows behavior within the watermark. */
  def stream(raw: DataFrame, watermark: String = "7 days"): DataFrame =
    refine(raw)
      .withWatermark("watched", watermark)
      .dropDuplicatesWithinWatermark("video", "watched")

  /** A2 — the unavailable-entry counter (cmds/archive.py:330-335). */
  def unavailableCount(raw: DataFrame): DataFrame =
    raw.agg(count(when(col("titleUrl").isNull, 1)).as("n_unavailable"),
      count(lit(1)).as("n_total"))
}
