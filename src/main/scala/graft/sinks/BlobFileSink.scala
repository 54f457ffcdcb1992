package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** S10 — file sink for binary payloads (the thumbnail dump,
  * cmds/archive.py:201-221): one file per row at `<dir>/<id>.<ext>`,
  * skipping files that already exist (D4 idempotence, line 213), with
  * written/skipped counters (A1, lines 208,216,218) as accumulators.
  *
  * Scale: pure executor-side foreachPartition — no driver involvement,
  * no shuffle; blobs flow straight from the scan to the filesystem.
  * Expects columns: id (string-able), payload (binary), ext (string).
  */
object BlobFileSink {

  /** Returns (written, skipped) counts. */
  def dump(df: DataFrame, dir: String): (Long, Long) = {
    val spark = df.sparkSession
    val written: LongAccumulator = spark.sparkContext.longAccumulator("written")
    val skipped: LongAccumulator = spark.sparkContext.longAccumulator("skipped")
    Files.createDirectories(Paths.get(dir))
    df.select("id", "payload", "ext").foreachPartition {
      (rows: Iterator[Row]) =>
        rows.foreach { r =>
          val id = String.valueOf(r.get(0))
          val payload = r.getAs[Array[Byte]](1)
          val ext = r.getString(2)
          if (payload != null) {
            val p = Paths.get(dir, s"$id.$ext")
            if (Files.exists(p)) skipped.add(1) // D4: skip existing
            else {
              Files.write(p, payload, StandardOpenOption.CREATE_NEW)
              written.add(1)
            }
          }
        }
    }
    (written.value, skipped.value)
  }
}
