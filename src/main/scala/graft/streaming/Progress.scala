package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** A4 — progress / ETA (utils.py:41-43): remaining ≈ elapsed × (n/i − 1),
  * plus a StreamingQueryListener exposing per-batch throughput — the
  * streaming analogue of the reference's interactive progress line.
  */
object Progress {

  /** The reference's ETA extrapolation (utils.py:41-43). */
  def etaSeconds(elapsedSec: Double, position: Long, total: Long): Double = {
    require(position > 0, "position must be positive")
    elapsedSec * (total.toDouble / position - 1.0)
  }

  /** Per-batch progress record captured by [[Listener]]. */
  final case class BatchProgress(batchId: Long, numInputRows: Long,
      inputRowsPerSecond: Double)

  /** Collects micro-batch progress; attach via
    * spark.streams.addListener(new Progress.Listener). */
  final class Listener extends StreamingQueryListener {
    val batches = new ConcurrentLinkedQueue[BatchProgress]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      batches.add(BatchProgress(e.progress.batchId,
        e.progress.numInputRows, e.progress.inputRowsPerSecond))
  }
}
