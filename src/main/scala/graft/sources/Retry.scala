package graft.sources

import scala.util.{Failure, Success, Try}

/** Source-connector resilience shapes from the reference:
  *
  *  - S7 fallback source with bounded retry: Wayback recovery, 3 attempts
  *    with a 2 s sleep between (cmds/archive.py:69-79).
  *  - S8 side-lookup enrichment with timeout + empty fallback: RYD call,
  *    1 s timeout, {} on failure (cmds/archive.py:97-103).
  *
  * These run *inside* mapPartitions/foreachPartition on executors — the
  * driver never blocks on I/O, and each partition amortizes client setup.
  */
object Retry {

  /** S7 — call `f` up to `attempts` times, sleeping `backoffMs` between
    * failures; None when every attempt failed (→ lost-stub path,
    * cmds/archive.py:133). */
  def withRetry[T](attempts: Int = 3, backoffMs: Long = 2000,
      sleep: Long => Unit = Thread.sleep)(f: () => T): Option[T] = {
    var left = attempts
    while (left > 0) {
      Try(f()) match {
        case Success(v) => return Some(v)
        case Failure(_) =>
          left -= 1
          if (left > 0) sleep(backoffMs)
      }
    }
    None
  }

  /** S8 — enrichment call with a deadline; fallback value on failure or
    * timeout (the reference's empty-dict fallback). The call runs on a
    * bounded single-thread executor per invocation site. */
  def withTimeout[T](timeoutMs: Long, fallback: T)(f: () => T): T = {
    val task = new java.util.concurrent.FutureTask[T](() => f())
    val t = new Thread(task); t.setDaemon(true); t.start()
    try task.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch { case _: Throwable => task.cancel(true); fallback }
  }
}
