package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** R11 — lifecycle / fault handling. The reference installs a shutdown
  * hook that closes the topology within a 5 s budget and tracks state
  * via a latch (KStreamsToKTable.java:188-218). The Spark twins:
  * a StreamingQueryListener observing every query's start / progress /
  * termination (the monitoring side), and a bounded-time graceful
  * shutdown of all active queries (the close-timeout side).
  */
object Lifecycle {

  /** Counts query lifecycle events; `lastException` captures the first
    * failure so a supervisor can act on it. */
  final class QueryMonitor extends StreamingQueryListener {
    val started = new AtomicInteger(0)
    val progressed = new AtomicInteger(0)
    val terminated = new AtomicInteger(0)
    @volatile var lastException: Option[String] = None

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      started.incrementAndGet()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      progressed.incrementAndGet()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      terminated.incrementAndGet()
      e.exception.foreach(ex => lastException = Some(ex))
    }
  }

  /** Run `body` with a monitor attached; detach afterwards (listeners
    * leak across queries otherwise). Termination events are delivered
    * asynchronously — `awaitTerminated` spins briefly for them. */
  def withMonitor[T](spark: SparkSession)(body: => T): (T, QueryMonitor) = {
    val m = new QueryMonitor
    spark.streams.addListener(m)
    try (body, m) finally spark.streams.removeListener(m)
  }

  /** Wait until the monitor has seen `n` terminations (listener bus is
    * async; bounded wait, ~reference's 5 s close budget). */
  def awaitTerminated(m: QueryMonitor, n: Int, timeoutMs: Long = 5000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (m.terminated.get() < n && System.nanoTime() < deadline) Thread.sleep(20)
    m.terminated.get() >= n
  }

  /** Graceful stop of every active query within a time budget — the
    * reference's `streams.close(Duration.ofSeconds(5))`. */
  def shutdownAll(spark: SparkSession, timeoutMs: Long = 5000): Unit =
    spark.streams.active.foreach { q =>
      try {
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(timeoutMs)
      } catch { case _: Exception => () } // stop() is best-effort on a failed query
    }
}
