package graft.sql

import java.util.concurrent.CountDownLatch
import java.util.concurrent.TimeUnit.MILLISECONDS
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession

/** Per-query wall-clock bound (reference: src/querier/src/flight.rs:
  * 2106-2112 — every ticket's future is wrapped in
  * `tokio::time::timeout(limits.query_timeout, …)` and a heavy scan can
  * never occupy the querier indefinitely).
  *
  * Spark translation: the ACTION (the reference's "query future") runs
  * in a worker thread that first registers a fresh job group with
  * `interruptOnCancel = true`; on deadline the group is cancelled —
  * Spark interrupts the running tasks on every executor, so the scan
  * actually stops consuming cluster resources rather than racing on in
  * the background — and the caller gets a typed QueryTimeout, the
  * deadline_exceeded analog. Plan construction is lazy and free; the
  * guard belongs where execution starts (collect/show/write), which is
  * where ApiJson envelopes and the SQL surface materialize.
  */
object QueryGuard {

  final case class QueryTimeout(timeoutMs: Long)
    extends RuntimeException(
      s"query exceeded the configured timeout of ${timeoutMs} ms")

  /** run `action` under a cancellable job group, bounded by `timeoutMs`
    * of wall clock. Throws QueryTimeout on deadline (after cancelling the
    * group) and rethrows the action's own failure otherwise. */
  def withTimeout[T](spark: SparkSession, timeoutMs: Long,
      desc: String = "query")(action: => T): T = {
    val sc = spark.sparkContext
    val groupId = s"graft-query-${java.util.UUID.randomUUID()}"
    val result = new AtomicReference[Either[Throwable, T]]()
    val done = new CountDownLatch(1)
    val worker = new Thread(() => {
      try {
        // job-group registration is thread-local — every job the action
        // triggers from this thread belongs to the cancellable group
        sc.setJobGroup(groupId, desc, interruptOnCancel = true)
        result.set(Right(action))
      } catch { case e: Throwable => result.set(Left(e)) }
      finally {
        sc.clearJobGroup()
        done.countDown()
      }
    }, groupId)
    worker.setDaemon(true)
    worker.start()
    if (!done.await(timeoutMs, MILLISECONDS)) {
      sc.cancelJobGroup(groupId)
      throw QueryTimeout(timeoutMs)
    }
    result.get() match {
      case Right(v) => v
      case Left(e)  => throw e
    }
  }
}
