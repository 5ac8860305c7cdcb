package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state — the Structured Streaming
  * counterpart of the batch q18 operator (window lag + running sum).
  *
  * `flatMapGroupsWithState` keeps ONE open session per key in the state
  * store; a session closes when the inactivity gap elapses, observed
  * either by a later event (emitted inline) or by the event-time timeout
  * after the watermark passes (emitted on timeout). State is O(keys),
  * never O(events) — the shape that survives unbounded streams: each
  * micro-batch shuffles only its own events by key, and the state store
  * is checkpointed incrementally with exactly-once semantics alongside
  * the idempotent sink (IngestSink).
  */
object Sessionize {

  final case class Event(userId: Long, tsSec: Long)
  final case class SessionState(startSec: Long, lastSec: Long, nEvents: Int)
  final case class Session(userId: Long, startSec: Long, endSec: Long, nEvents: Int)

  /** fold a key's new events into the open session, closing on gap. */
  private def update(gapSec: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.startSec, s.lastSec, s.nEvents))
    }
    val sorted = events.toSeq.sortBy(_.tsSec)
    val closed = Seq.newBuilder[Session]
    var cur = state.getOption
    for (e <- sorted) {
      cur match {
        case Some(s) if e.tsSec - s.lastSec > gapSec =>
          closed += Session(userId, s.startSec, s.lastSec, s.nEvents)
          cur = Some(SessionState(e.tsSec, e.tsSec, 1))
        case Some(s) =>
          // a cross-batch late event may precede the stored session start —
          // extend the session backwards too, not only forwards
          cur = Some(SessionState(math.min(s.startSec, e.tsSec),
            math.max(s.lastSec, e.tsSec), s.nEvents + 1))
        case None =>
          cur = Some(SessionState(e.tsSec, e.tsSec, 1))
      }
    }
    for (s <- cur) {
      state.update(s)
      // close via event-time timeout once the watermark passes the gap.
      // Spark rejects a timeout at or below the current watermark (the
      // batch may deliver events only slightly above it), so clamp to
      // watermark+1ms — the session then closes on the next batch.
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(wm + 1L, (s.lastSec + gapSec) * 1000L))
    }
    closed.result().iterator
  }

  /** events (with an event-time watermark already applied upstream) →
    * closed sessions. */
  def sessions(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    implicit val se = Encoders.product[SessionState]
    implicit val oe = Encoders.product[Session]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(gapSec))
  }
}
