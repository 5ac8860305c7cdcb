package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING tail-based trace sampling — the OTel collector's
  * tail_sampling processor as a Structured Streaming operator (the
  * batch decision summary is q327; this is the online form). Spans
  * shuffle by trace_id into `flatMapGroupsWithState`; per-trace state
  * is a FIXED-SIZE fact tuple (span count, error flag, min start / max
  * end nanos) — never the spans themselves, so state is O(open traces)
  * regardless of trace width. A trace decides once its decision_wait
  * has elapsed past the watermark with no further spans (the event-time
  * timeout), then policies apply in priority order:
  *
  *   error        any span with an error status
  *   slow         wall (max end − min start) ≥ the configured threshold
  *                (OTel's latency policy is a configured bound; the
  *                batch q327 derives its bound from the corpus p95)
  *   probabilistic md5(trace_id) % 100 < pct — deterministic, so replay
  *                after a crash re-decides IDENTICALLY (a random coin
  *                would break exactly-once downstream)
  *   drop         otherwise
  *
  * Late spans after the decision re-open the trace and emit a
  * compensating decision row (same trace, higher revision) — the
  * downstream sink keys by (trace_id, revision) and keeps the max, the
  * usual streaming-upsert discipline.
  */
object StreamTailSample {

  final case class Span(traceId: String, tsNs: Long, durNs: Long,
    isError: Boolean)
  final case class TraceFacts(nSpans: Int, hasError: Boolean,
    minStartNs: Long, maxEndNs: Long, revision: Int)
  final case class Decision(traceId: String, nSpans: Int, wallNs: Long,
    keep: Boolean, reason: String, revision: Int)

  /** the deterministic coin: first 60 md5 bits of the trace id mod 100. */
  private[streaming] def coin(traceId: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ts:$traceId".getBytes("UTF-8"))
    val hex = d.take(8).map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 100).toInt
  }

  private def decide(latencyNs: Long, pct: Int)(traceId: String,
      f: TraceFacts): Decision = {
    val wall = f.maxEndNs - f.minStartNs
    val (keep, reason) =
      if (f.hasError) (true, "error")
      else if (wall >= latencyNs) (true, "slow")
      else if (coin(traceId) < pct) (true, "probabilistic")
      else (false, "drop")
    Decision(traceId, f.nSpans, wall, keep, reason, f.revision)
  }

  private def update(decisionWaitSec: Long, latencyNs: Long, pct: Int)(
      traceId: String, spans: Iterator[Span],
      state: GroupState[TraceFacts]): Iterator[Decision] = {
    if (state.hasTimedOut) {
      val f = state.get
      if (f.nSpans == 0) { // tombstone expired with no late spans
        state.remove()
        return Iterator.empty
      }
      // decide, then hold an EMPTY tombstone for 10 decision-waits: a
      // late span inside the TTL lands on it and re-decides under the
      // bumped revision; past the TTL the tombstone self-purges and a
      // later-still span restarts at revision 0 — the bounded-state
      // tradeoff every watermark-scoped operator makes (state stays
      // O(open + recently-decided traces), never O(history))
      state.update(TraceFacts(0, hasError = false,
        Long.MaxValue, Long.MinValue, f.revision + 1))
      state.setTimeoutTimestamp(
        state.getCurrentWatermarkMs() + decisionWaitSec * 10000L + 1L)
      return Iterator(decide(latencyNs, pct)(traceId, f))
    }
    var f = state.getOption.getOrElse(
      TraceFacts(0, hasError = false, Long.MaxValue, Long.MinValue, 0))
    var maxTs = Long.MinValue
    for (s <- spans) {
      f = TraceFacts(f.nSpans + 1, f.hasError || s.isError,
        math.min(f.minStartNs, s.tsNs),
        math.max(f.maxEndNs, s.tsNs + s.durNs), f.revision)
      maxTs = math.max(maxTs, s.tsNs)
    }
    state.update(f)
    // decide decision_wait past the trace's newest span, but never at
    // or below the watermark (Spark rejects that): the decision then
    // fires on the first batch whose watermark passes it
    val wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(
      math.max(wm + 1L, maxTs / 1000000L + decisionWaitSec * 1000L))
    Iterator.empty
  }

  /** spans (event-time watermark applied upstream on `tsNs`-derived
    * time) → sampling decisions, one per trace once quiet for
    * `decisionWaitSec`. */
  def decisions(spans: Dataset[Span], decisionWaitSec: Long,
      latencyThresholdNs: Long, keepPct: Int): Dataset[Decision] = {
    implicit val fe = Encoders.product[TraceFacts]
    implicit val de = Encoders.product[Decision]
    spans.groupByKey(_.traceId)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(decisionWaitSec, latencyThresholdNs, keepPct))
  }
}
