package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup detection — the online counterpart of the batch
  * SimHash family (q23/q134): flag an arriving document whose 64-bit
  * signature is within Hamming distance k of anything seen in the
  * lateness horizon.
  *
  * Same pigeonhole banding as the batch path: the signature splits into
  * 4×16-bit bands, and hamming(a,b) ≤ 3 forces at least one band to
  * match EXACTLY — so state is keyed by (band, band value) and an
  * arriving doc is compared only against its 4 band groups, never the
  * stream. Per-group state holds the recent signatures of that band
  * value (bounded by arrival rate × horizon; hot bands hold near-dups
  * of each other, the clustered-duplicate case where emitting early is
  * exactly the point). Expiry is event-time: entries older than the
  * horizon are pruned as the watermark advances, and an idle group's
  * state is removed wholesale by timeout — state never grows with
  * stream history. A match can surface in several bands; downstream
  * consumers (or `dropDuplicatesWithinWatermark`) collapse the pair.
  */
object StreamNearDup {

  final case class Doc(docId: Long, tsSec: Long, sig: Long)
  final case class Banded(band: Int, key: Int, docId: Long, tsSec: Long, sig: Long)
  final case class BandState(docs: Seq[Doc])
  final case class NearDup(docId: Long, matchedId: Long, hamming: Int)

  private def update(maxHamming: Int, horizonSec: Long)(
      bandKey: (Int, Int), docs: Iterator[Banded],
      state: GroupState[BandState]): Iterator[NearDup] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val out = Seq.newBuilder[NearDup]
    var kept = state.getOption.map(_.docs).getOrElse(Seq.empty)
    // event-time prune: the watermark bounds how late a comparand can
    // still arrive, so anything older than horizon before it is dead
    val wmSec = state.getCurrentWatermarkMs() / 1000L
    kept = kept.filter(_.tsSec >= wmSec - horizonSec)
    for (b <- docs.toSeq.sortBy(d => (d.tsSec, d.docId))) {
      for (prev <- kept if prev.docId != b.docId) {
        val h = java.lang.Long.bitCount(prev.sig ^ b.sig)
        if (h <= maxHamming) out += NearDup(b.docId, prev.docId, h)
      }
      kept = kept :+ Doc(b.docId, b.tsSec, b.sig)
    }
    state.update(BandState(kept))
    val newestMs = kept.map(_.tsSec).max * 1000L
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1L,
        newestMs + horizonSec * 1000L))
    out.result().iterator
  }

  /** docs (a DataFrame with docId/tsSec/sig and an event-time WATERMARKED
    * column) → near-dup matches (newer docId against each retained older
    * matchedId, per band — distinct-collapse downstream). Banding stays
    * in the Column domain (explode, not an object flatMap) so the
    * watermark column survives into the stateful operator. */
  def matches(docs: org.apache.spark.sql.DataFrame, maxHamming: Int = 3,
      horizonSec: Long = 3600): Dataset[NearDup] = {
    import org.apache.spark.sql.functions._
    import docs.sparkSession.implicits._
    require(maxHamming <= 3,
      "4x16 banding guarantees a shared band only up to hamming 3")
    val banded = docs
      .withColumn("band", explode(expr("sequence(0, 3)")))
      .withColumn("key",
        expr("CAST(shiftright(sig, 16 * band) & 65535 AS INT)"))
      .withColumn("band", col("band").cast("int"))
      .as[Banded] // lazy typed view — extra (watermarked) columns ride along
    implicit val se = Encoders.product[BandState]
    implicit val oe = Encoders.product[NearDup]
    banded.groupByKey(x => (x.band, x.key))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(maxHamming, horizonSec))
  }
}
