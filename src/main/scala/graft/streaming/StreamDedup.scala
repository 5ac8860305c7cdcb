package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup for the ingest path: drop re-deliveries of the
  * same content within the watermark horizon.
  *
  * `dropDuplicatesWithinWatermark` keys state by the content hash and
  * expires each key once the watermark passes its last-seen event time —
  * state is bounded by (arrival rate × watermark), not by stream history,
  * which is what survives an unbounded 100 TB/day firehose. Batch exact
  * dedup (q20) is the offline twin; this is the online one. The WAL
  * replay idempotency in IngestSink dedups by batch id (exactly-once
  * sink); this dedups by content (at-least-once upstream producers).
  */
object StreamDedup {

  /** events with an event-time column `ts` and a text `body`: keep the
    * first delivery of each body hash within the lateness horizon. */
  def dedupByContent(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withColumn("content_hash", md5(col("body")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
}
