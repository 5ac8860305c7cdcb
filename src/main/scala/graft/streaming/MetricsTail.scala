package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.DoubleType

/** Metrics live tail — the streaming twin of the PromQL bare-selector
  * eval (`Eval.instant`): per (step bucket, series) LAST sample, updating
  * as samples arrive. The reference has no streaming metrics surface at
  * all (its tail endpoint is logs-only and returns 501); Structured
  * Streaming makes this the same plan as the batch path — a windowed
  * `max_by` over the (timestamp, tieBreak) struct — in update mode.
  *
  * Scale shape: state is ONE row per open (bucket, series), and the
  * watermark closes buckets past the lateness allowance, so state size is
  * series-cardinality-bound, not ingest-bound. No sort, no row_number —
  * the same hash-aggregate shape the batch instant eval pins.
  */
object MetricsTail {

  /** start tailing a STREAMING metrics-shaped frame (Long-nanos
    * `timestamp`, `metric_name`, `value`, label + tieBreak columns);
    * last-sample-per-bucket rows land in the in-memory table `name`
    * (poll with `spark.table(name)`, newest emission per key wins). */
  def start(stream: DataFrame, stepSec: Long, name: String,
      seriesLabels: Seq[String], tieBreak: Seq[String],
      lateness: String = "10 seconds", triggerMs: Long = 500): StreamingQuery = {
    require(stream.isStreaming, "metrics tail needs a streaming source")
    val ord = struct((col("timestamp") +: tieBreak.map(col)): _*)
    val keys = window(col("_event_time"), s"$stepSec seconds").as("w") +:
      (col("metric_name") +: seriesLabels.map(col))
    stream
      .withColumn("_event_time", timestamp_micros(expr("timestamp div 1000")))
      .withWatermark("_event_time", lateness)
      .groupBy(keys: _*)
      .agg(max_by(col("value").cast(DoubleType), ord).as("value"))
      .withColumn("bucket_start", unix_seconds(col("w.start")))
      .drop("w")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
  }
}
