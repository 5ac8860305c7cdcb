package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.DoubleType

import graft.storage.Storage.TableLayout

/** Continuous Prometheus RECORDING RULE — the streaming twin of the
  * batch rule pipeline (q252: `rule_files` → recorded series →
  * consumers query the new name; reference recording semantics are the
  * batch `date_bin` eval, `src/querier/src/query/metrics.rs`).
  *
  * `<ruleName> = count_over_time(<metric>[<stepSec>])` evaluates as
  * tumbling event-time windows over the live metrics stream. Three
  * properties make this the scale-correct shape:
  *
  *  - APPEND output mode: a window emits exactly once, when the
  *    watermark passes its end — recorded samples are immutable, the
  *    same contract the batch rule's bucket rows have. State is one
  *    count per OPEN (window, series): series-cardinality-bound, not
  *    ingest-bound.
  *  - The derived samples land through [[IngestSink.appendBatch]]
  *    (idempotency markers), so a replayed micro-batch after a crash
  *    cannot double-record a window.
  *  - Window starts are origin-0 epoch-aligned (Spark's `window()`
  *    default), identical to the batch eval's `date_bin` buckets — a
  *    consumer PromQL query over the recorded name answers the same
  *    rows whether the rule ran batch or streaming.
  */
object RecordingRule {

  /** Start recording over a STREAMING metrics-shaped frame (Long-nanos
    * `timestamp`, `metric_name`, `value`, label columns). Derived
    * samples land in `layout`/`table` named `ruleName`, one row per
    * closed (stepSec window × series), `value` = sample count in the
    * window, `timestamp` = the window start (nanos). */
  def start(stream: DataFrame, layout: TableLayout, metric: String,
      ruleName: String, stepSec: Long, seriesLabels: Seq[String],
      lateness: String = "10 seconds",
      table: String = "metrics_gauge",
      triggerMs: Long = 500): StreamingQuery = {
    require(stream.isStreaming, "recording rule needs a streaming source")
    val keys = window(col("_event_time"), s"$stepSec seconds").as("w") +:
      seriesLabels.map(col)
    stream
      .filter(col("metric_name") === metric)
      .withColumn("_event_time", timestamp_micros(expr("timestamp div 1000")))
      .withWatermark("_event_time", lateness)
      .groupBy(keys: _*)
      .agg(count(lit(1)).cast(DoubleType).as("value"))
      .writeStream
      .outputMode("append") // closed windows only — recorded rows are final
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = batch.selectExpr(
          Seq("unix_micros(w.start) * 1000 AS timestamp",
            "unix_micros(w.start) * 1000 AS start_timestamp",
            s"'$ruleName' AS metric_name",
            s"'recorded by rule from $metric' AS metric_description",
            "'1' AS metric_unit",
            "map() AS resource_attributes",
            "map() AS scope_attributes",
            "map() AS attributes",
            "0 AS flags", "CAST(NULL AS STRING) AS exemplars",
            "value") ++ seriesLabels: _*)
        IngestSink.appendBatch(layout, table)(rows, batchId)
      }
      .start()
  }
}
