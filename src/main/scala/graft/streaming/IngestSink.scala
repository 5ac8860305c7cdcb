package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.storage.Storage
import graft.storage.Storage.TableLayout

/** Streaming ingest sink (reference ingest pipeline:
  * src/writer/src/processor.rs:14-46 — WAL → batch append every ~5 s with
  * idempotency markers; docs/architecture/storage-layout.md:17-40).
  *
  * Structured Streaming replaces the WAL role: the checkpoint is the
  * durability log, and exactly-once lands via the standard idempotent-sink
  * pattern — a marker file per (epoch, batchId); replayed batches see the
  * marker and no-op (mirror of wal_replay_idempotency.rs).
  */
object IngestSink {

  /** idempotent foreachBatch body — public so replay can be tested
    * directly: calling it twice with one batchId appends once. */
  def appendBatch(layout: TableLayout, table: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val markerDir = new Path(s"${layout.basePath}/_markers/${layout.tenant}/${layout.dataset}/$table")
    val marker = new Path(markerDir, s"batch-$batchId")
    val fs = markerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return // already committed — replay no-op
    Storage.append(batch, layout, table)
    fs.mkdirs(markerDir)
    fs.create(marker, true).close()
  }

  /** wire a streaming DataFrame into the partitioned store; ~5 s trigger
    * mirrors the reference's flush interval. */
  def start(stream: DataFrame, layout: TableLayout, table: String,
      checkpoint: String, triggerMs: Long = 5000L): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch(appendBatch(layout, table) _)
      .start()
}
