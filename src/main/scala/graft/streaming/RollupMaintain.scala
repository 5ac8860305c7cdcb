package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.storage.Storage
import graft.storage.Storage.TableLayout

/** Incremental maintenance of the hourly rollup — the online half of the
  * q270 materialized-view rewrite (reference: the compactor materializes
  * downsampled cells as a batch job; keeping them fresh against live
  * ingest is what makes the rewrite serve DASHBOARDS, not just history).
  *
  * Each micro-batch folds into the stored cells in three bounded steps:
  * (1) downsample the batch alone (cells are made associative by the
  * (tlast, tielast) merge key, Storage.downsample); (2) read back ONLY
  * the day partitions the batch touched and merge cell-with-cell
  * (Storage.mergeCells — algebraic, so any batching of the raw stream
  * folds to the same rollup); (3) dynamic-partition-overwrite those same
  * days. Work per batch is O(batch + touched cells), never O(history).
  * Replay safety is the same marker protocol as IngestSink: a batch id
  * whose marker exists is skipped, so a crash between write and marker
  * re-runs one idempotent overwrite. */
object RollupMaintain {

  /** foreachBatch body: fold `batch` (raw sample rows) into the rollup
    * table at `layout`/`table`. */
  def maintainBatch(layout: TableLayout, table: String,
      stepSec: Long, seriesCols: Seq[String], tieCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val markerDir = new Path(
      s"${layout.basePath}/_markers/${layout.tenant}/${layout.dataset}/$table")
    val marker = new Path(markerDir, s"batch-$batchId")
    val fs = markerDir.getFileSystem(conf)
    if (fs.exists(marker)) return // replayed batch — already folded

    val newCells = Storage.downsample(batch, stepSec, seriesCols, tieCol)
      .persist()
    try {
      val touchedDays = newCells.select(col("date_day")).distinct()
        .collect().map(_.get(0).toString)
      if (touchedDays.isEmpty) return
      val tablePath = new Path(layout.path(table))
      val existing =
        if (fs.exists(tablePath))
          spark.read.parquet(tablePath.toString)
            .filter(col("date_day").isin(touchedDays: _*))
        else newCells.limit(0)
      val merged = Storage.mergeCells(
        existing.unionByName(newCells, allowMissingColumns = true),
        seriesCols)

      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      merged.write.mode("overwrite")
        .partitionBy("date_day")
        .parquet(tablePath.toString)

      fs.mkdirs(markerDir)
      fs.create(marker, true).close()
    } finally newCells.unpersist()
  }
}
