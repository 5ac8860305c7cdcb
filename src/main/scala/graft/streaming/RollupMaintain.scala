package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * folds to the same rollup); (3) swap those day partitions in. Work per
  * batch is O(batch + touched cells), never O(history).
  *
  * Replay is exactly-once via stage-then-commit, NOT the bare
  * write-then-marker order (which re-folds a batch that crashed between
  * the overwrite and the marker, double-counting n/vsum):
  *
  *   1. write the merged day partitions to a per-batch STAGING dir;
  *   2. create the marker — the single commit point;
  *   3. swap each staged `date_day=` dir into the table by atomic rename
  *      and delete the staging dir.
  *
  * Crash before (2): the table is untouched and replay recomputes from
  * the same pre-fold state (stale staging is overwritten). Crash after
  * (2): replay sees the marker and COMPLETES the swap from staging — it
  * never re-reads or re-folds the batch, so cells are folded exactly
  * once. Per-day rename is atomic on HDFS-semantics filesystems; the
  * swap itself assumes the table's single-writer convention (same as
  * IngestSink). */
object RollupMaintain {

  /** crash simulation for specs: thrown between protocol steps. */
  final class InjectedCrash(at: String) extends RuntimeException(s"injected crash $at")

  /** foreachBatch body: fold `batch` (raw sample rows) into the rollup
    * table at `layout`/`table`. `crashAt` (specs only) aborts after the
    * named protocol step — "stage" or "marker" — to exercise recovery. */
  def maintainBatch(layout: TableLayout, table: String,
      stepSec: Long, seriesCols: Seq[String], tieCol: String,
      crashAt: String = "")(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val markerDir = new Path(
      s"${layout.basePath}/_markers/${layout.tenant}/${layout.dataset}/$table")
    val marker = new Path(markerDir, s"batch-$batchId")
    val fs = markerDir.getFileSystem(conf)
    val tablePath = new Path(layout.path(table))
    val staging = new Path(
      s"${layout.basePath}/_staging/${layout.tenant}/${layout.dataset}/$table/batch-$batchId")

    if (fs.exists(marker)) {
      // Batch already committed. If the crash hit between marker and
      // swap, staged partitions are still present — finish the swap.
      completeSwap(fs, staging, tablePath)
      return
    }

    val newCells = Storage.downsample(batch, stepSec, seriesCols, tieCol)
      .persist()
    try {
      val touchedDays = newCells.select(col("date_day")).distinct()
        .collect().map(_.get(0).toString)
      if (touchedDays.isEmpty) return
      val existing =
        if (fs.exists(tablePath))
          spark.read.parquet(tablePath.toString)
            .filter(col("date_day").isin(touchedDays: _*))
        else newCells.limit(0)
      val merged = Storage.mergeCells(
        existing.unionByName(newCells, allowMissingColumns = true),
        seriesCols)

      // (1) stage: a fresh per-batch dir, so no dynamic-overwrite session
      // conf is needed and a pre-marker crash leaves the table untouched.
      merged.write.mode("overwrite")
        .partitionBy("date_day")
        .parquet(staging.toString)
      if (crashAt == "stage") throw new InjectedCrash("after stage")

      // (2) commit point.
      fs.mkdirs(markerDir)
      fs.create(marker, true).close()
      if (crashAt == "marker") throw new InjectedCrash("after marker")

      // (3) publish.
      completeSwap(fs, staging, tablePath)
    } finally newCells.unpersist()
  }

  /** Move every staged `date_day=` dir into the table (replacing that
    * day), then drop the staging dir. Idempotent: a rename that already
    * happened left no staged dir behind, so recovery can re-run this
    * from any interleaving point. */
  private def completeSwap(fs: FileSystem, staging: Path, tablePath: Path): Unit = {
    if (!fs.exists(staging)) return
    fs.mkdirs(tablePath)
    fs.listStatus(staging).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("date_day=")) {
        val dest = new Path(tablePath, name)
        if (fs.exists(dest)) fs.delete(dest, true)
        fs.rename(st.getPath, dest)
      }
    }
    fs.delete(staging, true)
  }
}
