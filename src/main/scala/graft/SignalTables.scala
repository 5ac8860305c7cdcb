package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.Storage

/** Materialized signal tables: the gen-2 views written once per (sf dir)
  * through the REAL storage path — hour-partitioned Hive layout, zstd,
  * bloom filters (reference storage-layout.md:43-57) — then read back, so
  * queries over them exercise partition pruning and bloom row-group
  * skipping exactly as a 100 TB deployment would.
  *
  * Write-once semantics: the path cache is keyed by sf dir; Verify/Bench
  * run queries sequentially in one JVM, so each table materializes once
  * per run and every later query reads parquet.
  */
object SignalTables {

  private val cache = scala.collection.concurrent.TrieMap[(String, String), String]()

  private def materialize(s: SparkSession, dir: String, table: String,
      df: => DataFrame): String =
    cache.getOrElseUpdate((dir, table), {
      val base = java.nio.file.Files.createTempDirectory(s"graft_store_").toString
      val layout = Storage.TableLayout(base, "tenant0", "default")
      // one file per (date_day, hour) partition: repartition by the
      // partition keys so each directory gets a single sorted file —
      // the compacted shape, not a small-files spray
      Storage.append(
        df.repartition(col("date_day"), col("hour")),
        layout, table, alreadyPartitioned = true)
      layout.path(table)
    })

  /** stored gen-2 logs (full Schemas.logs layout incl. partition cols). */
  def storedLogsPath(s: SparkSession, dir: String): String =
    materialize(s, dir, "logs",
      Storage.withPartitionCols(SignalViews.logsGen2Df(s, dir)))

  def storedLogs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(storedLogsPath(s, dir))

  /** gen-2 LogsTable over the STORED layout — same resolution config as
    * the in-memory view, but with partition columns present so the
    * time-window partition-bound mirror prunes directories. */
  def storedLogsTable(s: SparkSession, dir: String): graft.logql.Lowering.LogsTable =
    SignalViews.logsGen2Table(s, dir).copy(df = storedLogs(s, dir))
}
