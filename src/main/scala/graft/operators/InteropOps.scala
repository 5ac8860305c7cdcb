package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.{IcebergExport, Snapshots}

/** Format-interop operators: the Iceberg v2 metadata projection
  * (reference tables are REAL Iceberg — `src/common/src/iceberg/
  * schemas.rs:189-455`, `table_manager.rs` — so an external engine can
  * open them; graft's CAS snapshots replicate the semantics and
  * [[graft.storage.IcebergExport]] now projects the format).
  *
  * q323 is the row-level conformance gate: it resolves the stored logs
  * table STRICTLY through the exported chain (version-hint →
  * metadata.json → manifest-list Avro → manifest Avro → data files; the
  * walk an external reader performs), aggregates the resolved rows, and
  * rides the manifest-claimed totals (record_count sums, identity
  * partition tuples) along as columns — DuckDB restates all of it from
  * the raw events view, so wrong file sets, wrong stats, or wrong
  * partition values all hash-mismatch. (DuckDB's `iceberg` extension
  * itself is not installable offline; IcebergExportSpec pins the format
  * details the extension would check.)
  */
object InteropOps {
  type Q = (SparkSession, String) => DataFrame

  /** export once per (process, sf dir); re-running is idempotent but
    * re-reads parquet footers, which bench passes need not repeat. The
    * table is this query's OWN stored layout (same Storage.append
    * path), not the shared storedLogs fixture — exporting writes a
    * `metadata/` dir under the table root, and a shared fixture's plain
    * root reads must never have to know about it. */
  private val exported = scala.collection.concurrent.TrieMap[String, String]()
  private def icebergLogsLocation(s: SparkSession, dir: String): String =
    exported.getOrElseUpdate(dir, {
      val base = graft.storage.LocalCache.dir(s"iceberg_logs|$dir")
      val layout = graft.storage.Storage.TableLayout(base, "tenant0", "default")
      if (Snapshots.current(s, layout, "logs").isEmpty) {
        graft.storage.Storage.append(
          graft.storage.Storage.withPartitionCols(
            graft.SignalViews.logsGen2Df(s, dir))
            .repartition(org.apache.spark.sql.functions.col("date_day"),
              org.apache.spark.sql.functions.col("hour")),
          layout, "logs", alreadyPartitioned = true)
        Snapshots.commit(s, layout, "logs")
      }
      IcebergExport.export(s, layout, "logs")
      layout.path("logs")
    })

  val queries: Map[String, Q] = Map(
    "q323_iceberg_export" -> ((s, dir) => {
      val loc = icebergLogsLocation(s, dir)
      val files = IcebergExport.readDataFiles(loc)
      val manifestRows = files.map(_.recordCount).sum
      val manifestPartitions = files
        .map(f => (f.partition("date_day"), f.partition("hour")))
        .distinct.size.toLong
      s.read.option("basePath", loc).parquet(files.map(_.path): _*)
        .groupBy(col("service_name"))
        .agg(count(lit(1)).as("n_rows"))
        .select(col("service_name"), col("n_rows"),
          lit(manifestRows).as("manifest_rows"),
          lit(manifestPartitions).as("manifest_partitions"))
    })
  )

  val oracles: Map[String, String] = Map(
    // the manifest totals restated from the raw view: total rows, and
    // the distinct (day, hour) tuples the identity partition spec
    // materializes (UTC derivation matches Storage.withPartitionCols)
    "q323_iceberg_export" ->
      s"""WITH l AS (${graft.SignalViews.gen2ViewSql})
         |SELECT service_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM l) AS manifest_rows,
         |  (SELECT CAST(COUNT(DISTINCT strftime(
         |     make_timestamp(timestamp // 1000), '%Y-%m-%d %H')) AS BIGINT)
         |   FROM l) AS manifest_partitions
         |FROM l GROUP BY 1""".stripMargin
  )
}
