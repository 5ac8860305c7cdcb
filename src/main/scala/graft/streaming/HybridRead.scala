package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.storage.Storage
import graft.storage.Storage.TableLayout

/** Hot/cold union visibility (reference:
  * openspec/changes/unflushed-data-visibility — queriers union the
  * writer's resident data with the committed scan so data is queryable
  * at ack, and the committed high-water mark drops hot rows that have
  * already flushed: provably no duplication and no omission across the
  * flush boundary; a missing cold table with hot data present serves
  * hot-only, fixing the first-run experience).
  *
  * Spark translation: the cold side is the stored parquet table (absent
  * ⇒ typed empty frame), the hot side is whatever the ingest pipeline
  * still holds un-committed, tagged with its micro-batch id — and the
  * commit watermark ALREADY EXISTS here as `IngestSink`'s per-batch
  * marker files, written atomically after each append. A hot batch whose
  * marker exists has flushed and is dropped from the hot side; one whose
  * marker is absent has not landed and is served hot. Visibility is
  * decoupled from flush cadence with zero new bookkeeping.
  */
object HybridRead {

  /** batch ids the idempotent sink has committed for this table. */
  def committedBatches(spark: org.apache.spark.sql.SparkSession,
      layout: TableLayout, table: String): Set[Long] = {
    val markerDir = new Path(
      s"${layout.basePath}/_markers/${layout.tenant}/${layout.dataset}/$table")
    val fs = markerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(markerDir)) Set.empty
    else fs.listStatus(markerDir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch-") => s.stripPrefix("batch-").toLong }
      .toSet
  }

  /** stored ∪ un-flushed: `hot` carries a `_batch_id` column (the
    * micro-batch that produced each resident row); rows from batches at
    * or below the marker watermark are dropped, everything else unions
    * onto the cold scan with the cold schema. */
  def hotColdUnion(spark: org.apache.spark.sql.SparkSession,
      layout: TableLayout, table: String, hot: DataFrame): DataFrame = {
    // Build the cold scan FIRST (spark.read.parquet lists files eagerly),
    // THEN snapshot the markers: IngestSink appends files before writing
    // the marker, so marker-snapshot >= file-snapshot guarantees a batch
    // visible on the cold side is also dropped from the hot side even
    // when a commit races this call. The reverse order could serve a
    // concurrently-committing batch from both sides.
    val coldSchema = org.apache.spark.sql.types.StructType(
      hot.drop("_batch_id").schema.fields)
    val cold = Storage.tableOrEmpty(spark, layout, table, coldSchema)
    val committed = committedBatches(spark, layout, table)
    val live = (if (committed.isEmpty) hot
      else hot.filter(!col("_batch_id").isin(committed.toSeq: _*)))
      .drop("_batch_id")
    // hive partition columns (date_day/hour) exist only on the cold side
    // of a first-run table; align by name and let the hot side null them
    cold.unionByName(live, allowMissingColumns = true)
  }
}
