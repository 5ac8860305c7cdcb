package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Attribute promotion EXECUTION — the rewrite-coupled half of the
  * advisor (reference: src/compactor/src/attr_promotion.rs decisions;
  * rewriter commit; column naming `label_<key>` via
  * common/schema materialized_column_name).
  *
  * The advisor (graft.operators.DiscoveryOps q69) scores keys; this job
  * materializes `label_<key>` columns from the attribute containers so
  * later queries hit a plain parquet column (min/max + dictionary) instead
  * of a map probe. The core invariant is PROMOTION INVARIANCE (reference
  * ir_planner.rs:10-15): the same query answers identically before and
  * after promotion — asserted in PromotionSpec.
  */
object AttrPromotion {

  /** a key that looks machine-generated (UUID/hex/numeric runs) would grow
    * the schema without reusable query value — never promoted
    * (attr_promotion.rs looks_generated: 12+ hex or 8+ digit run). */
  def looksGenerated(key: String): Boolean = {
    var hexRun = 0
    var digitRun = 0
    var found = false
    for (c <- key.toLowerCase if !found) {
      if (c.isDigit) { digitRun += 1; hexRun += 1 }
      else if ("abcdef".contains(c)) { hexRun += 1; digitRun = 0 }
      else { hexRun = 0; digitRun = 0 }
      if (digitRun >= 8 || hexRun >= 12) found = true
    }
    found
  }

  /** materialize `label_<key>` columns for the selected keys, resolving
    * across the attribute containers in priority order (record attrs
    * shadow resource/scope), exactly like query-time resolution — that
    * sameness IS the invariance. Generated-looking keys are dropped. */
  def promote(df: DataFrame, keys: Seq[String],
      attrMapCols: Seq[String] = Seq("log_attributes", "resource_attributes", "scope_attributes")): DataFrame = {
    val present = attrMapCols.filter(df.columns.contains)
    require(present.nonEmpty, "no attribute containers on this table")
    keys.filterNot(looksGenerated).foldLeft(df) { (d, k) =>
      d.withColumn(s"label_$k", coalesce(present.map(m => element_at(col(m), k)): _*))
    }
  }

  /** rewrite a stored table in place with the promoted columns — the
    * schema-change commit (dynamic partition overwrite keeps untouched
    * partitions; at 100 TB this runs per closed partition alongside
    * compaction, not as one global rewrite). */
  def rewriteTable(spark: SparkSession, layout: Storage.TableLayout, table: String,
      keys: Seq[String],
      partitionCols: Seq[String] = Seq("date_day", "hour")): Unit = {
    val path = layout.path(table)
    val promoted = promote(spark.read.parquet(path), keys)
    // tmp lives under the table's parent so the final swap is a same-
    // filesystem rename; the old directory is moved aside (not deleted)
    // until the new data is in place, so a crash at any point leaves
    // either the old or the new table fully intact.
    val tmp = path + "_promoting"
    // keeps the table's bloom options — same hazard as compaction (a
    // full-table rewrite that silently strips blooms)
    Storage.withBloomOptions(promoted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .option("compression", "zstd"), table)
      .parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mv(from: String, to: String): Unit = {
      val ok = fs.rename(new org.apache.hadoop.fs.Path(from), new org.apache.hadoop.fs.Path(to))
      if (!ok) throw new java.io.IOException(s"rename $from -> $to failed (cross-filesystem or target exists)")
    }
    val old = path + "_old"
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
    mv(path, old)
    try mv(tmp, path)
    catch { case e: Throwable => mv(old, path); throw e } // roll back to the original
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
  }
}
