package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The append-only per-batch parquet store under the streaming index
  * maintainers (IndexMaintain postings/stats, AnnMaintain postings):
  * batch `n` owns `batch-n`, compaction folds the live set into a
  * `compact-<maxId>` generation, and the LIVE-dir rule — newest
  * generation plus batch dirs NEWER than it — makes every intermediate
  * crash state read-consistent:
  *   - crash before a compact's write completes: sources still live;
  *   - crash between write and sweep: folded sources exist on disk but
  *     are BELOW the generation id, so readers never double-count them;
  *   - the next compact sweeps any stranded dir.
  * Single-maintainer convention for compaction (RollupMaintain's);
  * appends are replay-safe because a batch overwrites only its own dir. */
private[streaming] object BatchStore {

  def liveDirs(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val all = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("batch-") || n.startsWith("compact-"))
    def id(n: String) = n.split("-").last.toLong
    val gen = all.filter(_.startsWith("compact-")).map(id).sorted.lastOption
    val live = gen match {
      case None => all
      case Some(g) => s"compact-$g" +:
        all.filter(n => n.startsWith("batch-") && id(n) > g)
    }
    live.map(n => s"$dir/$n")
  }

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val dirs = liveDirs(spark, dir)
    if (dirs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** fold the live set into one `compact-<maxId>` generation; `shape`
    * rewrites the unioned frame (sort order, re-aggregation) before it
    * lands. Write-then-sweep; the sweep also clears stranded leftovers. */
  def compact(spark: SparkSession, dir: String, schema: StructType,
      shape: DataFrame => DataFrame): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = liveDirs(spark, dir)
    if (dirs.length <= 1) return
    val gen = dirs.map(d => new Path(d).getName)
      .map(n => n.split("-").last.toLong).max
    shape(spark.read.schema(schema).parquet(dirs: _*))
      .write.mode("overwrite").parquet(s"$dir/compact-$gen")
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter(p => (p.getName.startsWith("batch-") ||
        p.getName.startsWith("compact-")) && p.getName != s"compact-$gen")
      .foreach(p => fs.delete(p, true))
  }
}
