package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The append-only per-batch parquet store under the streaming index
  * maintainers (IndexMaintain postings/stats, AnnMaintain postings,
  * GorillaStream blocks): batch `n` owns `batch-n`, compaction folds the
  * live set into a `compact-<maxId>` generation, and the LIVE-dir rule —
  * newest COMPLETE generation plus batch dirs NEWER than it — makes
  * every intermediate crash state read-consistent:
  *   - crash before a compact's write completes: the partial dir has no
  *     `_SUCCESS`, readers ignore it, sources still live;
  *   - crash between write and sweep: folded sources exist on disk but
  *     are BELOW the generation id, so readers never double-count them;
  *   - the next compact sweeps any stranded dir (partial generations
  *     included — their id can never exceed the new generation's,
  *     because batch dirs only accumulate).
  * Single-maintainer convention for compaction (RollupMaintain's);
  * appends are replay-safe because a batch overwrites only its own dir,
  * and the sweep deletes ONLY dirs at or below the folded generation —
  * a batch appended concurrently with the fold is always newer and is
  * never touched.
  *
  * `upTo` bounds which batches a fold may consume — the replay-safety
  * knob for maintainers whose batches READ BACK prior state
  * (GorillaStream): compact only batches the stream has committed, so a
  * replayed batch `n` still reconstructs exactly the pre-`n` state. */
private[streaming] object BatchStore {

  private def id(n: String) = n.split("-").last.toLong

  /** a generation dir is only trusted once its job committed — the
    * `_SUCCESS` marker is the commit record; a partial dir from a crash
    * mid-write must not mask the sources it failed to fold. */
  private def complete(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    fs.exists(new Path(p, "_SUCCESS"))

  /** live dirs whose id is strictly below `before` (Long.MaxValue =
    * everything): the newest COMPLETE generation below `before`, plus
    * batch dirs newer than it (and below `before`). */
  def liveDirs(spark: SparkSession, dir: String,
      before: Long = Long.MaxValue): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val all = fs.listStatus(root).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.startsWith("batch-") || n.startsWith("compact-")) && id(n) < before
      }
    val gen = all.filter(p => p.getName.startsWith("compact-") && complete(fs, p))
      .map(p => id(p.getName)).sorted.lastOption
    val live = gen match {
      case None => all.map(_.getName).filter(_.startsWith("batch-"))
      case Some(g) => s"compact-$g" +:
        all.map(_.getName).filter(n => n.startsWith("batch-") && id(n) > g)
    }
    live.map(n => s"$dir/$n")
  }

  def read(spark: SparkSession, dir: String, schema: StructType,
      before: Long = Long.MaxValue): DataFrame = {
    val dirs = liveDirs(spark, dir, before)
    if (dirs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** fold the live dirs with id ≤ `upTo` into one `compact-<maxId>`
    * generation; `shape` rewrites the unioned frame (sort order,
    * re-aggregation, latest-revision-per-key) before it lands.
    * Write-then-sweep; the sweep deletes ONLY dirs at or below the new
    * generation id — the folded sources, stale generations, and
    * stranded leftovers from a crashed predecessor — never a batch dir
    * appended after the fold's snapshot (its id is above the
    * generation's by the batch-counter monotonicity). */
  def compact(spark: SparkSession, dir: String, schema: StructType,
      shape: DataFrame => DataFrame, upTo: Long = Long.MaxValue,
      force: Boolean = false): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = liveDirs(spark, dir).filter(d => id(new Path(d).getName) <= upTo)
    // a single live dir normally needs no fold; `force` reshapes it
    // anyway (a pending tombstone set must land physically)
    if (dirs.isEmpty || (dirs.length == 1 && !force)) return
    val gen = dirs.map(d => id(new Path(d).getName)).max
    shape(spark.read.schema(schema).parquet(dirs: _*))
      .write.mode("overwrite").parquet(s"$dir/compact-$gen")
    // a crashed predecessor's partial generation always has id ≤ gen:
    // its fold snapshot was a subset of ours (batch dirs only grow)
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.startsWith("batch-") || n.startsWith("compact-")) &&
          id(n) <= gen && n != s"compact-$gen"
      }
      .foreach(p => fs.delete(p, true))
  }
}
