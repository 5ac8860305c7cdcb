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

  /** generation id of a store dir name: "batch-7" → 7, "compact-7" → 7,
    * "compact-7.2" → 7 (a re-shape of generation 7 — same fold bound,
    * newer content; see [[compact]]'s CAS). */
  private[streaming] def genOf(n: String): Long = {
    val tail = n.split("-").last
    val dot = tail.indexOf('.')
    (if (dot < 0) tail else tail.substring(0, dot)).toLong
  }

  /** re-shape counter within a generation (0 for "compact-7"). */
  private def subOf(n: String): Long = {
    val tail = n.split("-").last
    val dot = tail.indexOf('.')
    if (dot < 0) 0L else tail.substring(dot + 1).toLong
  }

  private def id(n: String) = genOf(n)

  /** the CAS primitive: atomically rename `src` onto `dst`, failing
    * (false) when `dst` already exists. Hadoop's RawLocalFileSystem
    * rename is NOT that — on a failed renameTo it falls back to
    * FileUtil.copy, which copies the source INTO an existing
    * destination directory and returns true, so a racing loser would
    * claim victory and nest its staging inside the winner's committed
    * generation. On the local scheme the rename therefore goes through
    * NIO's ATOMIC_MOVE (kernel rename(2): ENOTEMPTY/EEXIST on an
    * occupied destination); object-store schemes keep FileSystem.rename,
    * whose HDFS semantics already return false on an existing
    * destination. */
  private[streaming] def casRename(fs: org.apache.hadoop.fs.FileSystem,
      src: Path, dst: Path): Boolean = {
    val scheme = dst.toUri.getScheme
    if (scheme == null || scheme == "file") {
      try {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(src.toUri.getPath),
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.DirectoryNotEmptyException => false
        case _: java.nio.file.FileSystemException => false
      }
    } else fs.rename(src, dst)
  }

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
    // newest COMPLETE generation by (gen, re-shape sub) order
    val gen = all.filter(p => p.getName.startsWith("compact-") && complete(fs, p))
      .map(p => (id(p.getName), subOf(p.getName), p.getName))
      .sorted.lastOption
    val live = gen match {
      case None => all.map(_.getName).filter(_.startsWith("batch-"))
      case Some((g, _, name)) => name +:
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
    *
    * The swap is a CAS, so the single-maintainer convention is ENFORCED,
    * not assumed (the racing-compactors snapshot bug of round 12, applied
    * to the stores): the fold lands in a staging dir (`tmp-compact-…`,
    * invisible to [[liveDirs]]) and is RENAMED into place — directory
    * rename is kernel-atomic and fails when the destination exists, so of
    * two racing folds at the same generation exactly one commits; the
    * loser deletes its staging and reports defeat. Racing folds at
    * DIFFERENT generations both commit and the live-dir rule already
    * serves only the newest. Returns true iff THIS call committed its
    * generation — sweeping sources, purging tombstones, and any other
    * winner-only side effect must be gated on it.
    *
    * Write-then-rename-then-sweep; the sweep deletes ONLY dirs at or
    * below the new generation id — the folded sources, stale
    * generations, stranded staging dirs, and leftovers from a crashed
    * predecessor — never a batch dir appended after the fold's snapshot
    * (its id is above the generation's by batch-counter monotonicity). */
  /** the generation a fold started now would commit as — (gen, sub,
    * "gen[.sub]") — or None when there is nothing to fold. A caller
    * that must pair side state with the fold (AnnMaintain's centroid
    * generations) names that state by the same tail BEFORE calling
    * [[compact]]. */
  def nextTarget(spark: SparkSession, dir: String,
      upTo: Long = Long.MaxValue, force: Boolean = false)
      : Option[(Long, Long, String)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = liveDirs(spark, dir).filter(d => id(new Path(d).getName) <= upTo)
    if (dirs.isEmpty || (dirs.length == 1 && !force)) return None
    val gen = dirs.map(d => id(new Path(d).getName)).max
    // the target sub sits above EVERY on-disk dir at this generation —
    // the live one (a re-shape of an already-committed generation never
    // rewrites it in place, so readers always have a complete
    // generation) and any stranded partial from a crashed pre-CAS
    // writer (its name is never reused; the winner's sweep removes it)
    val onDisk = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("compact-") && id(n) == gen)
    val sub = if (onDisk.isEmpty) 0L else onDisk.map(subOf).max + 1
    Some((gen, sub, if (sub == 0) s"$gen" else s"$gen.$sub"))
  }

  def compact(spark: SparkSession, dir: String, schema: StructType,
      shape: DataFrame => DataFrame, upTo: Long = Long.MaxValue,
      force: Boolean = false): Boolean = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = liveDirs(spark, dir).filter(d => id(new Path(d).getName) <= upTo)
    // a single live dir normally needs no fold; `force` reshapes it
    // anyway (a pending tombstone set must land physically)
    if (dirs.isEmpty || (dirs.length == 1 && !force)) return false
    // one computation of the target (shared with callers that pair side
    // state by the tail — AnnMaintain.refresh); a racer advancing the
    // store between the two listings is settled by the CAS below
    val (gen, sub, tail) = nextTarget(spark, dir, upTo, force)
      .getOrElse(return false)
    val dstName = s"compact-$tail"
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // staging keeps the "<gen>[.<sub>]" tail so a stranded dir's sweep
    // bound parses the same way as a committed one's
    val staging = new Path(
      s"$dir/tmp-$nonce-${dstName.stripPrefix("compact-")}")
    val dst = new Path(s"$dir/$dstName")
    val committed =
      try {
        shape(spark.read.schema(schema).parquet(dirs: _*))
          .write.mode("overwrite").parquet(staging.toString)
        // the CAS: atomic dir rename, fails if the destination exists
        casRename(fs, staging, dst)
      } catch {
        // a racing winner may sweep our sources mid-fold; if a complete
        // generation at or above ours now exists, we simply lost
        case e: Throwable =>
          val won = fs.exists(new Path(dir)) &&
            fs.listStatus(new Path(dir)).toSeq.map(_.getPath).exists { p =>
              val n = p.getName
              n.startsWith("compact-") &&
                (id(n) > gen || (id(n) == gen && subOf(n) >= sub)) &&
                complete(fs, p)
            }
          if (!won) throw e
          false
      }
    if (!committed) {
      if (fs.exists(staging)) fs.delete(staging, true)
      return false
    }
    // winner-only sweep. A crashed predecessor's partial generation
    // always sorts at or below (gen, sub): its fold snapshot was a
    // subset of ours (batch dirs only grow); same for stranded staging.
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.startsWith("batch-") && id(n) <= gen) ||
          (n.startsWith("compact-") &&
            (id(n) < gen || (id(n) == gen && subOf(n) < sub))) ||
          (n.startsWith("tmp-") &&
            (id(n) < gen || (id(n) == gen && subOf(n) <= sub)))
      }
      .foreach(p => fs.delete(p, true))
    true
  }
}
