package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** ANN-INDEX maintenance under streaming ingest — q380's online half:
  * embedding vectors arrive forever; each must become searchable without
  * retraining the index. The centroids are FROZEN (built once over the
  * base corpus, q380's lifecycle); a micro-batch's only read state is
  * that small centroid table (broadcast), and its fold is pure
  * assignment: nearest-frozen-centroid per vector, appended as the
  * batch's own postings files. Assignment is per-vector independent, so
  * ANY micro-batching yields the identical postings set (the
  * batching-invariance law, AnnMaintainSpec) — ingest cadence can never
  * change a search result. Replay overwrites only the batch's own dir
  * (the GorillaStream discipline, exactly-once).
  *
  * At 100 TB: O(batch × k) work per fold, index never touched, the
  * probe side stays q260/q380's broadcast/DPP shape. Centroid REFRESH
  * (retraining on drift) is a batch maintenance job by design — the
  * stream path must never mutate what probes broadcast. */
object AnnMaintain {

  private val postingsSchema = StructType(Seq(
    StructField("n_id", LongType), StructField("cell", LongType),
    StructField("nv", ArrayType(LongType)), StructField("nn", LongType),
    StructField("src", LongType)))

  /** foreachBatch body: assign a micro-batch of vectors — columns
    * (vec_id, vq: array<long>, nrm: long) — to the frozen centroids at
    * `centroidsPath` — columns (c_id, cv, cn) — and append postings. */
  def maintainBatch(dir: String, centroidsPath: String,
      compactEvery: Int = 0)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // in-stream self-compaction (replay-safe: batches < n are committed)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compact(spark, dir, upTo = batchId - 1)
    // assignment follows the CURRENT centroid generation — after a
    // refresh, new arrivals must land in the cells probes now search
    val cents = currentCentroids(spark, dir, centroidsPath)
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    batch.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("vq"), col("nrm"), struct(
        (-(dot(col("vq"), col("cv")).cast(DoubleType) /
          sqrt(col("cn").cast(DoubleType) * col("nrm").cast(DoubleType))))
          .as("negcos"),
        col("c_id").as("c_id")).as("sc"))
      .groupBy(col("vec_id"))
      .agg(min(col("sc")).as("best"), first(col("vq")).as("nv"),
        first(col("nrm")).as("nn"))
      .select(col("vec_id").as("n_id"), col("best.c_id").as("cell"),
        col("nv"), col("nn"))
      // src = the batch that wrote the row: a tombstone kills only rows
      // whose source existed at delete time (src ≤ its covers)
      .withColumn("src", lit(batchId))
      .write.mode("overwrite").parquet(s"$dir/postings/batch-$batchId")
  }

  def start(vectors: DataFrame, dir: String, centroidsPath: String,
      trigger: Trigger = Trigger.ProcessingTime(500),
      compactEvery: Int = 0): StreamingQuery = {
    require(vectors.isStreaming, "AnnMaintain needs a streaming source")
    vectors.writeStream.outputMode("append").trigger(trigger)
      .foreachBatch(maintainBatch(dir, centroidsPath, compactEvery) _).start()
  }

  // ---- deletes (tombstones): the IndexMaintain discipline without a
  // stats store — a retention drop tombstones the dead vector ids;
  // reads anti-join, compaction applies physically and purges
  // tombstones whose covered batches folded.

  private val TombstoneR = "^del-(\\d+)-c(-?\\d+)$".r
  private val tombSchema = StructType(Seq(StructField("n_id", LongType)))

  private def tombstoneDirs(spark: SparkSession, dir: String)
      : Seq[(Path, Long, Long)] = {
    val root = new Path(s"$dir/tombstones")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath).flatMap(p =>
      p.getName match {
        case TombstoneR(id, cov) => Some((p, id.toLong, cov.toLong))
        case _ => None
      })
  }

  /** live tombstone rows with their coverage bound — (n_id, covers). */
  private def tombstones(spark: SparkSession, dir: String): DataFrame = {
    val ds = tombstoneDirs(spark, dir)
    if (ds.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tombSchema)
      .withColumn("covers", lit(-1L))
    else ds.map { case (p, _, cov) =>
      spark.read.schema(tombSchema).parquet(p.toString)
        .withColumn("covers", lit(cov))
    }.reduce(_ unionByName _)
  }

  /** `post` minus the rows a tombstone may legitimately kill: only rows
    * whose source batch existed at delete time (src ≤ covers) — a
    * vector re-appended AFTER a delete resurfaces instead of being
    * silently killed by the older tombstone. Postings written before the
    * `src` column existed read back as NULL; treat missing src as
    * always-covered (the old unconditional-kill semantics) so legacy
    * stores keep honoring their tombstones instead of the NULL condition
    * silently keeping every deleted row. */
  private def antiTomb(post: DataFrame, tomb: DataFrame): DataFrame = {
    val t = tomb.withColumnRenamed("n_id", "_t_key")
    post.join(t, post("n_id") === t("_t_key") &&
        coalesce(post("src"), lit(Long.MinValue)) <= t("covers"),
      "left_anti")
  }

  /** delete vectors from the maintained postings (the retention hook). */
  def deleteVecs(spark: SparkSession, dir: String, vecIds: DataFrame,
      deleteId: Long): Unit = {
    val covers = BatchStore.liveDirs(spark, s"$dir/postings")
      .map(d => BatchStore.genOf(new Path(d).getName))
      .sorted.lastOption.getOrElse(-1L)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tombstoneDirs(spark, dir).filter(_._2 == deleteId)
      .foreach(t => fs.delete(t._1, true))
    vecIds.select(col("n_id").cast(LongType)).distinct()
      .write.mode("overwrite")
      .parquet(s"$dir/tombstones/del-$deleteId-c$covers")
  }

  /** all LIVE stream-appended postings ([[BatchStore]] rule), minus the
    * tombstoned vectors. */
  def postings(spark: SparkSession, dir: String): DataFrame =
    antiTomb(BatchStore.read(spark, s"$dir/postings", postingsSchema),
      tombstones(spark, dir)).drop("src")

  // ---- centroid refresh (drift maintenance) -----------------------------
  // The stream path NEVER mutates what probes broadcast; retraining on
  // drift is this batch job: retrain centroids over base ∪ accumulated
  // delta (the postings carry their vectors), re-assign every posting
  // under the new centroids, and land both as ONE generation `<gen>` —
  // `centroids-<gen>` is written first but only becomes current when
  // its matching postings `compact-<gen>` commits (the postings
  // generation's _SUCCESS is the single commit point), so probes always
  // see a centroid set and an assignment that agree, at every crash
  // point.

  private def complete(fs: org.apache.hadoop.fs.FileSystem, p: Path) =
    fs.exists(new Path(p, "_SUCCESS"))

  private val CentR = "^centroids-(\\d+(?:\\.\\d+)?)$".r
  private def centOrd(tail: String): (Long, Long) = {
    val dot = tail.indexOf('.')
    if (dot < 0) (tail.toLong, 0L)
    else (tail.substring(0, dot).toLong, tail.substring(dot + 1).toLong)
  }

  /** the centroids probes and maintainers must use: the newest refresh
    * generation whose PAIRING postings generation committed, else the
    * bootstrap set at `bootstrapPath`. Pairing is (gen, sub) ORDER, not
    * exact-tail equality: a centroid set written at tail T stays
    * current as long as some complete postings generation ≥ T exists,
    * because non-refresh folds (tombstone re-shapes compact-G →
    * compact-G.S, plain batch folds) PRESERVE the cell space — only a
    * newer refresh (which writes its own newer centroid dir) changes
    * it. Exact-tail pairing stranded the centroid set whenever a
    * tombstone compact superseded its fold, silently dropping probes
    * back to bootstrap centroids against refreshed cells. */
  def currentCentroidsPath(spark: SparkSession, dir: String,
      bootstrapPath: String): String = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return bootstrapPath
    val postRoot = new Path(s"$dir/postings")
    val committed: Seq[(Long, Long)] =
      if (!fs.exists(postRoot)) Seq.empty
      else fs.listStatus(postRoot).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("compact-") && complete(fs, p))
        .map(p => centOrd(p.getName.stripPrefix("compact-")))
    val newest = committed.sorted.lastOption
    val gens = fs.listStatus(root).toSeq.map(_.getPath).flatMap(p =>
      p.getName match {
        case CentR(g) if complete(fs, p) &&
          newest.exists(n => Ordering[(Long, Long)].lteq(centOrd(g), n)) =>
          Some((centOrd(g), p.toString))
        case _ => None
      })
    gens.sortBy(_._1).lastOption.map(_._2).getOrElse(bootstrapPath)
  }

  def currentCentroids(spark: SparkSession, dir: String,
      bootstrapPath: String): DataFrame =
    spark.read.parquet(currentCentroidsPath(spark, dir, bootstrapPath))

  /** retrain the centroids over every live vector in the store and
    * re-assign all postings under them, swapped in atomically as one
    * generation. `train` maps (vec_id, vq, nrm) to centroids
    * (c_id, cv, cn) — the caller supplies the trainer (e.g. the
    * one-Lloyd IVF construction the batch index uses) so refresh and
    * from-scratch builds can share it exactly. Tombstoned vectors are
    * excluded from both training and the new generation; covered
    * tombstones are purged with it. */
  def refresh(spark: SparkSession, dir: String, bootstrapPath: String,
      train: DataFrame => DataFrame, attempts: Int = 3): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // captured BEFORE the swap: the one generation a concurrent probe
    // can be holding — it gets a grace window (see purge below)
    val prevCurrent = currentCentroidsPath(spark, dir, bootstrapPath)
    // the generation tail the postings fold will commit as — centroids
    // are named by the SAME tail, so pairing survives re-shapes of an
    // already-committed generation (compact-7 → compact-7.1)
    val tail = BatchStore.nextTarget(spark, s"$dir/postings",
      force = true).getOrElse(return)._3
    val centDst = new Path(s"$dir/centroids-$tail")
    // create-once per tail: (gen, sub) advances on every committed fold
    // and the trainer is deterministic over the same live snapshot, so
    // an existing dir (a racing refresher's, or a crashed one's orphan)
    // carries the content this refresh would produce — never rewrite a
    // dir a probe may be reading. EXCEPT when tombstones are pending:
    // the tail does not encode tombstone state, so a crashed
    // refresher's orphan at this tail may have trained on vectors that
    // have since been deleted — delete the orphan (it was never
    // current, so no probe holds it) and retrain over the live set.
    if (fs.exists(centDst) && tombstoneDirs(spark, dir).nonEmpty)
      fs.delete(centDst, true)
    if (!fs.exists(centDst)) {
      val vecs = postings(spark, dir)
        .select(col("n_id").as("vec_id"), col("nv").as("vq"),
          col("nn").as("nrm"))
      val staging = new Path(s"$dir/tmp-cent-" +
        java.util.UUID.randomUUID().toString.take(8))
      train(vecs).write.mode("overwrite").parquet(staging.toString)
      // same CAS primitive as the postings fold — a plain
      // FileSystem.rename on the local scheme copies INTO an existing
      // destination and claims success
      if (!BatchStore.casRename(fs, staging, centDst))
        fs.delete(staging, true) // lost to a racing refresher
    }
    val cents = spark.read.parquet(centDst.toString)
    val tombs = tombstoneDirs(spark, dir)
    val dead = tombstones(spark, dir)
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val won = BatchStore.compact(spark, s"$dir/postings", postingsSchema, { df =>
      antiTomb(df, dead)
        .select(col("n_id"), col("nv"), col("nn"), col("src"))
        .crossJoin(broadcast(cents))
        .select(col("n_id"), col("nv"), col("nn"), col("src"), struct(
          (-(dot(col("nv"), col("cv")).cast(DoubleType) /
            sqrt(col("cn").cast(DoubleType) * col("nn").cast(DoubleType))))
            .as("negcos"),
          col("c_id").as("c_id")).as("sc"))
        .groupBy(col("n_id"))
        .agg(min(col("sc")).as("best"), first(col("nv")).as("nv"),
          first(col("nn")).as("nn"), first(col("src")).as("src"))
        .select(col("n_id"), col("best.c_id").as("cell"),
          col("nv"), col("nn"), col("src"))
        .sortWithinPartitions(col("cell"))
    }, upTo = Long.MaxValue, force = true)
    // side effects are WINNER-ONLY (the CAS decides): a losing racer
    // purging tombstones or centroid dirs would act on state it never
    // committed
    if (!won) return
    if (!complete(fs, new Path(s"$dir/postings/compact-$tail"))) {
      // a batch landed between the target computation and the fold: the
      // committed generation is newer than the centroid set we paired
      // with, so its cells don't match any servable centroid set.
      // Re-run against the advanced store (bounded — the window is the
      // fold itself; the store stays read-consistent throughout, only
      // probe pruning is stale until a refresh pairs).
      if (attempts > 1) refresh(spark, dir, bootstrapPath, train, attempts - 1)
      return
    }
    val gen = centOrd(tail)._1
    tombs.filter(_._3 <= gen).foreach(t => fs.delete(t._1, true))
    // once this generation's postings committed, every OTHER centroid
    // dir is superseded (its postings generation was swept by the
    // fold) or an orphan from a crashed refresh — purge all EXCEPT the
    // generation that was current when this refresh began. That one
    // gets a one-refresh grace window: a concurrent probe that already
    // resolved currentCentroidsPath to it must be able to finish its
    // broadcast read (the maintenance path never mutates what probes
    // are reading). Orphans were never current, so no probe holds
    // them; the previous grace dir stops being protected at the NEXT
    // refresh, so a long-lived store carries at most two centroid
    // dirs. The bootstrap set lives outside `dir` and is never touched.
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .foreach(p => p.getName match {
        case CentR(g) if g != tail && p.toString != prevCurrent =>
          fs.delete(p, true)
        // stranded centroid staging from a crashed refresher — nothing
        // else ever sweeps the index root (a live racer's staging is
        // safe to kill: its rename then fails and it loses, by design)
        case n if n.startsWith("tmp-cent-") => fs.delete(p, true)
        case _ => ()
      })
  }

  /** fold the per-batch postings dirs into one compacted generation,
    * clustered by cell for probe pruning; `upTo` bounds the fold to
    * committed batches. Tombstoned postings are physically dropped and
    * fully-covered tombstones purged. */
  def compact(spark: SparkSession, dir: String,
      upTo: Long = Long.MaxValue): Unit = {
    val tombs = tombstoneDirs(spark, dir)
    val dead = tombstones(spark, dir)
    val folded = BatchStore.liveDirs(spark, s"$dir/postings")
      .map(d => BatchStore.genOf(new Path(d).getName)).filter(_ <= upTo)
    // tombstone purge is WINNER-ONLY (see IndexMaintain.compact)
    val won = BatchStore.compact(spark, s"$dir/postings", postingsSchema,
      df => antiTomb(df, dead).sortWithinPartitions(col("cell")),
      upTo, force = tombs.nonEmpty)
    if (won && folded.nonEmpty) {
      val gen = folded.max
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      tombs.filter(_._3 <= gen).foreach(t => fs.delete(t._1, true))
    }
  }
}
