package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Coverage-bounded tombstones, shared by every maintained store
  * (IndexMaintain / AnnMaintain / BandMaintain — law 7 of
  * `streaming/README.md`): a delete writes `del-<id>-c<covers>` under
  * `<dir>/tombstones`, where `covers` is the max postings batch id
  * visible at delete time. Reads anti-join with `src <= covers`, so a
  * key re-appended AFTER the delete resurfaces instead of being killed
  * by the older tombstone; rows whose `src` reads back NULL (written
  * before the column existed) are treated as always-covered, preserving
  * the legacy unconditional-kill semantics exactly. */
private[streaming] object Tombstones {

  private val R = "^del-(\\d+)-c(-?\\d+)$".r

  /** live tombstone dirs: (path, delete id, coverage bound). */
  def dirs(spark: SparkSession, dir: String): Seq[(Path, Long, Long)] = {
    val root = new Path(s"$dir/tombstones")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath).flatMap(p =>
      p.getName match {
        case R(id, cov) => Some((p, id.toLong, cov.toLong))
        case _ => None
      })
  }

  /** live tombstone rows with their coverage bound — (<key>, covers).
    * `except` drops one delete id (a replayed delete must not see its
    * own stale rows when recomputing what is still visible). */
  def rows(spark: SparkSession, dir: String, key: String,
      except: Long = -1L): DataFrame = {
    val schema = StructType(Seq(StructField(key, LongType)))
    val ds = dirs(spark, dir).filter(_._2 != except)
    if (ds.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .withColumn("covers", lit(-1L))
    else ds.map { case (p, _, cov) =>
      spark.read.schema(schema).parquet(p.toString)
        .withColumn("covers", lit(cov))
    }.reduce(_ unionByName _)
  }

  /** `post` minus the rows a tombstone may legitimately kill: only rows
    * whose source batch existed at delete time (src ≤ covers). NULL src
    * (pre-`src` legacy rows) coalesces to always-covered — the NULL
    * would otherwise make the condition NULL and the left_anti KEEP the
    * row, silently un-applying every tombstone on a legacy store. */
  def antiTomb(post: DataFrame, tomb: DataFrame, key: String): DataFrame = {
    val t = tomb.withColumnRenamed(key, "_t_key")
    post.join(t, post(key) === t("_t_key") &&
        coalesce(post("src"), lit(Long.MinValue)) <= t("covers"),
      "left_anti")
  }

  /** land a delete: drop a stale same-id tombstone first (replay — the
    * `covers` in the dir name must stay current), then write the dead
    * keys as `del-<deleteId>-c<covers>`. */
  def write(spark: SparkSession, dir: String, ids: DataFrame, key: String,
      deleteId: Long, covers: Long): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    dirs(spark, dir).filter(_._2 == deleteId)
      .foreach(t => fs.delete(t._1, true))
    ids.select(col(key).cast(LongType)).distinct()
      .write.mode("overwrite")
      .parquet(s"$dir/tombstones/del-$deleteId-c$covers")
  }

  /** purge (winner-only!) every tombstone whose coverage is at or below
    * the folded generation — all batches it could kill have folded. */
  def purgeCovered(spark: SparkSession, dir: String,
      tombs: Seq[(Path, Long, Long)], gen: Long): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tombs.filter(_._3 <= gen).foreach(t => fs.delete(t._1, true))
  }
}
