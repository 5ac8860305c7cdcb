package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** LEXICAL-INDEX maintenance under streaming ingest — the online half of
  * q381's incremental BM25 store: documents arrive forever; the postings
  * and corpus stats must stay current without any rebuild.
  *
  * BM25's sufficient statistics are ASSOCIATIVE SUMS (per-term document
  * frequency, corpus doc count, total token count), so — unlike the
  * Gorilla maintainer, which must read back and re-encode touched blocks
  * — each micro-batch folds with NO read-back at all: batch `n` writes
  * its own postings and stats files, readers union postings and ADD
  * stats rows. Work per batch is O(batch); replay is exactly-once
  * because batch `n` overwrites only its own `batch-n` dirs with
  * deterministic content (the GorillaStream discipline).
  *
  * The batching-invariance law (IndexMaintainSpec): ANY micro-batching
  * of the same document set yields a store whose BM25 ranking is
  * row-identical — ingest cadence can never change a search result. */
object IndexMaintain {

  private val postingsSchema = StructType(Seq(
    StructField("tok", StringType), StructField("doc_id", LongType),
    StructField("dl", LongType), StructField("tf", LongType)))
  private val statsSchema = StructType(Seq(
    StructField("n_docs", LongType), StructField("tot_tok", LongType)))

  /** foreachBatch body: fold a micro-batch of documents — columns
    * (doc_id, text) — into the index store at `dir`. */
  def maintainBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    val docs = batch
      .select(col("doc_id").cast(LongType), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast(LongType))
    docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .groupBy(col("tok"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .sortWithinPartitions(col("tok")) // row-group stats prune IN-list probes
      .write.mode("overwrite").parquet(s"$dir/postings/batch-$batchId")
    docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_tok"))
      .write.mode("overwrite").parquet(s"$dir/stats/batch-$batchId")
  }

  def start(docs: DataFrame, dir: String,
      trigger: Trigger = Trigger.ProcessingTime(500)): StreamingQuery = {
    require(docs.isStreaming, "IndexMaintain needs a streaming source")
    docs.writeStream.outputMode("append").trigger(trigger)
      .foreachBatch(maintainBatch(dir) _).start()
  }

  /** fold the accumulated per-batch dirs into ONE compacted generation —
    * the maintenance pass that keeps an append-only store from drowning
    * in small files at 100 TB (the [[BatchStore]] live-dir rule makes
    * every intermediate crash state read-consistent). `upTo` bounds the
    * fold to batches a concurrent maintainer has already committed. */
  def compact(spark: SparkSession, dir: String,
      upTo: Long = Long.MaxValue): Unit = {
    BatchStore.compact(spark, s"$dir/postings", postingsSchema,
      _.sortWithinPartitions(col("tok")), upTo)
    BatchStore.compact(spark, s"$dir/stats", statsSchema,
      _.agg(sum(col("n_docs")).as("n_docs"),
        sum(col("tot_tok")).as("tot_tok")), upTo)
  }

  def postings(spark: SparkSession, dir: String): DataFrame =
    BatchStore.read(spark, s"$dir/postings", postingsSchema)

  def stats(spark: SparkSession, dir: String): DataFrame =
    BatchStore.read(spark, s"$dir/stats", statsSchema)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("tot_tok")).as("tot_tok"))

  /** the q187/q381 exact fixed-point BM25 ranking over the maintained
    * store: per-term df from the pruned postings themselves, corpus
    * stats from the summed rows. */
  def bm25(spark: SparkSession, dir: String, terms: Seq[String],
      limit: Int = 20): DataFrame = {
    val tfs = postings(spark, dir).filter(col("tok").isin(terms: _*))
    val st = stats(spark, dir)
      .withColumn("avgdl_fp", expr("(tot_tok * 1000) div n_docs"))
    val dfs = tfs.groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
    tfs.join(broadcast(dfs), "tok").crossJoin(broadcast(st))
      .withColumn("idf_fp",
        expr("((2 * (n_docs - dfc) + 1) * 1000000) div (2 * dfc + 1)"))
      .withColumn("dlr_fp", expr("(dl * 1000000) div avgdl_fp"))
      .withColumn("k_fp", expr("(1200 * (250 + (750 * dlr_fp) div 1000)) div 1000"))
      .withColumn("term_fp", expr("(idf_fp * tf * 2200) div (tf * 1000 + k_fp)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_fp")).as("score_fp"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_fp").desc, col("doc_id").asc)
      .limit(limit)
  }
}
