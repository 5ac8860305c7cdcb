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
    StructField("nv", ArrayType(LongType)), StructField("nn", LongType)))

  /** foreachBatch body: assign a micro-batch of vectors — columns
    * (vec_id, vq: array<long>, nrm: long) — to the frozen centroids at
    * `centroidsPath` — columns (c_id, cv, cn) — and append postings. */
  def maintainBatch(dir: String, centroidsPath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val cents = spark.read.parquet(centroidsPath)
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
      .write.mode("overwrite").parquet(s"$dir/postings/batch-$batchId")
  }

  def start(vectors: DataFrame, dir: String, centroidsPath: String,
      trigger: Trigger = Trigger.ProcessingTime(500)): StreamingQuery = {
    require(vectors.isStreaming, "AnnMaintain needs a streaming source")
    vectors.writeStream.outputMode("append").trigger(trigger)
      .foreachBatch(maintainBatch(dir, centroidsPath) _).start()
  }

  /** all LIVE stream-appended postings ([[BatchStore]] rule). */
  def postings(spark: SparkSession, dir: String): DataFrame =
    BatchStore.read(spark, s"$dir/postings", postingsSchema)

  /** fold the per-batch postings dirs into one compacted generation,
    * clustered by cell for probe pruning; `upTo` bounds the fold to
    * committed batches. */
  def compact(spark: SparkSession, dir: String,
      upTo: Long = Long.MaxValue): Unit =
    BatchStore.compact(spark, s"$dir/postings", postingsSchema,
      _.sortWithinPartitions(col("cell")), upTo)
}
