package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Tar, TfRecord}

/** Streaming DATALOADER-SHARD ingest — the inverse of the q359/q360
  * export surface: training corpora arrive as WebDataset `.tar` shards
  * or `.tfrecord` files (that is what a dataset drop physically is),
  * so the streaming unit is the arriving shard file. Spark's
  * `binaryFile` source watches the landing directory; each shard's
  * members/records are framed out by the SAME strict parsers the batch
  * side uses ([[graft.sources.Tar]], [[graft.sources.TfRecord]]), and
  * batch and stream are the same DataFrame program over different
  * sources — the [[WarcStream]] law, extended to the dataloader
  * containers (batch run ≡ accumulated micro-batches on identical
  * files, ShardStreamSpec).
  *
  * Scale shape: file listing is the only driver-side work; shard
  * decode is a per-file flatMap on the executors (a shard's members
  * never leave their task) — zero shuffles, scan-bound. A malformed
  * shard contributes zero rows (the strict parser rejects the whole
  * file, its law lives in the container specs) and the stream keeps
  * going — one corrupt shard never stalls a backfill.
  */
object ShardStream {

  final case class ShardDoc(shard: String, member: String, n_bytes: Long,
      text: String)

  // ---- WebDataset-style .tar shards ---------------------------------------

  private def extractTar(files: Dataset[(String, Array[Byte])])
      : Dataset[ShardDoc] = {
    import files.sparkSession.implicits._
    files.flatMap { case (path, bytes) =>
      Tar.parse(bytes).getOrElse(Vector.empty).collect {
        case e if e.typeflag == '0' && e.name.endsWith(".txt") =>
          ShardDoc(path, e.name, e.payload.length.toLong,
            new String(e.payload, "UTF-8"))
      }
    }
  }

  // ---- .tfrecord files -----------------------------------------------------

  private def extractTfr(files: Dataset[(String, Array[Byte])])
      : Dataset[ShardDoc] = {
    import files.sparkSession.implicits._
    files.flatMap { case (path, bytes) =>
      TfRecord.readAll(bytes).getOrElse(Vector.empty).zipWithIndex.flatMap {
        case (rec, i) =>
          TfRecord.parseExample(rec).flatMap { fs =>
            val m = fs.toMap
            m.get("text").flatMap(_.bytes.headOption).map { t =>
              ShardDoc(path, s"record-$i", rec.length.toLong,
                new String(t, java.nio.charset.StandardCharsets.UTF_8))
            }
          }
      }
    }
  }

  /** the shared projection: shard provenance + the coarse text-quality
    * columns a training pipeline gates on first. */
  private def shape(docs: Dataset[ShardDoc]): DataFrame =
    docs.toDF()
      .filter(length(col("text")) > 0)
      .select(col("shard"), col("member"), col("n_bytes"),
        length(col("text")).cast("long").as("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("text")).as("text_md5"))

  private def binaryFiles(spark: SparkSession, pathOrGlob: String,
      streaming: Boolean, maxFilesPerTrigger: Int)
      : Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    val df =
      if (!streaming) spark.read.format("binaryFile").load(pathOrGlob)
      else spark.readStream.format("binaryFile")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .load(pathOrGlob)
    df.select(col("path"), col("content")).as[(String, Array[Byte])]
  }

  def batchTar(spark: SparkSession, glob: String): DataFrame =
    shape(extractTar(binaryFiles(spark, glob, streaming = false, 0)))

  def streamTar(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    shape(extractTar(binaryFiles(spark, dir, streaming = true,
      maxFilesPerTrigger)))

  def batchTfRecord(spark: SparkSession, glob: String): DataFrame =
    shape(extractTfr(binaryFiles(spark, glob, streaming = false, 0)))

  def streamTfRecord(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    shape(extractTfr(binaryFiles(spark, dir, streaming = true,
      maxFilesPerTrigger)))
}
