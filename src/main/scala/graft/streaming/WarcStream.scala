package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** Streaming WARC ingest: a crawl delivers archives as FILES (that is
  * what a 100 TB Common Crawl drop physically is), so the streaming
  * unit is the arriving `.warc` file — Spark's `binaryFile` source
  * watches the landing directory, each archive's records are framed out
  * by the strict ISO 28500 walk ([[graft.sources.Warc]]), response
  * records HTTP-split, and the entity bodies handed to the SAME
  * extraction chain the batch side uses
  * ([[graft.operators.PipelineOps.htmlStripped]] — q335/q346). One code
  * path for the per-record logic; batch and stream are the same
  * DataFrame program over different sources, which is the law the spec
  * pins (batch run ≡ accumulated micro-batches on identical files).
  *
  * Scale shape: file listing is the only driver-side work; decode is
  * per-file flatMap on the executors (an archive's records never leave
  * their task), and the downstream clean/quality columns are codegen'd
  * regex chains — the pipeline runs at scan speed with ZERO shuffles.
  * Malformed archives contribute zero rows: the strict parser rejects
  * the whole file (its law lives in DecoderFuzzSpec) and the stream
  * keeps going — one bit-rotted archive never stalls a crawl backfill.
  */
object WarcStream {

  /** one extracted response: where it came from (archive + record
    * index), the WARC envelope essentials, and the cleaned text. */
  final case class WarcDoc(archive: String, record_index: Int,
      target_uri: String, status: Int, n_payload: Long, html: String)

  /** per-archive record extraction — shared verbatim by the batch and
    * streaming entry points. Input rows: (path, content). */
  private def extractDocs(files: Dataset[(String, Array[Byte])])
      : Dataset[WarcDoc] = {
    import files.sparkSession.implicits._
    files.flatMap { case (path, bytes) =>
      Warc.parse(bytes).getOrElse(Vector.empty).zipWithIndex.collect {
        case (r, i) if r.warcType.contains("response") =>
          Warc.httpResponse(r.payload).map { case (status, _, body) =>
            WarcDoc(path, i, r.targetUri.getOrElse(""), status,
              r.payload.length.toLong, new String(body, "UTF-8"))
          }
      }.flatten
    }
  }

  /** the clean-text projection over extracted docs: the q335 extraction
    * chain plus the coarse quality gates a crawl pipeline applies first
    * (non-2xx dropped, empty text dropped). */
  private def shape(docs: Dataset[WarcDoc]): DataFrame =
    graft.operators.PipelineOps.htmlStripped(docs.toDF())
      .filter(col("status") >= 200 && col("status") < 300)
      .select(col("archive"), col("record_index"), col("target_uri"),
        col("status"), col("n_payload"),
        length(col("html")).cast("long").as("n_html"),
        col("clean").as("clean_text"))
      .filter(length(col("clean_text")) > 0)

  /** BATCH twin: every archive under `glob`, extracted in one pass. */
  def batch(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    shape(extractDocs(
      spark.read.format("binaryFile").load(glob)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]))
  }

  /** STREAMING: watch `dir` for arriving archives; each micro-batch
    * extracts exactly the new files' records. `maxFilesPerTrigger`
    * bounds per-batch work so one huge drop cannot starve the trigger
    * cadence. */
  def stream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    import spark.implicits._
    shape(extractDocs(
      spark.readStream.format("binaryFile")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        // binaryFile's fixed schema must be declared for streaming reads
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .load(dir)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]))
  }
}
