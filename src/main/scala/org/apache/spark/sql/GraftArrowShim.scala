package org.apache.spark.sql

import org.apache.spark.TaskContext
import org.apache.spark.sql.execution.arrow.{ArrowBatchStreamWriter, ArrowConverters}
import org.apache.spark.sql.types.StructType

/** Arrow serialization bridge: `ArrowConverters`/`ArrowBatchStreamWriter`
  * are `private[sql]`, so this one-file shim in the org.apache.spark.sql
  * package exposes exactly the three conversions graft's Arrow result
  * stream needs — the same pattern as [[GraftShim]] for expressions.
  * Everything here delegates to Spark's own Arrow machinery (the code
  * path `toArrowBatchRdd`/PySpark collection uses), nothing is
  * re-implemented. */
object GraftArrowShim {

  /** serialize a DataFrame to Arrow record-batch payloads ON THE
    * EXECUTORS — one or more batches per partition, at most
    * `maxRecordsPerBatch` rows each; the driver only collects the
    * already-encoded bytes. */
  def toBatchBytes(df: Dataset[Row], maxRecordsPerBatch: Long,
      timeZoneId: String): Array[Array[Byte]] = {
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    val schema = classicDf.schema
    classicDf.queryExecution.toRdd.mapPartitions { it =>
      ArrowConverters.toBatchIterator(it, schema, maxRecordsPerBatch,
        timeZoneId, true, false, TaskContext.get())
    }.collect()
  }

  /** encoded-batch ITERATOR: identical executor-side encoding to
    * [[toBatchBytes]], but the driver pulls one partition at a time via
    * `RDD.toLocalIterator` instead of collecting every batch up front —
    * driver memory is bounded by a single partition's encoded batches
    * regardless of total result size. Each element is one complete
    * encapsulated IPC record-batch message (continuation marker +
    * metadata length + flatbuffer + body), exactly what
    * `ArrowBatchStreamWriter` appends after the schema message. */
  def toBatchBytesIterator(df: Dataset[Row], maxRecordsPerBatch: Long,
      timeZoneId: String): Iterator[Array[Byte]] = {
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    val schema = classicDf.schema
    classicDf.queryExecution.toRdd.mapPartitions { it =>
      ArrowConverters.toBatchIterator(it, schema, maxRecordsPerBatch,
        timeZoneId, true, false, TaskContext.get())
    }.toLocalIterator
  }

  /** frame schema + batches as one standard Arrow IPC stream. */
  def writeIpcStream(out: java.io.OutputStream, schema: StructType,
      batches: Iterator[Array[Byte]], timeZoneId: String): Unit = {
    val w = new ArrowBatchStreamWriter(schema, out, timeZoneId, true, false)
    w.writeBatches(batches)
    w.end()
  }

  /** parse an Arrow IPC stream back to a DataFrame (schema read from the
    * stream itself). */
  def fromIpcStream(spark: SparkSession, bytes: Array[Byte]): Dataset[Row] = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val (rows, schema) = ArrowConverters.fromIPCStream(bytes)
    try {
      val data = rows.map(_.copy()).toSeq
      classicSpark.internalCreateDataFrame(
        classicSpark.sparkContext.parallelize(data, 1), schema)
    } finally rows.close()
  }
}
