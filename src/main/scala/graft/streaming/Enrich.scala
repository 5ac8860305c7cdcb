package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-time enrichment: attach dimension attributes (service metadata,
  * team ownership, deploy version) to the stream as it lands, so queries
  * never pay a fact↔dim join later (the reference bakes resource
  * attributes into every stored row at ingest for the same reason —
  * resource_attributes on all signal schemas).
  *
  * The dimension is slowly changing (SCD-2: each row is (key,
  * effective_from, attrs)); an event must pick the version effective AT
  * ITS TIMESTAMP. A windowed as-of join is not available to a streaming
  * query in append mode, so the dim side is pre-packed per key into a
  * sorted array of (from, attrs) versions, broadcast, and the pick is a
  * pure projection — `element_at(filter(versions, from <= ts), -1)` —
  * stateless, watermark-free, and safe under micro-batch replay. At
  * 100 TB of stream this stays a broadcast: the packed dim is one row
  * per key regardless of version count, and version arrays are small by
  * the SCD construction.
  */
object Enrich {

  /** pack an SCD-2 dim (one row per (key, effectiveFrom)) into one row
    * per key holding the version history sorted by effectiveFrom. */
  def packDim(dim: DataFrame, key: String, effectiveFrom: String,
      attrCols: Seq[String]): DataFrame =
    dim.groupBy(col(key))
      .agg(sort_array(collect_list(struct(
        col(effectiveFrom).cast("long").as("_from"),
        struct(attrCols.map(col): _*).as("_attrs")))).as("_versions"))

  /** left-attach the point-in-time attributes: each attr column appears
    * on the output, null when no version was effective yet (or the key
    * is unknown) — exactly the semantics of a left as-of join, with no
    * stream-side state. `tsCol` and `effectiveFrom` must share a unit. */
  def pointInTime(stream: DataFrame, packedDim: DataFrame, key: String,
      tsCol: String, attrCols: Seq[String]): DataFrame = {
    // try_element_at: an event earlier than every version (or an unknown
    // key) filters to an empty history and must yield null, not error
    val eff: Column = try_element_at(
      filter(col("_versions"), v => v("_from") <= col(tsCol).cast("long")), lit(-1))
    attrCols.foldLeft(
      stream.join(broadcast(packedDim), Seq(key), "left"))(
      (d, a) => d.withColumn(a, eff("_attrs")(a)))
      .drop("_versions")
  }
}
