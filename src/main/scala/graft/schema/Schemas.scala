package graft.schema

import org.apache.spark.sql.types._

/** StructTypes for the 8 signal tables (reference: schemas.toml:14-169 and
  * src/common/src/iceberg/schemas.rs:189-455).
  *
  * Conventions (SURVEY §1.4):
  *  - canonical times are Long epoch-nanos (`*_unix_nano`, `timestamp`);
  *    Spark TimestampType is µs so a derived µs column is added only where
  *    calendar ops need it;
  *  - attributes are MapType(String,String) (generation-2 storage,
  *    reference iceberg/schemas.rs:55-72);
  *  - `attr_tokens` is an ArrayType(String) of `k=v` tokens for
  *    bloom-filtered containment (reference schema/mod.rs:40-53);
  *  - `date_day`/`hour` are the partition columns (Hour(timestamp)
  *    transform analog, reference iceberg/schemas.rs:75-105).
  */
object Schemas {

  private val attrMap = MapType(StringType, StringType)

  private def partitionCols: Seq[StructField] = Seq(
    StructField("date_day", DateType),
    StructField("hour", IntegerType))

  val traces: StructType = StructType(Seq(
    StructField("trace_id", StringType),
    StructField("span_id", StringType),
    StructField("parent_span_id", StringType),
    StructField("span_name", StringType),
    StructField("service_name", StringType),
    StructField("start_time_unix_nano", LongType),
    StructField("end_time_unix_nano", LongType),
    StructField("duration_nanos", LongType),
    StructField("span_kind", StringType),
    StructField("status_code", StringType),
    StructField("status_message", StringType),
    StructField("is_root", BooleanType),
    StructField("span_attributes", attrMap),
    StructField("resource_attributes", attrMap),
    StructField("scope_attributes", attrMap),
    StructField("events", StringType),  // serialized JSON (reference trace.rs:863-882)
    StructField("links", StringType),
    StructField("trace_state", StringType),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("schema_url", StringType),
    StructField("timestamp", LongType)) ++ partitionCols)

  val logs: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("observed_timestamp", LongType),
    StructField("trace_id", StringType),
    StructField("span_id", StringType),
    StructField("trace_flags", IntegerType),
    StructField("severity_text", StringType),
    StructField("severity_number", IntegerType),
    StructField("service_name", StringType),
    StructField("body", StringType),
    StructField("resource_attributes", attrMap),
    StructField("scope_attributes", attrMap),
    StructField("log_attributes", attrMap),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("attr_tokens", ArrayType(StringType))) ++ partitionCols)

  private def metricCommon: Seq[StructField] = Seq(
    StructField("timestamp", LongType),
    StructField("start_timestamp", LongType),
    StructField("service_name", StringType),
    StructField("metric_name", StringType),
    StructField("metric_description", StringType),
    StructField("metric_unit", StringType),
    StructField("resource_attributes", attrMap),
    StructField("scope_attributes", attrMap),
    StructField("attributes", attrMap),
    StructField("flags", IntegerType),
    StructField("exemplars", StringType))

  val metricsGauge: StructType =
    StructType(metricCommon ++ Seq(StructField("value", DoubleType)) ++ partitionCols)

  val metricsSum: StructType = StructType(metricCommon ++ Seq(
    StructField("value", DoubleType),
    StructField("aggregation_temporality", IntegerType),
    StructField("is_monotonic", BooleanType)) ++ partitionCols)

  val metricsHistogram: StructType = StructType(metricCommon ++ Seq(
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("bucket_counts", StringType),   // JSON array string
    StructField("explicit_bounds", StringType), // JSON array string
    StructField("aggregation_temporality", IntegerType)) ++ partitionCols)

  val metricsExponentialHistogram: StructType = StructType(metricCommon ++ Seq(
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("scale", IntegerType),
    StructField("zero_count", LongType),
    StructField("positive_offset", IntegerType),
    StructField("positive_bucket_counts", StringType),
    StructField("negative_offset", IntegerType),
    StructField("negative_bucket_counts", StringType),
    StructField("zero_threshold", DoubleType),
    StructField("aggregation_temporality", IntegerType)) ++ partitionCols)

  val metricsSummary: StructType = StructType(metricCommon ++ Seq(
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("quantile_values", StringType)) ++ partitionCols)

  val profiles: StructType = StructType(Seq(
    StructField("profile_id", StringType),
    StructField("timestamp", LongType),
    StructField("duration_nano", LongType),
    StructField("sample_type", StringType),
    StructField("sample_unit", StringType),
    StructField("period_type", StringType),
    StructField("period_unit", StringType),
    StructField("period", LongType),
    StructField("service_name", StringType),
    StructField("stacktraces_json", StringType),
    StructField("samples_json", StringType),
    StructField("resource_attributes", attrMap),
    StructField("attributes", attrMap),
    StructField("trace_id", StringType),
    StructField("span_id", StringType)) ++ partitionCols)

  val all: Map[String, StructType] = Map(
    "traces" -> traces,
    "logs" -> logs,
    "metrics_gauge" -> metricsGauge,
    "metrics_sum" -> metricsSum,
    "metrics_histogram" -> metricsHistogram,
    "metrics_exponential_histogram" -> metricsExponentialHistogram,
    "metrics_summary" -> metricsSummary,
    "profiles" -> profiles)
}
