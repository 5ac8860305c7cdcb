package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OTLP/HTTP JSON (protojson) decode — the acceptor's
  * `application/json` content type (reference
  * `src/acceptor/src/lib.rs:445-545` decodes every export route by
  * content type; OTLP's JSON mapping: uint64s as decimal STRINGS,
  * trace/span ids as HEX strings, enums as integers). Unlike the
  * protobuf wire path (`Otlp` — a per-row flatMap over hand-read
  * bytes, the right shape for an opaque binary format), JSON decode is
  * fully DECLARATIVE: `from_json` with an explicit schema, one explode
  * per nesting level — the whole pipeline stays inside Catalyst and
  * whole-stage codegen. Output columns match the protobuf rows
  * (`Otlp.LogRow` / `TraceRow` / `MetricRow` shapes, same names, same
  * order), so both encodings land through the same idempotent sink and
  * are indistinguishable downstream.
  *
  * Scalar AnyValues coerce to strings with the same rules as the wire
  * decoder's `anyValue` (bool → "true"/"false", int64 → decimal string,
  * double → Java toString). Array/kvlist attribute VALUES — rare in
  * practice — resolve to null in this path (the wire path serializes
  * them); span events/links re-serialize through `to_json`, where
  * integer attribute values inside event attribute maps render quoted
  * (the wire path leaves them unquoted) — a documented representational
  * difference in a free-text JSON column, not a semantic one. */
object OtlpJson {

  private val aval = StructType(Seq(
    StructField("stringValue", StringType),
    StructField("intValue", StringType), // protojson int64 = string
    StructField("doubleValue", DoubleType),
    StructField("boolValue", BooleanType)))
  private val kvArr = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", aval))))

  /** attributes array → map<string,string>, wire-decoder coercion. */
  private def attrMap(c: Column): Column =
    map_from_entries(transform(
      coalesce(c, array().cast(kvArr)),
      a => struct(
        a("key"),
        coalesce(
          a("value")("stringValue"),
          a("value")("intValue"),
          a("value")("doubleValue").cast("string"),
          a("value")("boolValue").cast("string"),
          lit("")))))

  private def anyToString(c: Column): Column =
    coalesce(c("stringValue"), c("intValue"),
      c("doubleValue").cast("string"), c("boolValue").cast("string"), lit(""))

  private def ns(c: Column): Column = coalesce(c.cast("long"), lit(0L))

  // ---- logs --------------------------------------------------------------

  private val logSchema = StructType(Seq(
    StructField("resourceLogs", ArrayType(StructType(Seq(
      StructField("resource", StructType(Seq(
        StructField("attributes", kvArr)))),
      StructField("scopeLogs", ArrayType(StructType(Seq(
        StructField("scope", StructType(Seq(
          StructField("name", StringType),
          StructField("version", StringType),
          StructField("attributes", kvArr)))),
        StructField("logRecords", ArrayType(StructType(Seq(
          StructField("timeUnixNano", StringType),
          StructField("observedTimeUnixNano", StringType),
          StructField("severityNumber", IntegerType),
          StructField("severityText", StringType),
          StructField("body", aval),
          StructField("attributes", kvArr),
          StructField("flags", IntegerType),
          StructField("traceId", StringType),
          StructField("spanId", StringType)))))))))))))))

  /** payloads (one protojson ExportLogsServiceRequest per row) → log
    * rows in the `Otlp.LogRow` column shape. */
  def logs(payloads: DataFrame): DataFrame =
    payloads
      .select(from_json(col("payload").cast("string"), logSchema).as("r"))
      .select(explode(col("r.resourceLogs")).as("rl"))
      .select(attrMap(col("rl.resource.attributes")).as("resource_attributes"),
        explode(col("rl.scopeLogs")).as("sl"))
      .select(col("resource_attributes"),
        coalesce(col("sl.scope.name"), lit("")).as("scope_name"),
        coalesce(col("sl.scope.version"), lit("")).as("scope_version"),
        attrMap(col("sl.scope.attributes")).as("scope_attributes"),
        explode(col("sl.logRecords")).as("lr"))
      .select(
        ns(col("lr.timeUnixNano")).as("timestamp"),
        when(ns(col("lr.observedTimeUnixNano")) =!= 0L,
          ns(col("lr.observedTimeUnixNano")))
          .otherwise(ns(col("lr.timeUnixNano"))).as("observed_timestamp"),
        coalesce(col("lr.traceId"), lit("")).as("trace_id"),
        coalesce(col("lr.spanId"), lit("")).as("span_id"),
        coalesce(col("lr.flags"), lit(0)).as("trace_flags"),
        coalesce(col("lr.severityText"), lit("")).as("severity_text"),
        coalesce(col("lr.severityNumber"), lit(0)).as("severity_number"),
        coalesce(element_at(col("resource_attributes"), "service.name"),
          lit("")).as("service_name"),
        anyToString(col("lr.body")).as("body"),
        col("resource_attributes"),
        col("scope_attributes"),
        attrMap(col("lr.attributes")).as("log_attributes"),
        col("scope_name"),
        col("scope_version"))

  // ---- traces ------------------------------------------------------------

  private val eventArr = ArrayType(StructType(Seq(
    StructField("timeUnixNano", StringType),
    StructField("name", StringType),
    StructField("attributes", kvArr))))
  private val linkArr = ArrayType(StructType(Seq(
    StructField("traceId", StringType),
    StructField("spanId", StringType))))

  private val traceSchema = StructType(Seq(
    StructField("resourceSpans", ArrayType(StructType(Seq(
      StructField("resource", StructType(Seq(
        StructField("attributes", kvArr)))),
      StructField("scopeSpans", ArrayType(StructType(Seq(
        StructField("scope", StructType(Seq(
          StructField("name", StringType),
          StructField("version", StringType),
          StructField("attributes", kvArr)))),
        StructField("spans", ArrayType(StructType(Seq(
          StructField("traceId", StringType),
          StructField("spanId", StringType),
          StructField("traceState", StringType),
          StructField("parentSpanId", StringType),
          StructField("name", StringType),
          StructField("kind", IntegerType), // OTLP JSON: enums as ints
          StructField("startTimeUnixNano", StringType),
          StructField("endTimeUnixNano", StringType),
          StructField("attributes", kvArr),
          StructField("events", eventArr),
          StructField("links", linkArr),
          StructField("status", StructType(Seq(
            StructField("message", StringType),
            StructField("code", IntegerType))))))))))))))))))

  /** payloads (one protojson ExportTraceServiceRequest per row) → span
    * rows in the `Otlp.TraceRow` column shape (kind/status string
    * tables as the reference's conversion_traces.rs writes them). */
  def traces(payloads: DataFrame): DataFrame =
    payloads
      .select(from_json(col("payload").cast("string"), traceSchema).as("r"))
      .select(explode(col("r.resourceSpans")).as("rs"))
      .select(attrMap(col("rs.resource.attributes")).as("resource_attributes"),
        explode(col("rs.scopeSpans")).as("ss"))
      .select(col("resource_attributes"),
        coalesce(col("ss.scope.name"), lit("")).as("scope_name"),
        coalesce(col("ss.scope.version"), lit("")).as("scope_version"),
        attrMap(col("ss.scope.attributes")).as("scope_attributes"),
        explode(col("ss.spans")).as("sp"))
      .select(
        coalesce(col("sp.traceId"), lit("")).as("trace_id"),
        coalesce(col("sp.spanId"), lit("")).as("span_id"),
        coalesce(col("sp.parentSpanId"), lit("")).as("parent_span_id"),
        coalesce(col("sp.name"), lit("")).as("span_name"),
        coalesce(element_at(col("resource_attributes"), "service.name"),
          lit("")).as("service_name"),
        ns(col("sp.startTimeUnixNano")).as("start_time_unix_nano"),
        ns(col("sp.endTimeUnixNano")).as("end_time_unix_nano"),
        greatest(lit(0L), ns(col("sp.endTimeUnixNano")) -
          ns(col("sp.startTimeUnixNano"))).as("duration_nanos"),
        coalesce(col("sp.kind"), lit(0)).as("_kind"),
        coalesce(col("sp.status.code"), lit(0)).as("_status_code"),
        coalesce(col("sp.status.message"), lit("")).as("status_message"),
        (coalesce(col("sp.parentSpanId"), lit("")) === "").as("is_root"),
        attrMap(col("sp.attributes")).as("span_attributes"),
        col("resource_attributes"),
        col("scope_attributes"),
        coalesce(to_json(transform(col("sp.events"), e => struct(
          coalesce(e("name"), lit("")).as("name"),
          ns(e("timeUnixNano")).as("time_unix_nano"),
          attrMap(e("attributes")).as("attributes")))), lit("[]")).as("events"),
        coalesce(to_json(transform(col("sp.links"), l => struct(
          coalesce(l("traceId"), lit("")).as("trace_id"),
          coalesce(l("spanId"), lit("")).as("span_id")))), lit("[]")).as("links"),
        coalesce(col("sp.traceState"), lit("")).as("trace_state"),
        col("scope_name"),
        col("scope_version"),
        ns(col("sp.startTimeUnixNano")).as("timestamp"))
      .withColumn("span_kind",
        when(col("_kind") === 1, "Server")
          .when(col("_kind") === 2, "Client")
          .when(col("_kind") === 3, "Producer")
          .when(col("_kind") === 4, "Consumer")
          .otherwise("Internal"))
      .withColumn("status_code",
        when(col("_status_code") === 1, "Ok")
          .when(col("_status_code") === 2, "Error")
          .otherwise("Unspecified"))
      .drop("_kind", "_status_code")
      .select("trace_id", "span_id", "parent_span_id", "span_name",
        "service_name", "start_time_unix_nano", "end_time_unix_nano",
        "duration_nanos", "span_kind", "status_code", "status_message",
        "is_root", "span_attributes", "resource_attributes",
        "scope_attributes", "events", "links", "trace_state",
        "scope_name", "scope_version", "timestamp")

  // ---- metrics -----------------------------------------------------------

  private val exemplarArr = ArrayType(StructType(Seq(
    StructField("timeUnixNano", StringType),
    StructField("asDouble", DoubleType),
    StructField("asInt", StringType),
    StructField("spanId", StringType),
    StructField("traceId", StringType))))

  private val pointArr = ArrayType(StructType(Seq(
    StructField("startTimeUnixNano", StringType),
    StructField("timeUnixNano", StringType),
    StructField("asDouble", DoubleType),
    StructField("asInt", StringType), // protojson int64 = string
    StructField("attributes", kvArr),
    StructField("flags", IntegerType),
    StructField("exemplars", exemplarArr))))

  private val histPointArr = ArrayType(StructType(Seq(
    StructField("startTimeUnixNano", StringType),
    StructField("timeUnixNano", StringType),
    StructField("count", StringType), // protojson uint64 = string
    StructField("sum", DoubleType),
    StructField("bucketCounts", ArrayType(StringType)),
    StructField("explicitBounds", ArrayType(DoubleType)),
    StructField("attributes", kvArr),
    StructField("flags", IntegerType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("exemplars", exemplarArr))))

  private val metricSchema = StructType(Seq(
    StructField("resourceMetrics", ArrayType(StructType(Seq(
      StructField("resource", StructType(Seq(
        StructField("attributes", kvArr)))),
      StructField("scopeMetrics", ArrayType(StructType(Seq(
        StructField("scope", StructType(Seq(
          StructField("name", StringType),
          StructField("version", StringType),
          StructField("attributes", kvArr)))),
        StructField("metrics", ArrayType(StructType(Seq(
          StructField("name", StringType),
          StructField("description", StringType),
          StructField("unit", StringType),
          StructField("gauge", StructType(Seq(
            StructField("dataPoints", pointArr)))),
          StructField("sum", StructType(Seq(
            StructField("dataPoints", pointArr),
            StructField("aggregationTemporality", IntegerType),
            StructField("isMonotonic", BooleanType)))),
          StructField("histogram", StructType(Seq(
            StructField("dataPoints", histPointArr),
            StructField("aggregationTemporality", IntegerType))))))))))))))))))

  /** payloads (one protojson ExportMetricsServiceRequest per row) →
    * (gauge rows, sum rows) in the Schemas.metric* shapes — the same
    * split as `Otlp.metrics`, exemplars mapped to the same JSON rows
    * (`{"value","timestamp","trace_id","span_id"}`) as the wire path. */
  def metrics(payloads: DataFrame): (DataFrame, DataFrame) = {
    val base = payloads
      .select(from_json(col("payload").cast("string"), metricSchema).as("r"))
      .select(explode(col("r.resourceMetrics")).as("rm"))
      .select(attrMap(col("rm.resource.attributes")).as("resource_attributes"),
        explode(col("rm.scopeMetrics")).as("sm"))
      .select(col("resource_attributes"),
        attrMap(col("sm.scope.attributes")).as("scope_attributes"),
        explode(col("sm.metrics")).as("m"))
    def points(kind: String) = {
      val pts = if (kind == "gauge") col("m.gauge.dataPoints")
        else col("m.sum.dataPoints")
      base
        .filter(pts.isNotNull)
        .select(col("resource_attributes"), col("scope_attributes"),
          coalesce(col("m.name"), lit("")).as("metric_name"),
          coalesce(col("m.description"), lit("")).as("metric_description"),
          coalesce(col("m.unit"), lit("")).as("metric_unit"),
          coalesce(col("m.sum.aggregationTemporality"), lit(0))
            .as("aggregation_temporality"),
          coalesce(col("m.sum.isMonotonic"), lit(false)).as("is_monotonic"),
          explode(pts).as("p"))
        .select(
          ns(col("p.timeUnixNano")).as("timestamp"),
          // missing start time defaults to the point time (wire-path rule)
          when(ns(col("p.startTimeUnixNano")) =!= 0L,
            ns(col("p.startTimeUnixNano")))
            .otherwise(ns(col("p.timeUnixNano"))).as("start_timestamp"),
          coalesce(element_at(col("resource_attributes"), "service.name"),
            lit("")).as("service_name"),
          col("metric_name"), col("metric_description"), col("metric_unit"),
          col("resource_attributes"), col("scope_attributes"),
          attrMap(col("p.attributes")).as("attributes"),
          coalesce(col("p.flags"), lit(0)).as("flags"),
          // same JSON shape as the wire path's hand-built exemplar rows
          coalesce(to_json(transform(col("p.exemplars"), e => struct(
            coalesce(e("asDouble"), e("asInt").cast("double"), lit(0.0))
              .as("value"),
            ns(e("timeUnixNano")).as("timestamp"),
            coalesce(e("traceId"), lit("")).as("trace_id"),
            coalesce(e("spanId"), lit("")).as("span_id")))), lit("[]"))
            .as("exemplars"),
          coalesce(col("p.asDouble"), col("p.asInt").cast("double"), lit(0.0))
            .as("value"),
          col("aggregation_temporality"), col("is_monotonic"))
    }
    (points("gauge").drop("aggregation_temporality", "is_monotonic"),
      points("sum"))
  }

  /** payloads → HISTOGRAM data-point rows in the
    * `Otlp.HistogramRow` column shape (bucket_counts/explicit_bounds as
    * the same JSON array strings the wire path builds). */
  def histograms(payloads: DataFrame): DataFrame =
    payloads
      .select(from_json(col("payload").cast("string"), metricSchema).as("r"))
      .select(explode(col("r.resourceMetrics")).as("rm"))
      .select(attrMap(col("rm.resource.attributes")).as("resource_attributes"),
        explode(col("rm.scopeMetrics")).as("sm"))
      .select(col("resource_attributes"),
        attrMap(col("sm.scope.attributes")).as("scope_attributes"),
        explode(col("sm.metrics")).as("m"))
      .filter(col("m.histogram.dataPoints").isNotNull)
      .select(col("resource_attributes"), col("scope_attributes"),
        coalesce(col("m.name"), lit("")).as("metric_name"),
        coalesce(col("m.description"), lit("")).as("metric_description"),
        coalesce(col("m.unit"), lit("")).as("metric_unit"),
        coalesce(col("m.histogram.aggregationTemporality"), lit(0))
          .as("aggregation_temporality"),
        explode(col("m.histogram.dataPoints")).as("p"))
      .select(
        ns(col("p.timeUnixNano")).as("timestamp"),
        when(ns(col("p.startTimeUnixNano")) =!= 0L,
          ns(col("p.startTimeUnixNano")))
          .otherwise(ns(col("p.timeUnixNano"))).as("start_timestamp"),
        coalesce(element_at(col("resource_attributes"), "service.name"),
          lit("")).as("service_name"),
        col("metric_name"), col("metric_description"), col("metric_unit"),
        col("resource_attributes"), col("scope_attributes"),
        attrMap(col("p.attributes")).as("attributes"),
        coalesce(col("p.flags"), lit(0)).as("flags"),
        coalesce(to_json(transform(col("p.exemplars"), e => struct(
          coalesce(e("asDouble"), e("asInt").cast("double"), lit(0.0))
            .as("value"),
          ns(e("timeUnixNano")).as("timestamp"),
          coalesce(e("traceId"), lit("")).as("trace_id"),
          coalesce(e("spanId"), lit("")).as("span_id")))), lit("[]"))
          .as("exemplars"),
        ns(col("p.count")).as("count"),
        col("p.sum").as("sum"),
        col("p.min").as("min"),
        col("p.max").as("max"),
        coalesce(to_json(transform(col("p.bucketCounts"),
          b => b.cast("long"))), lit("[]")).as("bucket_counts"),
        coalesce(to_json(col("p.explicitBounds")), lit("[]"))
          .as("explicit_bounds"),
        col("aggregation_temporality"))
}
