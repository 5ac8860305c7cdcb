package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logql.Lowering.LogsTable

/** Deterministic signal-shaped views over the driver testdata, so the real
  * language frontends (LogQL/PromQL/IR) can be exercised — and
  * oracle-checked — against `/root/testdata` (TESTDATA.md).
  *
  * The mapping is a pure function of the events columns, mirrored 1:1 in
  * the DuckDB oracle SQL (`logsViewSql`).
  */
object SignalViews {

  /** events → logs: timestamp (Long nanos), service_name svc-(user_id%8),
    * severity from event_type, body = props JSON. */
  def logsDf(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      // µs-truncated nanos — the domain DuckDB sees (epoch_ns of a µs ts),
      // so timestamps survive the oracle round-trip bit-for-bit
      (unix_micros(col("ts_us")) * 1000).as("timestamp"),
      col("event_id"),
      concat(lit("svc-"), pmod(col("user_id"), lit(8))).as("service_name"),
      when(col("event_type") === "error", "error")
        .when(col("event_type").isin("purchase", "signup"), "info")
        .otherwise("debug").as("severity_text"),
      col("event_type"),
      col("props").as("body"),
      col("value"))

  /** The same mapping as a DuckDB CTE body over `events`. */
  val logsViewSql: String =
    """SELECT epoch_ns(ts) AS timestamp, event_id,
      |  concat('svc-', user_id % 8) AS service_name,
      |  CASE WHEN event_type = 'error' THEN 'error'
      |       WHEN event_type IN ('purchase','signup') THEN 'info'
      |       ELSE 'debug' END AS severity_text,
      |  event_type, props AS body, value
      |FROM events""".stripMargin

  /** events → metrics: metric_name = event_type, one service label. */
  def metricsDf(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      (unix_micros(col("ts_us")) * 1000).as("timestamp"),
      col("event_id"),
      col("event_type").as("metric_name"),
      concat(lit("svc-"), pmod(col("user_id"), lit(8))).as("service_name"),
      col("value"))

  val metricsViewSql: String =
    """SELECT epoch_ns(ts) AS timestamp, event_id,
      |  event_type AS metric_name,
      |  concat('svc-', user_id % 8) AS service_name, value
      |FROM events""".stripMargin

  def metricsTable(s: SparkSession, dir: String): graft.promql.Eval.MetricsTable =
    graft.promql.Eval.MetricsTable(
      df = metricsDf(s, dir),
      seriesLabels = Seq("service_name"),
      tieBreak = Seq("event_id"))

  /** events → cumulative histogram-bucket series: one row per (event, le)
    * with le ∈ {50,100,150,+Inf} and value<=le — the classic `_bucket`
    * shape (cumulative by construction), value 1 per sample. */
  def histDf(s: SparkSession, dir: String): DataFrame =
    metricsDf(s, dir)
      .select(col("timestamp"), col("event_id"), col("service_name"),
        col("value").as("sample"),
        explode(expr(
          "filter(array('50','100','150','+Inf'), " +
            "le -> le = '+Inf' OR value <= cast(le as double))")).as("le"))
      .withColumn("metric_name", lit("sample_bucket"))
      .withColumn("value", lit(1.0))
      .drop("sample")

  val histViewSql: String =
    """SELECT epoch_ns(ts) AS timestamp, event_id,
      |  concat('svc-', user_id % 8) AS service_name, le,
      |  'sample_bucket' AS metric_name, 1.0 AS value
      |FROM events, unnest(['50','100','150','+Inf']) AS t(le)
      |WHERE le = '+Inf' OR value <= CAST(le AS DOUBLE)""".stripMargin

  def histTable(s: SparkSession, dir: String): graft.promql.Eval.MetricsTable =
    graft.promql.Eval.MetricsTable(
      df = histDf(s, dir),
      seriesLabels = Seq("service_name", "le"),
      tieBreak = Seq("event_id"))

  /** LogsTable wiring: promoted labels + series identity + total-order
    * tie-break (event_id exists in this view, so plans are deterministic). */
  def logsTable(s: SparkSession, dir: String): LogsTable =
    LogsTable(
      df = logsDf(s, dir),
      promoted = Map(
        "service_name" -> "service_name",
        "severity_text" -> "severity_text",
        "event_type" -> "event_type",
        "body" -> "body",
        "value" -> "value"),
      seriesLabels = Seq("service_name", "severity_text", "event_type"),
      hasAttrMap = false,
      tieBreak = Seq("event_id"))
}
