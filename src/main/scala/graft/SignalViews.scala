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
