package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Result-envelope shaping: the JSON bodies Grafana consumes (reference:
  * src/router/src/endpoints/logql.rs Loki streams envelope,
  * promql.rs Prometheus matrix envelope, tempo.rs trace search envelope).
  *
  * The heavy lifting — grouping rows into streams/series and ordering
  * values — happens DISTRIBUTED (groupBy + sort_array + to_json); the
  * driver only concatenates per-stream JSON fragments of the final,
  * already-limited result set. That is the same materialization boundary
  * the reference router sits on: envelopes are response-sized by
  * construction (post-limit), never raw-scan-sized.
  */
object ApiJson {

  /** Loki query_range "streams" envelope from line-query rows
    * (timestamp Long nanos, label cols…, body). One stream per distinct
    * label set; values newest-first as [ns-string, line] pairs. */
  def lokiStreams(df: DataFrame, labelCols: Seq[String]): String = {
    val streamObj = to_json(map_from_arrays(
      array(labelCols.map(lit(_)): _*),
      array(labelCols.map(c => col(c).cast("string")): _*)))
    val entries = df
      .groupBy(streamObj.as("_stream"))
      .agg(sort_array(collect_list(struct(
        (lit(Long.MaxValue) - col("timestamp")).as("_ord"),
        col("timestamp").cast("string").as("ts"),
        col("body").as("line"))), asc = true).as("_vs"))
      .select(col("_stream"),
        to_json(expr("transform(_vs, v -> array(v.ts, v.line))")).as("_values"))
      .orderBy(col("_stream"))
      .collect()
    val streams = entries.map { r =>
      s"""{"stream":${r.getString(0)},"values":${r.getString(1)}}"""
    }
    s"""{"status":"success","data":{"resultType":"streams","result":[${streams.mkString(",")}]}}"""
  }

  /** Loki tail frame from one micro-batch of tailed lines — the same
    * streams shape as query_range minus the outer status envelope
    * (`{"streams":[…]}`), which is what the WebSocket tail protocol sends
    * per push. Pairs with streaming.LiveTail: poll the memory sink, frame
    * the delta, send. */
  def lokiTailFrame(df: DataFrame, labelCols: Seq[String]): String = {
    val inner = lokiStreams(df, labelCols)
    val result = inner.substring(inner.indexOf("\"result\":") + "\"result\":".length,
      inner.lastIndexOf("}}"))
    s"""{"streams":$result}"""
  }

  /** Prometheus query_range "matrix" envelope from vector rows
    * (bucket_start, label cols…, value). Values are [sec, "v"] pairs in
    * time order; series ordered by metric label set. */
  def promMatrix(df: DataFrame, labelCols: Seq[String]): String = {
    val metricObj = to_json(map_from_arrays(
      array(labelCols.map(lit(_)): _*),
      array(labelCols.map(c => col(c).cast("string")): _*)))
    val entries = df
      .groupBy(metricObj.as("_metric"))
      .agg(sort_array(collect_list(struct(
        col("bucket_start").cast("long").as("t"),
        col("value").cast("string").as("v"))), asc = true).as("_vs"))
      .select(col("_metric"),
        to_json(expr("transform(_vs, x -> array(cast(x.t as string), x.v))")).as("_values"))
      .orderBy(col("_metric"))
      .collect()
    val series = entries.map { r =>
      // prometheus value pairs are [number, "string"]: strip the quotes
      // the string-array detour added around the timestamp
      val vals = r.getString(1).replaceAll("""\["(\-?\d+)",""", "[$1,")
      s"""{"metric":${r.getString(0)},"values":$vals}"""
    }
    s"""{"status":"success","data":{"resultType":"matrix","result":[${series.mkString(",")}]}}"""
  }

  /** Prometheus instant-query "vector" envelope: one sample per series
    * at the evaluation time (the latest bucket when several arrive). */
  def promVector(df: DataFrame, labelCols: Seq[String], timeSec: Long): String = {
    val metricObj = to_json(map_from_arrays(
      array(labelCols.map(lit(_)): _*),
      array(labelCols.map(c => col(c).cast("string")): _*)))
    val entries = df
      .groupBy(metricObj.as("_metric"))
      .agg(max_by(col("value").cast("string"), col("bucket_start")).as("_v"))
      .orderBy(col("_metric"))
      .collect()
    val series = entries.map { r =>
      s"""{"metric":${r.getString(0)},"value":[$timeSec,"${r.getString(1)}"]}"""
    }
    s"""{"status":"success","data":{"resultType":"vector","result":[${series.mkString(",")}]}}"""
  }

  /** Tempo search envelope from span rows (trace_id, span rows with
    * timestamp Long nanos, service_name, duration_nanos): one entry per
    * trace, newest-first. */
  def tempoSearch(df: DataFrame, limit: Int = 20): String = {
    val traces = df
      .groupBy(col("trace_id"))
      .agg(
        min(col("timestamp")).as("_start"),
        ((max(col("timestamp")) - min(col("timestamp"))) / lit(1000000L))
          .cast("long").as("_durationMs"),
        min_by(col("service_name"), col("timestamp")).as("_rootService"))
      .orderBy(col("_start").desc, col("trace_id").asc)
      .limit(limit)
      .collect()
    val entries = traces.map { r =>
      s"""{"traceID":${jstr(r.getString(0))},"rootServiceName":${jstr(r.getString(3))},""" +
        s""""startTimeUnixNano":"${r.getLong(1)}","durationMs":${r.getLong(2)}}"""
    }
    s"""{"traces":[${entries.mkString(",")}]}"""
  }

  /** Tempo tag-values envelope (`/api/search/tag/{tag}/values`): the
    * distinct-values frame is already tiny (discovery caps apply
    * upstream); emits `{"tagValues":[…]}`. */
  def tempoTagValues(df: DataFrame): String = {
    val vals = df.orderBy(df.columns.map(col): _*).collect()
      .map(r => jstr(r.getString(0)))
    s"""{"tagValues":[${vals.mkString(",")}]}"""
  }

  /** Pyroscope profile-types envelope: one entry per type with its time
    * bounds, from the q147-shaped discovery frame
    * (profile_type, n_samples, min_ts, max_ts, n_services). */
  def profileTypes(df: DataFrame): String = {
    val rows = df.orderBy(col("profile_type")).collect().map { r =>
      s"""{"id":${jstr(r.getString(0))},"samples":${r.getLong(1)},""" +
        s""""minTime":${r.getLong(2) / 1000000L},"maxTime":${r.getLong(3) / 1000000L}}"""
    }
    s"""{"profileTypes":[${rows.mkString(",")}]}"""
  }

  /** shared Loki/Prometheus metadata envelope
    * (`{"status":"success","data":[…]}`) for label names / label values
    * — reference `LabelsResponse::success` (endpoints/logql.rs,
    * promql.rs). */
  def labelsResponse(values: Seq[String]): String =
    s"""{"status":"success","data":[${values.map(jstr).mkString(",")}]}"""

  /** Loki/Prometheus series envelope: `data` = one label-map object per
    * distinct series. The distinct-series frame is discovery-capped
    * upstream; shaping is distributed (to_json per row). */
  def seriesResponse(df: DataFrame, labelCols: Seq[String]): String = {
    val rows = df
      .select(to_json(map_from_arrays(
        array(labelCols.map(lit(_)): _*),
        array(labelCols.map(c => col(c).cast("string")): _*))).as("m"))
      .orderBy(col("m")).collect().map(_.getString(0))
    s"""{"status":"success","data":[${rows.mkString(",")}]}"""
  }

  /** JSON string literal with full escaping (quotes, backslashes AND
    * control characters) — public so every endpoint that interpolates
    * DATA-derived strings (span names, service names, …) routes through
    * it rather than raw string concat. */
  def jstr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** TraceQL-metrics matrix envelope (`/api/metrics/query_range`
    * response shape — the reference 501s the endpoint itself): series
    * keyed by the `by()` columns, values as [sec, "v"] pairs in time
    * order. Reuses the Prometheus matrix shaper — Tempo's response is
    * deliberately Prometheus-compatible. */
  def traceqlMetricsMatrix(df: DataFrame, byCols: Seq[String]): String =
    promMatrix(df, byCols)
}
