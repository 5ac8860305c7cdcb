package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** A real LISTENING HTTP shell over the param/dispatch layer — the
  * socket counterpart of [[Endpoints]], built on the JDK's bundled
  * `com.sun.net.httpserver` so it adds zero dependencies. The route
  * tree mirrors the reference's axum nesting (`src/router/src/lib.rs`:
  * Loki under `/loki`, Prometheus under `/prometheus`, Tempo search
  * under `/api`; `endpoints/{logql,promql,tempo}.rs` route tables) for
  * the read-path query endpoints; errors surface as the handler's
  * `HttpError` status with a JSON error body, unknown paths as 404.
  *
  * Scope: single-tenant local serving. The reference's auth, rate,
  * read-scope, and admin middleware layers are control-plane
  * infrastructure the driver keeps out of local scope — the QUERY
  * surface (param parsing → lowering → envelope serialization → bytes
  * on a socket) is what this closes. Spark is the execution engine
  * behind every handler, so requests execute on the cluster; the
  * listener itself is a thin adapter.
  *
  * Determinism: "now" is injected at construction, never a clock read.
  */
final class HttpShell(spark: SparkSession, dir: String, nowNs: Long) {

  private var server: HttpServer = _

  /** bind 127.0.0.1:port (0 = ephemeral) and start serving; returns the
    * bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // handlers run Spark jobs; serial dispatch is the honest local mode
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) { server.stop(0); server = null }

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val qs = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    val (status, body) =
      try route(path, qs) match {
        case Some(json) => (200, json)
        case None       => (404, errJson("not found: " + path))
      } catch {
        case e: Endpoints.HttpError => (e.status, errJson(e.message))
        case e: graft.promql.Ast.Unsupported => (422, errJson(e.getMessage))
        case e: graft.traceql.TraceQL.Unsupported => (400, errJson(e.getMessage))
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private val TagValues = "^/api/search/tag/([^/]+)/values$".r

  private def route(path: String, qs: String): Option[String] = path match {
    case "/health" => Some("""{"status":"ok"}""")
    // Loki (reference endpoints/logql.rs route table)
    case "/loki/api/v1/query_range" =>
      Some(Endpoints.lokiQueryRange(spark, dir, qs, nowNs))
    // Prometheus (reference endpoints/promql.rs route table)
    case "/prometheus/api/v1/query_range" =>
      Some(Endpoints.promQueryRange(spark, dir, qs))
    case "/prometheus/api/v1/query" =>
      Some(Endpoints.promInstantQuery(spark, dir, qs, nowNs / 1000000000L))
    // Tempo (reference endpoints/tempo.rs route table)
    case "/api/search" =>
      Some(Endpoints.tempoSearch(spark, dir, qs))
    case TagValues(tag) =>
      Some(Endpoints.tempoTagValues(spark, dir,
        java.net.URLDecoder.decode(tag, "UTF-8")))
    case _ => None
  }

  private def errJson(msg: String): String = {
    val sb = new StringBuilder("{\"status\":\"error\",\"error\":\"")
    msg.foreach {
      case '"'  => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb ++= "\"}"
    sb.toString
  }
}
