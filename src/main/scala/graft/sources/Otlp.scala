package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col

/** OTLP ingest decode — the protobuf wire format parsed directly, no
  * generated classes or codec dependencies (reference:
  * src/common/src/flight/conversion/conversion_logs.rs:30-110 row
  * mapping, conversion_metrics.rs gauge/sum mapping; the reference links
  * prost-generated opentelemetry-proto types, this decodes the same
  * public wire format by hand).
  *
  * Scale shape: decoding is a per-payload narrow flatMap — each request
  * body becomes its rows on the executor holding it, no shuffle, no
  * driver involvement. A malformed payload raises with an offset so bad
  * input fails at the boundary, not deep in a query.
  *
  * Wire format (public spec): a message is a sequence of
  * `tag(varint) value` pairs; tag = fieldNo << 3 | wireType with
  * wireType 0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32.
  * Unknown fields are skipped, as protobuf requires.
  */
object Otlp {

  /** one decoded OTLP log record, aligned with the gen-2 logs schema
    * (graft.schema.Schemas.logs). */
  final case class LogRow(
      timestamp: Long,
      observed_timestamp: Long,
      trace_id: String,
      span_id: String,
      trace_flags: Int,
      severity_text: String,
      severity_number: Int,
      service_name: String,
      body: String,
      resource_attributes: Map[String, String],
      scope_attributes: Map[String, String],
      log_attributes: Map[String, String],
      scope_name: String,
      scope_version: String)

  /** one decoded OTLP number data point (gauge or sum), aligned with
    * Schemas.metricCommon (+ sum temporality fields). */
  final case class MetricRow(
      timestamp: Long,
      start_timestamp: Long,
      service_name: String,
      metric_name: String,
      metric_description: String,
      metric_unit: String,
      resource_attributes: Map[String, String],
      scope_attributes: Map[String, String],
      attributes: Map[String, String],
      flags: Int,
      exemplars: String,
      value: Double,
      kind: String, // "gauge" | "sum"
      aggregation_temporality: Int,
      is_monotonic: Boolean)

  // ---- wire-level reader -------------------------------------------------

  /** cursor over one length-delimited slice of the payload. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"OTLP decode: $msg at offset $pos")

    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        if (pos >= end) fail("truncated varint")
        val b = buf(pos); pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      fail("varint exceeds 64 bits")
    }

    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    def readFixed64(): Long = {
      if (pos + 8 > end) fail("truncated fixed64")
      var out = 0L
      var i = 7
      while (i >= 0) { out = (out << 8) | (buf(pos + i) & 0xFFL); i -= 1 }
      pos += 8
      out
    }

    def readFixed32(): Int = {
      if (pos + 4 > end) fail("truncated fixed32")
      val out = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4
      out
    }

    /** a nested reader over the next length-delimited value. */
    def readSlice(): Reader = {
      val len = readVarint().toInt
      if (len < 0 || pos + len > end) fail(s"bad length $len")
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readString(): String = {
      val s = readSlice()
      new String(buf, s.pos, s.end - s.pos, "UTF-8")
    }

    def readBytesHex(): String = {
      val s = readSlice()
      val sb = new StringBuilder
      var i = s.pos
      while (i < s.end) { sb.append(f"${buf(i) & 0xFF}%02x"); i += 1 }
      sb.toString
    }

    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => readFixed64()
      case 2 => readSlice()
      case 5 => readFixed32()
      case w => fail(s"unsupported wire type $w")
    }
  }

  private def reader(bytes: Array[Byte]) = new Reader(bytes, 0, bytes.length)

  // ---- common OTLP messages ---------------------------------------------

  /** AnyValue → display string (string raw; others JSON-shaped), matching
    * the reference's extract_value flattening (conversion_common.rs). */
  private def anyValue(r: Reader): String = {
    var out = ""
    while (r.hasNext) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 2) => out = r.readString()
        case (2, 0) => out = if (r.readVarint() != 0) "true" else "false"
        case (3, 0) => out = r.readVarint().toString
        case (4, 1) => out = java.lang.Double.longBitsToDouble(r.readFixed64()).toString
        case (5, 2) => // ArrayValue { repeated AnyValue values = 1; }
          val a = r.readSlice()
          val items = Seq.newBuilder[String]
          while (a.hasNext) {
            val (af, aw) = a.readTag()
            if (af == 1 && aw == 2) items += jsonQuoteIfNeeded(anyValue(a.readSlice()))
            else a.skip(aw)
          }
          out = items.result().mkString("[", ",", "]")
        case (6, 2) => // KeyValueList { repeated KeyValue values = 1; }
          val kvs = keyValues(r.readSlice(), 1)
          out = kvs.map { case (k, v) => s"${jsonQuote(k)}:${jsonQuoteIfNeeded(v)}" }
            .mkString("{", ",", "}")
        case (7, 2) => out = r.readBytesHex()
        case _      => r.skip(w)
      }
    }
    out
  }

  private def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsonQuoteIfNeeded(s: String): String =
    if (s.nonEmpty && (s == "true" || s == "false" ||
        s.forall(c => c.isDigit || c == '-' || c == '.' || c == 'E' || c == 'e'))) s
    else jsonQuote(s)

  /** repeated KeyValue fields with the given field number → ordered map. */
  private def keyValues(r: Reader, fieldNo: Int): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      val (f, w) = r.readTag()
      if (f == fieldNo && w == 2) out += oneKeyValue(r.readSlice())
      else r.skip(w)
    }
    out.result()
  }

  /** one KeyValue element (a single occurrence of a repeated field). */
  private def oneKeyValue(one: Reader): (String, String) = {
    var k = ""
    var v = ""
    while (one.hasNext) {
      val (kf, kw) = one.readTag()
      (kf, kw) match {
        case (1, 2) => k = one.readString()
        case (2, 2) => v = anyValue(one.readSlice())
        case _      => one.skip(kw)
      }
    }
    (k, v)
  }

  // ---- logs --------------------------------------------------------------

  /** ExportLogsServiceRequest bytes → rows (conversion_logs.rs:49-105). */
  def decodeLogsRequest(bytes: Array[Byte]): Seq[LogRow] = {
    val out = Seq.newBuilder[LogRow]
    val req = reader(bytes)
    while (req.hasNext) {
      val (f, w) = req.readTag()
      if (f == 1 && w == 2) { // ResourceLogs
        val rl = req.readSlice()
        var resAttrs = Seq.empty[(String, String)]
        val scopeLogs = Seq.newBuilder[Reader]
        while (rl.hasNext) {
          val (rf, rw) = rl.readTag()
          (rf, rw) match {
            case (1, 2) => resAttrs = keyValues(rl.readSlice(), 1) // Resource.attributes
            case (2, 2) => scopeLogs += rl.readSlice()             // ScopeLogs
            case _      => rl.skip(rw)
          }
        }
        val resMap = resAttrs.toMap
        val serviceName = resMap.getOrElse("service.name", "")
        for (sl <- scopeLogs.result()) {
          var scopeName = ""
          var scopeVersion = ""
          var scopeAttrs = Map.empty[String, String]
          val records = Seq.newBuilder[Reader]
          while (sl.hasNext) {
            val (sf, sw) = sl.readTag()
            (sf, sw) match {
              case (1, 2) => // InstrumentationScope
                val sc = sl.readSlice()
                val sa = Map.newBuilder[String, String]
                while (sc.hasNext) {
                  val (cf, cw) = sc.readTag()
                  (cf, cw) match {
                    case (1, 2) => scopeName = sc.readString()
                    case (2, 2) => scopeVersion = sc.readString()
                    case (3, 2) => sa += oneKeyValue(sc.readSlice())
                    case _ => sc.skip(cw)
                  }
                }
                scopeAttrs = sa.result()
              case (2, 2) => records += sl.readSlice() // LogRecord
              case _      => sl.skip(sw)
            }
          }
          for (lr <- records.result()) {
            var ts = 0L; var obsTs = 0L
            var sevNo = 0; var sevText = ""
            var body = ""
            var attrs = Seq.empty[(String, String)]
            var flags = 0
            var traceId = ""; var spanId = ""
            while (lr.hasNext) {
              val (lf, lw) = lr.readTag()
              (lf, lw) match {
                case (1, 1)  => ts = lr.readFixed64()
                case (2, 0)  => sevNo = lr.readVarint().toInt
                case (3, 2)  => sevText = lr.readString()
                case (5, 2)  => body = anyValue(lr.readSlice())
                case (6, 2)  => attrs = attrs :+ oneKeyValue(lr.readSlice())
                case (8, 5)  => flags = lr.readFixed32()
                case (9, 2)  => traceId = lr.readBytesHex()
                case (10, 2) => spanId = lr.readBytesHex()
                case (11, 1) => obsTs = lr.readFixed64()
                case _       => lr.skip(lw)
              }
            }
            out += LogRow(ts, if (obsTs != 0) obsTs else ts, traceId, spanId,
              flags, sevText, sevNo, serviceName, body, resMap, scopeAttrs,
              attrs.toMap, scopeName, scopeVersion)
          }
        }
      } else req.skip(w)
    }
    out.result()
  }

  /** one decoded OTLP span, aligned with Schemas.traces (minus partition
    * cols; `timestamp` = start time for the hour layout). */
  final case class TraceRow(
      trace_id: String,
      span_id: String,
      parent_span_id: String,
      span_name: String,
      service_name: String,
      start_time_unix_nano: Long,
      end_time_unix_nano: Long,
      duration_nanos: Long,
      span_kind: String,
      status_code: String,
      status_message: String,
      is_root: Boolean,
      span_attributes: Map[String, String],
      resource_attributes: Map[String, String],
      scope_attributes: Map[String, String],
      events: String,
      links: String,
      trace_state: String,
      scope_name: String,
      scope_version: String,
      timestamp: Long)

  // ---- traces ------------------------------------------------------------

  /** ExportTraceServiceRequest bytes → span rows. Kind/status strings and
    * the saturating duration mirror the reference's conversion exactly
    * (conversion_traces.rs:140-174,260-275). */
  def decodeTracesRequest(bytes: Array[Byte]): Seq[TraceRow] = {
    val out = Seq.newBuilder[TraceRow]
    val req = reader(bytes)
    while (req.hasNext) {
      val (f, w) = req.readTag()
      if (f == 1 && w == 2) { // ResourceSpans
        val rs = req.readSlice()
        var resMap = Map.empty[String, String]
        val scopeSpans = Seq.newBuilder[Reader]
        while (rs.hasNext) {
          val (rf, rw) = rs.readTag()
          (rf, rw) match {
            case (1, 2) => resMap = keyValues(rs.readSlice(), 1).toMap
            case (2, 2) => scopeSpans += rs.readSlice()
            case _      => rs.skip(rw)
          }
        }
        val serviceName = resMap.getOrElse("service.name", "")
        for (ss <- scopeSpans.result()) {
          var scopeName = ""
          var scopeVersion = ""
          var scopeAttrs = Map.empty[String, String]
          val spans = Seq.newBuilder[Reader]
          while (ss.hasNext) {
            val (sf, sw) = ss.readTag()
            (sf, sw) match {
              case (1, 2) =>
                val sc = ss.readSlice()
                while (sc.hasNext) {
                  val (cf, cw) = sc.readTag()
                  (cf, cw) match {
                    case (1, 2) => scopeName = sc.readString()
                    case (2, 2) => scopeVersion = sc.readString()
                    case (3, 2) => scopeAttrs = scopeAttrs + oneKeyValue(sc.readSlice())
                    case _      => sc.skip(cw)
                  }
                }
              case (2, 2) => spans += ss.readSlice()
              case _      => ss.skip(sw)
            }
          }
          for (sp <- spans.result()) {
            var traceId = ""; var spanId = ""; var parentId = ""
            var traceState = ""; var name = ""
            var kind = 0
            var startNs = 0L; var endNs = 0L
            var attrs = Seq.empty[(String, String)]
            var statusCode = "Unspecified"; var statusMsg = ""
            val events = Seq.newBuilder[String]
            val links = Seq.newBuilder[String]
            while (sp.hasNext) {
              val (pf, pw) = sp.readTag()
              (pf, pw) match {
                case (1, 2)  => traceId = sp.readBytesHex()
                case (2, 2)  => spanId = sp.readBytesHex()
                case (3, 2)  => traceState = sp.readString()
                case (4, 2)  => parentId = sp.readBytesHex()
                case (5, 2)  => name = sp.readString()
                case (6, 0)  => kind = sp.readVarint().toInt
                case (7, 1)  => startNs = sp.readFixed64()
                case (8, 1)  => endNs = sp.readFixed64()
                case (9, 2)  => attrs = attrs :+ oneKeyValue(sp.readSlice())
                case (11, 2) => // Event { time=1 fixed64, name=2, attributes=3 }
                  val ev = sp.readSlice()
                  var eTime = 0L; var eName = ""
                  var eAttrs = Seq.empty[(String, String)]
                  while (ev.hasNext) {
                    val (ef, ew) = ev.readTag()
                    (ef, ew) match {
                      case (1, 1) => eTime = ev.readFixed64()
                      case (2, 2) => eName = ev.readString()
                      case (3, 2) => eAttrs = eAttrs :+ oneKeyValue(ev.readSlice())
                      case _      => ev.skip(ew)
                    }
                  }
                  events += s"""{"name":${jsonQuote(eName)},"time_unix_nano":$eTime,""" +
                    s""""attributes":${eAttrs.map { case (k, v) =>
                      s"${jsonQuote(k)}:${jsonQuoteIfNeeded(v)}" }.mkString("{", ",", "}")}}"""
                case (13, 2) => // Link { trace_id=1 bytes, span_id=2 bytes }
                  val lk = sp.readSlice()
                  var lTrace = ""; var lSpan = ""
                  while (lk.hasNext) {
                    val (lf, lw) = lk.readTag()
                    (lf, lw) match {
                      case (1, 2) => lTrace = lk.readBytesHex()
                      case (2, 2) => lSpan = lk.readBytesHex()
                      case _      => lk.skip(lw)
                    }
                  }
                  links += s"""{"trace_id":${jsonQuote(lTrace)},"span_id":${jsonQuote(lSpan)}}"""
                case (15, 2) => // Status { message=2, code=3 }
                  val st = sp.readSlice()
                  while (st.hasNext) {
                    val (tf, tw) = st.readTag()
                    (tf, tw) match {
                      case (2, 2) => statusMsg = st.readString()
                      case (3, 0) => statusCode = st.readVarint() match {
                        case 1 => "Ok"
                        case 2 => "Error"
                        case _ => "Unspecified"
                      }
                      case _ => st.skip(tw)
                    }
                  }
                case _ => sp.skip(pw)
              }
            }
            // kind string table as the reference writes it
            val kindStr = kind match {
              case 1 => "Server"
              case 2 => "Client"
              case 3 => "Producer"
              case 4 => "Consumer"
              case _ => "Internal"
            }
            out += TraceRow(traceId, spanId, parentId, name, serviceName,
              startNs, endNs, math.max(0L, endNs - startNs), kindStr,
              statusCode, statusMsg, parentId.isEmpty, attrs.toMap, resMap,
              scopeAttrs, events.result().mkString("[", ",", "]"),
              links.result().mkString("[", ",", "]"), traceState,
              scopeName, scopeVersion, startNs)
          }
        }
      } else req.skip(w)
    }
    out.result()
  }

  // ---- metrics -----------------------------------------------------------

  /** ExportMetricsServiceRequest bytes → gauge/sum data-point rows
    * (conversion_metrics.rs; histogram/exp-histogram/summary points ride
    * the same frame but are out of this decoder's subset). */
  def decodeMetricsRequest(bytes: Array[Byte]): Seq[MetricRow] = {
    val out = Seq.newBuilder[MetricRow]
    val req = reader(bytes)
    while (req.hasNext) {
      val (f, w) = req.readTag()
      if (f == 1 && w == 2) { // ResourceMetrics
        val rm = req.readSlice()
        var resMap = Map.empty[String, String]
        val scopeMetrics = Seq.newBuilder[Reader]
        while (rm.hasNext) {
          val (rf, rw) = rm.readTag()
          (rf, rw) match {
            case (1, 2) => resMap = keyValues(rm.readSlice(), 1).toMap
            case (2, 2) => scopeMetrics += rm.readSlice()
            case _      => rm.skip(rw)
          }
        }
        val serviceName = resMap.getOrElse("service.name", "")
        for (sm <- scopeMetrics.result()) {
          var scopeAttrs = Map.empty[String, String]
          val metrics = Seq.newBuilder[Reader]
          while (sm.hasNext) {
            val (sf, sw) = sm.readTag()
            (sf, sw) match {
              case (1, 2) =>
                val sc = sm.readSlice()
                while (sc.hasNext) {
                  val (cf, cw) = sc.readTag()
                  if (cf == 3 && cw == 2) scopeAttrs = scopeAttrs + oneKeyValue(sc.readSlice())
                  else sc.skip(cw)
                }
              case (2, 2) => metrics += sm.readSlice()
              case _      => sm.skip(sw)
            }
          }
          for (m <- metrics.result()) {
            var name = ""; var desc = ""; var unit = ""
            var kind = ""
            var temporality = 0
            var monotonic = false
            val points = Seq.newBuilder[Reader]
            while (m.hasNext) {
              val (mf, mw) = m.readTag()
              (mf, mw) match {
                case (1, 2) => name = m.readString()
                case (2, 2) => desc = m.readString()
                case (3, 2) => unit = m.readString()
                case (5, 2) => // Gauge { data_points = 1 }
                  kind = "gauge"
                  val g = m.readSlice()
                  while (g.hasNext) {
                    val (gf, gw) = g.readTag()
                    if (gf == 1 && gw == 2) points += g.readSlice() else g.skip(gw)
                  }
                case (7, 2) => // Sum { data_points = 1; temporality = 2; monotonic = 3 }
                  kind = "sum"
                  val su = m.readSlice()
                  while (su.hasNext) {
                    val (uf, uw) = su.readTag()
                    (uf, uw) match {
                      case (1, 2) => points += su.readSlice()
                      case (2, 0) => temporality = su.readVarint().toInt
                      case (3, 0) => monotonic = su.readVarint() != 0
                      case _      => su.skip(uw)
                    }
                  }
                case _ => m.skip(mw)
              }
            }
            for (p <- points.result()) {
              var startTs = 0L; var ts = 0L
              var value = 0.0
              var flags = 0
              var attrs = Seq.empty[(String, String)]
              while (p.hasNext) {
                val (pf, pw) = p.readTag()
                (pf, pw) match {
                  case (2, 1) => startTs = p.readFixed64()
                  case (3, 1) => ts = p.readFixed64()
                  case (4, 1) => value = java.lang.Double.longBitsToDouble(p.readFixed64())
                  case (6, 1) => value = p.readFixed64().toDouble // sfixed64 as_int
                  case (7, 2) => attrs = attrs :+ oneKeyValue(p.readSlice())
                  case (8, 0) => flags = p.readVarint().toInt
                  case _      => p.skip(pw)
                }
              }
              out += MetricRow(ts, if (startTs != 0) startTs else ts, serviceName,
                name, desc, unit, resMap, scopeAttrs, attrs.toMap, flags, "[]",
                value, kind, temporality, monotonic)
            }
          }
        }
      } else req.skip(w)
    }
    out.result()
  }

  // ---- Spark integration -------------------------------------------------

  /** payloads (binary `payload` column, one OTLP logs request per row) →
    * gen-2 logs rows. Per-payload narrow flatMap — scales with the input,
    * no shuffle, no driver decode. */
  def logs(payloads: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[LogRow]
    payloads.select(col("payload")).as(Encoders.BINARY)
      .flatMap(decodeLogsRequest _)
      .toDF()
  }

  /** payloads (one OTLP trace request per row) → span rows. */
  def traces(payloads: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[TraceRow]
    payloads.select(col("payload")).as(Encoders.BINARY)
      .flatMap(decodeTracesRequest _)
      .toDF()
  }

  /** payloads → (gauge rows, sum rows) in the Schemas.metric* shapes. */
  def metrics(payloads: DataFrame): (DataFrame, DataFrame) = {
    implicit val enc = Encoders.product[MetricRow]
    val all = payloads.select(col("payload")).as(Encoders.BINARY)
      .flatMap(decodeMetricsRequest _)
      .toDF()
    val gauge = all.filter(col("kind") === "gauge")
      .drop("kind", "aggregation_temporality", "is_monotonic")
    val sum = all.filter(col("kind") === "sum").drop("kind")
    (gauge, sum)
  }
}
