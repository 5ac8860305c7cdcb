package graft.sources

/** WARC container framing (ISO 28500 / WARC 1.0-1.1) — the on-disk
  * format of real web crawls (Common Crawl ships ~100 TB-scale WARC).
  * The reference repo's ingest stops at structured telemetry; the
  * web-corpus curation family here (q332-q340) starts from extracted
  * text — this closes the gap down to the CONTAINER layer, so a
  * training-data pipeline can start from crawl archives: parse record
  * framing, pick the `response` records, split the HTTP message, and
  * hand the entity body to the existing HTML extraction/boilerplate
  * chain.
  *
  * Public format only: a WARC file is a sequence of records, each
  *
  * {{{
  *   WARC/1.0<CRLF>
  *   Name: value<CRLF> ...           (named fields, blank-line terminated;
  *                                    continuation lines start with SP/HT)
  *   <CRLF>
  *   <Content-Length bytes of payload>
  *   <CRLF><CRLF>                    (record separator)
  * }}}
  *
  * Strictness contract (DecoderFuzzSpec law): ANY framing violation —
  * unknown version token, malformed header line, missing/invalid
  * Content-Length, truncated payload, absent record separator, trailing
  * garbage — rejects the whole file with None. Honest rejection, never
  * a crash, never a partial guess.
  */
object Warc {

  /** one WARC record: header names lowercased (they are
    * case-insensitive), payload as raw bytes. */
  final case class Record(version: String, headers: Map[String, String],
      payload: Array[Byte]) {
    def warcType: Option[String] = headers.get("warc-type")
    def targetUri: Option[String] = headers.get("warc-target-uri")
  }

  /** records per file are additionally capped: each record consumes at
    * least the minimal header block, so this only triggers on
    * pathological hand-crafted streams, not real archives. */
  val MaxRecords = 1 << 20

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  // ISO-8859-1: lossless byte→char for header lines (real header values
  // are ASCII; a stray high byte must not corrupt offsets)
  private def line(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  def parse(bytes: Array[Byte]): Option[Vector[Record]] = {
    val out = Vector.newBuilder[Record]
    var count = 0
    var i = 0
    if (bytes.isEmpty) return None
    while (i < bytes.length) {
      count += 1
      if (count > MaxRecords) return None
      // ---- version line ----
      val vEnd = indexOfCrlf(bytes, i)
      if (vEnd < 0) return None
      val version = line(bytes, i, vEnd)
      if (version != "WARC/1.0" && version != "WARC/1.1") return None
      i = vEnd + 2
      // ---- named fields to the blank line ----
      var headers = Vector.empty[(String, String)]
      var inHeaders = true
      while (inHeaders) {
        val hEnd = indexOfCrlf(bytes, i)
        if (hEnd < 0) return None
        if (hEnd == i) { inHeaders = false; i += 2 }
        else {
          val l = line(bytes, i, hEnd)
          if (l.charAt(0) == ' ' || l.charAt(0) == '\t') {
            // continuation line folds into the previous value
            if (headers.isEmpty) return None
            val (k, v) = headers.last
            headers = headers.init :+ (k -> (v + " " + l.trim))
          } else {
            val c = l.indexOf(':')
            if (c <= 0) return None
            headers :+= (l.substring(0, c).trim.toLowerCase ->
              l.substring(c + 1).trim)
          }
          i = hEnd + 2
        }
      }
      val hmap = headers.toMap
      // ---- mandatory Content-Length, exact payload, separator ----
      val len = hmap.get("content-length").flatMap(_.toIntOption) match {
        case Some(n) if n >= 0 => n
        case _ => return None
      }
      if (i.toLong + len + 4 > bytes.length) return None
      val payload = java.util.Arrays.copyOfRange(bytes, i, i + len)
      i += len
      if (!(bytes(i) == '\r' && bytes(i + 1) == '\n' &&
            bytes(i + 2) == '\r' && bytes(i + 3) == '\n')) return None
      i += 4
      out += Record(version, hmap, payload)
    }
    Some(out.result())
  }

  /** split an `application/http;msgtype=response` record payload into
    * (status code, lowercased headers, entity body). Same strictness:
    * a malformed status line or header block is None. The body is the
    * remainder — the WARC record's Content-Length already bounds it. */
  def httpResponse(payload: Array[Byte])
      : Option[(Int, Map[String, String], Array[Byte])] = {
    val sEnd = indexOfCrlf(payload, 0)
    if (sEnd < 0) return None
    val status = line(payload, 0, sEnd) match {
      case s if s.startsWith("HTTP/1.0 ") || s.startsWith("HTTP/1.1 ") =>
        s.substring(9).takeWhile(_ != ' ').toIntOption match {
          case Some(code) if code >= 100 && code <= 599 => code
          case _ => return None
        }
      case _ => return None
    }
    var i = sEnd + 2
    var headers = Vector.empty[(String, String)]
    while (true) {
      val hEnd = indexOfCrlf(payload, i)
      if (hEnd < 0) return None
      if (hEnd == i)
        return Some((status, headers.toMap,
          java.util.Arrays.copyOfRange(payload, i + 2, payload.length)))
      val l = line(payload, i, hEnd)
      val c = l.indexOf(':')
      if (c <= 0) return None
      headers :+= (l.substring(0, c).trim.toLowerCase ->
        l.substring(c + 1).trim)
      i = hEnd + 2
    }
    None // unreachable
  }

  /** decompressed entity cap: 64 MiB per response — a crafted tiny
    * gzip member must not be able to demand unbounded executor memory
    * (the zip-bomb guard; same posture as the image decoders'
    * cumulative-pixel bounds). */
  val MaxEntityBytes: Long = 1L << 26

  /** decode the entity body per `Content-Encoding` (RFC 9110 §8.4):
    * identity passes through, gzip inflates (Common Crawl stores
    * response entities gzip-encoded). Unknown codings, corrupt/
    * truncated gzip streams, and bodies inflating past
    * [[MaxEntityBytes]] are None — honest rejection, never a crash. */
  def decodedBody(headers: Map[String, String],
      body: Array[Byte]): Option[Array[Byte]] =
    headers.get("content-encoding").map(_.trim.toLowerCase) match {
      case None | Some("identity") => Some(body)
      case Some("gzip") =>
        try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(body))
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var total = 0L
          var n = in.read(buf)
          while (n > 0) {
            total += n
            if (total > MaxEntityBytes) return None
            out.write(buf, 0, n)
            n = in.read(buf)
          }
          Some(out.toByteArray)
        } catch { case _: java.io.IOException => None }
      case Some(_) => None
    }
}
