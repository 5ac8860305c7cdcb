package graft.multimodal

/** ======= REAL ======= PDF text extraction, zero codec deps: the
  * ISO 32000-1 (public, ex-Adobe PDF 1.7) document walk a training-data
  * pipeline needs to turn crawled PDFs into text — header check,
  * `startxref` → classic cross-reference table → trailer `/Root`,
  * catalog → page tree → per-page `/Contents`, stream payloads with
  * direct or indirect `/Length` and optional `/Filter /FlateDecode`
  * (java.util.zip.Inflater — same zip-bomb cap discipline as the WARC
  * gzip path), then a content-stream token walk that collects the text
  * strings shown by the `Tj`, `'` and `TJ` operators in order.
  *
  * The object layer is a real recursive-descent parser over PDF's
  * eight object types (§7.3): literal strings with nesting, the full
  * escape set (\n \r \t \b \f \( \) \\ \ooo, line continuations), hex
  * strings, names, numbers, booleans, null, arrays, dictionaries, and
  * `n g R` indirect references (resolved through the xref map).
  *
  * Honesty rules match the other decoders: xref streams (PDF 1.5
  * cross-reference STREAMS, §7.5.8), encryption, and filters other
  * than FlateDecode are rejected with None — never a guess; caps bound
  * every loop (object count, recursion depth, inflate output) so a
  * crafted payload cannot demand unbounded work.
  *
  * Reference parity: the reference ships no document decode at all
  * (crawl payloads are opaque bytes there); this extends the WARC→HTML
  * curation chain (q346-q349) with the other dominant crawl document
  * format.
  */
object Pdf {

  /** extraction result: pages walked, text-showing operators seen, and
    * the shown strings concatenated in content order. */
  final case class PdfText(nPages: Int, nTextOps: Int, text: String)

  private val MaxObjects = 4096
  private val MaxDepth = 32
  private val MaxInflate = 1 << 24 // 16 MiB decoded cap per stream

  // ---- object model ------------------------------------------------------

  private sealed trait PVal
  private case class PNum(v: Double) extends PVal
  private case class PName(v: String) extends PVal
  private case class PStr(v: String) extends PVal
  private case class PArr(v: Vector[PVal]) extends PVal
  private case class PDict(v: Map[String, PVal]) extends PVal
  private case class PRef(num: Int) extends PVal
  private case class PBool(v: Boolean) extends PVal
  private case object PNull extends PVal

  private final class Bail extends RuntimeException

  /** cursor + lexer over the raw bytes (PDF is a binary format with an
    * ASCII skeleton; strings decode as Latin-1). */
  private final class Lexer(val bytes: Array[Byte]) {
    var pos = 0
    def bail(): Nothing = throw new Bail
    def byteAt(i: Int): Int =
      if (i >= 0 && i < bytes.length) bytes(i) & 0xFF else -1
    def isWs(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    def isDelim(c: Int): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      var going = true
      while (going) {
        val c = byteAt(pos)
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to end of line
          while (pos < bytes.length && byteAt(pos) != '\n' &&
                 byteAt(pos) != '\r') pos += 1
        } else going = false
      }
    }
    /** a regular token (number / keyword); empty at delimiters. */
    def readRaw(): String = {
      skipWs()
      val b = new StringBuilder
      var c = byteAt(pos)
      while (c >= 0 && !isWs(c) && !isDelim(c)) {
        b.append(c.toChar); pos += 1; c = byteAt(pos)
      }
      b.result()
    }
    def peekRaw(): String = { val p = pos; val t = readRaw(); pos = p; t }

    /** literal string after the opening '(' — nesting + escapes
      * (§7.3.4.2). */
    def readLiteralString(): String = {
      val b = new StringBuilder
      var depth = 1
      while (depth > 0) {
        val c = byteAt(pos)
        if (c < 0) bail()
        pos += 1
        c match {
          case '(' => depth += 1; b.append('(')
          case ')' => depth -= 1; if (depth > 0) b.append(')')
          case '\\' =>
            val e = byteAt(pos)
            if (e < 0) bail()
            pos += 1
            e match {
              case 'n' => b.append('\n')
              case 'r' => b.append('\r')
              case 't' => b.append('\t')
              case 'b' => b.append('\b')
              case 'f' => b.append('\f')
              case '(' => b.append('(')
              case ')' => b.append(')')
              case '\\' => b.append('\\')
              case '\r' => if (byteAt(pos) == '\n') pos += 1 // continuation
              case '\n' => // continuation: no output
              case d if d >= '0' && d <= '7' => // 1-3 octal digits
                var v = d - '0'
                var k = 0
                while (k < 2 && byteAt(pos) >= '0' && byteAt(pos) <= '7') {
                  v = v * 8 + (byteAt(pos) - '0'); pos += 1; k += 1
                }
                b.append((v & 0xFF).toChar)
              case other => b.append(other.toChar) // spec: drop the backslash
            }
          case other => b.append(other.toChar)
        }
        if (b.length > MaxInflate) bail()
      }
      b.result()
    }

    /** hex string after the opening '<' (§7.3.4.3). */
    def readHexString(): String = {
      val b = new StringBuilder
      var hi = -1
      var going = true
      while (going) {
        val c = byteAt(pos)
        if (c < 0) bail()
        pos += 1
        if (c == '>') going = false
        else if (!isWs(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) bail()
          if (hi < 0) hi = d
          else { b.append(((hi << 4) | d).toChar); hi = -1 }
        }
        if (b.length > MaxInflate) bail()
      }
      if (hi >= 0) b.append((hi << 4).toChar) // odd count: pad with 0
      b.result()
    }

    def readName(): String = {
      val b = new StringBuilder
      var c = byteAt(pos)
      while (c >= 0 && !isWs(c) && !isDelim(c)) {
        if (c == '#') { // #xx hex escape in names (§7.3.5)
          val v = (Character.digit(byteAt(pos + 1), 16) << 4) |
            Character.digit(byteAt(pos + 2), 16)
          if (v < 0) bail()
          b.append(v.toChar); pos += 3
        } else { b.append(c.toChar); pos += 1 }
        c = byteAt(pos)
      }
      b.result()
    }
  }

  /** parse one object value at the lexer position (§7.3). */
  private def parseValue(lx: Lexer, depth: Int): PVal = {
    if (depth > MaxDepth) lx.bail()
    lx.skipWs()
    val c = lx.byteAt(lx.pos)
    c match {
      case '(' => lx.pos += 1; PStr(lx.readLiteralString())
      case '/' => lx.pos += 1; PName(lx.readName())
      case '[' =>
        lx.pos += 1
        val items = Vector.newBuilder[PVal]
        var n = 0
        while ({ lx.skipWs(); lx.byteAt(lx.pos) != ']' }) {
          if (lx.byteAt(lx.pos) < 0 || n > MaxObjects) lx.bail()
          items += parseValue(lx, depth + 1); n += 1
        }
        lx.pos += 1
        PArr(items.result())
      case '<' =>
        if (lx.byteAt(lx.pos + 1) == '<') {
          lx.pos += 2
          var m = Map.empty[String, PVal]
          var n = 0
          while ({ lx.skipWs()
                   !(lx.byteAt(lx.pos) == '>' && lx.byteAt(lx.pos + 1) == '>') }) {
            if (lx.byteAt(lx.pos) != '/' || n > MaxObjects) lx.bail()
            lx.pos += 1
            val k = lx.readName()
            m += (k -> parseValue(lx, depth + 1)); n += 1
          }
          lx.pos += 2
          PDict(m)
        } else { lx.pos += 1; PStr(lx.readHexString()) }
      case d if (d >= '0' && d <= '9') || d == '+' || d == '-' || d == '.' =>
        val t = lx.readRaw()
        val v = try t.toDouble catch { case _: NumberFormatException => lx.bail() }
        // `n g R` indirect reference lookahead
        if (v >= 0 && v == v.floor) {
          val save = lx.pos
          val g = lx.readRaw()
          if (g.nonEmpty && g.forall(_.isDigit)) {
            val save2 = lx.pos
            val r = lx.readRaw()
            if (r == "R") return PRef(v.toInt)
            lx.pos = save2
          }
          lx.pos = save
        }
        PNum(v)
      case _ =>
        lx.readRaw() match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case _ => lx.bail()
        }
    }
  }

  // ---- document walk -----------------------------------------------------

  /** bounded decimal parse — digit strings are UNTRUSTED, a 30-digit
    * offset must bail, not throw NumberFormatException. */
  private def toIntSafe(s: String, lx: Lexer): Int = {
    if (s.isEmpty || !s.forall(_.isDigit)) lx.bail()
    val t = s.dropWhile(_ == '0') // xref offsets are zero-padded to 10
    if (t.isEmpty) 0 else if (t.length <= 9) t.toInt else lx.bail()
  }

  /** objNum → byte offset from the classic xref table(s); follows
    * `/Prev` chains (bounded). Xref STREAMS (§7.5.8) → bail. */
  private def readXref(lx: Lexer, at: Int, seen: Set[Int],
      acc: Map[Int, Int]): Map[Int, Int] = {
    if (seen.contains(at) || seen.size > 16) lx.bail()
    lx.pos = at
    if (lx.readRaw() != "xref") lx.bail() // an int here = xref stream obj
    var table = acc
    var going = true
    while (going) {
      lx.skipWs()
      val t = lx.peekRaw()
      if (t == "trailer") { lx.readRaw(); going = false }
      else {
        val start = lx.readRaw(); val count = lx.readRaw()
        if (!start.forall(_.isDigit) || !count.forall(_.isDigit)) lx.bail()
        val s = toIntSafe(start, lx); val n = toIntSafe(count, lx)
        if (n > MaxObjects) lx.bail()
        for (k <- 0 until n) {
          lx.skipWs()
          val off = lx.readRaw(); val gen = lx.readRaw(); val typ = lx.readRaw()
          if (off.length != 10 || gen.length != 5 || typ.length != 1) lx.bail()
          // earlier tables in the Prev chain never override later ones
          if (typ == "n" && !table.contains(s + k))
            table += (s + k) -> toIntSafe(off, lx)
        }
      }
    }
    parseValue(lx, 0) match {
      case PDict(tr) =>
        tr.get("Prev") match {
          case Some(PNum(p)) => readXref(lx, p.toInt, seen + at, table)
          case _ =>
            tr.get("Root") match {
              case Some(PRef(r)) => table + (-1 -> r) // smuggle the root num
              case _ => lx.bail()
            }
        }
      case _ => lx.bail()
    }
  }

  /** parse indirect object `n g obj … endobj` at its xref offset;
    * returns (value, streamDataOffset or -1). */
  private def objectAt(lx: Lexer, xref: Map[Int, Int],
      num: Int): (PVal, Int) = {
    val off = xref.getOrElse(num, lx.bail())
    lx.pos = off
    val n = lx.readRaw(); val g = lx.readRaw(); val kw = lx.readRaw()
    if (toIntSafe(n, lx) != num || !g.forall(_.isDigit) ||
        kw != "obj") lx.bail()
    val v = parseValue(lx, 0)
    lx.skipWs()
    if (lx.peekRaw() == "stream") {
      lx.readRaw()
      // EOL after `stream` is CRLF or LF (§7.3.8.1)
      if (lx.byteAt(lx.pos) == '\r') lx.pos += 1
      if (lx.byteAt(lx.pos) == '\n') lx.pos += 1
      (v, lx.pos)
    } else (v, -1)
  }

  private def intOf(v: PVal, lx: Lexer, xref: Map[Int, Int]): Int = v match {
    case PNum(d) => d.toInt
    case PRef(r) => // indirect /Length: the target must be a number
      objectAt(lx, xref, r)._1 match {
        case PNum(d) => d.toInt
        case _ => lx.bail()
      }
    case _ => lx.bail()
  }

  /** decoded bytes of a stream object (identity or FlateDecode). */
  private def streamBytes(lx: Lexer, xref: Map[Int, Int],
      num: Int): Array[Byte] = {
    val (v, dataAt) = objectAt(lx, xref, num)
    val dict = v match { case PDict(m) => m; case _ => lx.bail() }
    if (dataAt < 0) lx.bail()
    val len = intOf(dict.getOrElse("Length", lx.bail()), lx, xref)
    if (len < 0 || dataAt + len > lx.bytes.length) lx.bail()
    val raw = java.util.Arrays.copyOfRange(lx.bytes, dataAt, dataAt + len)
    dict.get("Filter") match {
      case None => raw
      case Some(PName("FlateDecode")) => inflate(raw, lx)
      case Some(PArr(Vector(PName("FlateDecode")))) => inflate(raw, lx)
      case _ => lx.bail() // DCT/LZW/ASCII85/crypt filters: out of scope
    }
  }

  private def inflate(raw: Array[Byte], lx: Lexer): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(math.min(raw.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = try inf.inflate(buf)
        catch { case _: java.util.zip.DataFormatException => lx.bail() }
        if (n == 0 && inf.needsInput()) lx.bail() // truncated deflate
        out.write(buf, 0, n)
        if (out.size() > MaxInflate) lx.bail() // zip-bomb cap
      }
      out.toByteArray
    } finally inf.end()
  }

  /** the text strings a content stream SHOWS, in order: `(s) Tj`,
    * `(s) '`, and every string inside `[…] TJ` (kern numbers skipped);
    * other operators just clear the operand stack (§9.4.3). */
  private def contentText(content: Array[Byte], into: StringBuilder,
      lx0: Lexer): Int = {
    val lx = new Lexer(content)
    var operands = List.empty[PVal]
    var ops = 0
    var guard = 0
    while ({ lx.skipWs(); lx.pos < content.length }) {
      guard += 1
      if (guard > 1000000) lx0.bail()
      val c = lx.byteAt(lx.pos)
      if (c == '(' || c == '/' || c == '[' || c == '<' ||
          (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
        operands ::= (try parseValue(lx, 0) catch { case _: Bail => lx0.bail() })
      } else {
        val op = lx.readRaw()
        if (op.isEmpty) lx0.bail() // stray delimiter ( } { ) etc.
        op match {
          case "Tj" | "'" =>
            operands.headOption match {
              case Some(PStr(s)) => into.append(s); ops += 1
              case _ => lx0.bail()
            }
          case "\"" => // a w c (s) " — string is the top operand
            operands.headOption match {
              case Some(PStr(s)) => into.append(s); ops += 1
              case _ => lx0.bail()
            }
          case "TJ" =>
            operands.headOption match {
              case Some(PArr(items)) =>
                items.foreach { case PStr(s) => into.append(s); case _ => }
                ops += 1
              case _ => lx0.bail()
            }
          case _ => // positioning/state ops: consume silently
        }
        operands = Nil
      }
    }
    ops
  }

  /** extract the document text: None for anything the walk can't prove
    * out (bad xref, encryption, non-Flate filters, xref streams,
    * malformed objects) — never a guess. */
  def extractText(bytes: Array[Byte]): Option[PdfText] = {
    val lx = new Lexer(bytes)
    try {
      if (bytes.length < 16 ||
          !new String(bytes, 0, 5, "ISO-8859-1").startsWith("%PDF-"))
        return None
      // locate startxref from the tail
      val tail = new String(bytes,
        math.max(0, bytes.length - 256),
        math.min(256, bytes.length), "ISO-8859-1")
      val sx = tail.lastIndexOf("startxref")
      if (sx < 0) return None
      lx.pos = math.max(0, bytes.length - 256) + sx + "startxref".length
      val xrefAt = lx.readRaw()
      if (!xrefAt.forall(_.isDigit) || xrefAt.isEmpty) return None
      val xref = readXref(lx, toIntSafe(xrefAt, lx), Set.empty, Map.empty)
      val rootNum = xref.getOrElse(-1, lx.bail())
      val catalog = objectAt(lx, xref, rootNum)._1 match {
        case PDict(m) => m; case _ => lx.bail()
      }
      if (catalog.contains("Encrypt")) return None
      val pagesRef = catalog.get("Pages") match {
        case Some(PRef(r)) => r; case _ => lx.bail()
      }
      // walk the page tree (Kids may nest; bounded)
      val pageNums = Vector.newBuilder[Int]
      def walk(num: Int, depth: Int): Unit = {
        if (depth > MaxDepth) lx.bail()
        objectAt(lx, xref, num)._1 match {
          case PDict(m) => m.get("Type") match {
            case Some(PName("Pages")) => m.get("Kids") match {
              case Some(PArr(kids)) =>
                if (kids.size > MaxObjects) lx.bail()
                kids.foreach {
                  case PRef(k) => walk(k, depth + 1)
                  case _ => lx.bail()
                }
              case _ => lx.bail()
            }
            case Some(PName("Page")) => pageNums += num
            case _ => lx.bail()
          }
          case _ => lx.bail()
        }
      }
      walk(pagesRef, 0)
      val pages = pageNums.result()
      val text = new StringBuilder
      var ops = 0
      pages.foreach { p =>
        val dict = objectAt(lx, xref, p)._1 match {
          case PDict(m) => m; case _ => lx.bail()
        }
        dict.get("Contents") match {
          case Some(PRef(cs)) =>
            ops += contentText(streamBytes(lx, xref, cs), text, lx)
          case Some(PArr(parts)) => // content split across stream objects
            parts.foreach {
              case PRef(cs) =>
                ops += contentText(streamBytes(lx, xref, cs), text, lx)
              case _ => lx.bail()
            }
          case None => // an empty page is legal
          case _ => lx.bail()
        }
      }
      Some(PdfText(pages.size, ops, text.result()))
    } catch {
      case _: Bail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: StackOverflowError => None
    }
  }

  // ---- synthesis (fixtures + the q352 in-plan corpus) --------------------

  /** build a real single- or multi-page PDF: one page per outer Seq,
    * whose chunks alternate `Tj` and `[…] TJ` show ops (with kerning
    * numbers between TJ strings, so extraction must skip them); literal
    * strings carry the full escape discipline. `flate` compresses the
    * content streams with FlateDecode. */
  def synthetic(pages: Seq[Seq[String]], flate: Boolean): Array[Byte] = {
    def esc(s: String): String =
      s.flatMap {
        case '(' => "\\("
        case ')' => "\\)"
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      }
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def beginObj(n: Int): Unit = { offsets += out.size(); w(s"$n 0 obj\n") }
    w("%PDF-1.4\n")
    val nPages = pages.size
    // object numbering: 1 catalog, 2 pages, then per page i (0-based):
    // 3+2i page, 4+2i content stream; last object = font (shared)
    val fontNum = 3 + 2 * nPages
    beginObj(1)
    w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w(s"<< /Type /Pages /Count $nPages /Kids [" +
      (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ") +
      "] >>\nendobj\n")
    pages.zipWithIndex.foreach { case (chunks, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> " +
        s"/Contents $contNum 0 R >>\nendobj\n")
      val body = new StringBuilder
      body.append("BT /F1 12 Tf 72 720 Td\n")
      chunks.zipWithIndex.foreach { case (chunk, k) =>
        if (k % 2 == 0) body.append(s"(${esc(chunk)}) Tj\n")
        else {
          // split the chunk into a kerned TJ array
          val mid = chunk.length / 2
          body.append(s"[(${esc(chunk.take(mid))}) -120 " +
            s"(${esc(chunk.drop(mid))})] TJ\n")
        }
        body.append("0 -14 Td\n")
      }
      body.append("ET\n")
      val plain = body.result().getBytes("ISO-8859-1")
      val data = if (flate) {
        val d = new java.util.zip.Deflater()
        d.setInput(plain); d.finish()
        val bb = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) bb.write(buf, 0, d.deflate(buf))
        d.end()
        bb.toByteArray
      } else plain
      beginObj(contNum)
      w(s"<< /Length ${data.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontNum)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefAt = out.size()
    val n = offsets.size + 1
    w(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }
}
