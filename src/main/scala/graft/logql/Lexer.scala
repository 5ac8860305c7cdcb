package graft.logql

/** Hand-written LogQL/PromQL tokenizer (reference: src/logql/src/lexer.rs —
  * ours is a fresh compact Scala scanner, same token surface).
  */
object Lexer {

  sealed trait Tok { def pos: Int }
  final case class TIdent(s: String, pos: Int) extends Tok
  final case class TStr(s: String, pos: Int) extends Tok
  final case class TNum(v: Double, pos: Int) extends Tok
  final case class TDur(seconds: Long, pos: Int) extends Tok
  /** sub-second duration literal (ms/us/ns) — kept separate so whole-
    * second range windows stay a plain Long of seconds. */
  final case class TDurNs(nanos: Long, pos: Int) extends Tok
  final case class TOp(s: String, pos: Int) extends Tok // punctuation / operators
  final case class TEof(pos: Int) extends Tok

  private val multiOps = List("|=", "|~", "|>", "!=", "!~", "!>", "=~", ">=", "<=", "==")
  private val singleOps = "{}(),[]|=<>+-*/%^@:".toSet

  def tokenize(in: String): Vector[Tok] = tokenize(in, colonIdents = false)

  /** `colonIdents`: PromQL metric identifiers may contain ':' (recording
    * rule names, `[a-zA-Z_:][a-zA-Z0-9_:]*`); LogQL labels may not — the
    * PromQL parser opts in, everything else keeps ':' as punctuation.
    * Subquery `[5m:1m]` is unaffected either way: there the ':' follows a
    * duration token, never an identifier run. */
  def tokenize(in: String, colonIdents: Boolean): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length

    // nanos-per-unit of the duration unit at in(i), advancing past it;
    // -1 when in(i) does not start a unit. A unit must not be followed by
    // a letter ("5min" is a number and an identifier, not 5 minutes) —
    // a DIGIT after is fine: that is the next compound component (1h30m).
    def unitNanos(): Long = {
      // end-of-input is "no unit here", not an index error — a compound
      // duration ending in bare digits ("1h30") must raise ParseError
      if (i >= n) return -1L
      val two = if (i + 1 < n) in.substring(i, i + 2) else ""
      // sub-second units FIRST — "20ms" must not lex as 20 minutes + "s"
      if (Set("ms", "us", "ns").contains(two) &&
          (i + 2 >= n || !in(i + 2).isLetter)) {
        val mult = two match {
          case "ms" => 1000000L; case "us" => 1000L; case "ns" => 1L
        }
        i += 2
        mult
      } else if ("smhdwy".contains(in(i)) &&
          (i + 1 >= n || !in(i + 1).isLetter)) {
        val mult = in(i) match {
          case 's' => 1L; case 'm' => 60L; case 'h' => 3600L
          case 'd' => 86400L; case 'w' => 604800L; case 'y' => 31536000L
        }
        i += 1
        mult * 1000000000L
      } else -1L
    }

    // does a duration unit start at the current position? (peek only)
    def unitPeek(): Boolean = {
      val save = i
      val r = i < n && unitNanos() >= 0
      i = save
      r
    }

    while (i < n) {
      val c = in(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') {
        // comment to end of line (PromQL/LogQL `# …`; '#' inside string
        // literals is safe — strings are consumed as whole tokens)
        while (i < n && in(i) != '\n') i += 1
      } else if (c == '"' || c == '\'') {
        val quote = c
        val start = i
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          in(i) match {
            case '\\' if i + 1 < n =>
              in(i + 1) match {
                case '"'  => sb += '"'
                case '\'' => sb += '\''
                case '\\' => sb += '\\'
                case 'n'  => sb += '\n'
                case 't'  => sb += '\t'
                case 'r'  => sb += '\r'
                case o    => sb += '\\'; sb += o
              }
              i += 2
            case q if q == quote => closed = true; i += 1
            case o => sb += o; i += 1
          }
        }
        if (!closed) throw Ast.ParseError("unterminated string", start)
        out += TStr(sb.toString, start)
      } else if (c == '`') {
        // Go-style raw string (reference lexer.rs backtick literals):
        // NO escape processing — `mysql-\d+` keeps its backslash verbatim
        val start = i
        i += 1
        val end = in.indexOf('`', i)
        if (end < 0) throw Ast.ParseError("unterminated raw string", start)
        out += TStr(in.substring(i, end), start)
        i = end + 1
      } else if (c == '0' && i + 1 < n && (in(i + 1) == 'x' || in(i + 1) == 'X')) {
        // hex literal (PromQL number grammar)
        val start = i
        i += 2
        val hs = i
        while (i < n && (in(i).isDigit || ('a' to 'f').contains(in(i).toLower))) i += 1
        if (i == hs) throw Ast.ParseError("malformed hex literal", start)
        out += TNum(java.lang.Long.parseLong(in.substring(hs, i), 16).toDouble, start)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (in(i).isDigit || in(i) == '.')) i += 1
        val numStr = in.substring(start, i)
        // scientific notation: [eE][+-]?digits — only when the exponent
        // actually follows, else "1exp" stays TNum(1) + TIdent("exp")
        val sciEnd = {
          var j = i
          if (j < n && (in(j) == 'e' || in(j) == 'E')) {
            j += 1
            if (j < n && (in(j) == '+' || in(j) == '-')) j += 1
            if (j < n && in(j).isDigit) {
              while (j < n && in(j).isDigit) j += 1
              j
            } else -1
          } else -1
        }
        if (sciEnd > 0) {
          out += TNum(in.substring(start, sciEnd).toDouble, start)
          i = sciEnd
        } else if (!numStr.contains('.') && i < n && unitPeek()) {
          // duration literal, possibly COMPOUND (1h30m, 1m30s, 1s500ms):
          // accumulate component nanos; whole seconds → TDur else TDurNs
          var totalNs = 0L
          var compNum = numStr.toLong
          var done = false
          while (!done) {
            val u = unitNanos()
            if (u < 0) throw Ast.ParseError("malformed duration", start)
            totalNs += compNum * u
            if (i < n && in(i).isDigit) {
              val cs = i
              while (i < n && in(i).isDigit) i += 1
              compNum = in.substring(cs, i).toLong
            } else done = true
          }
          if (totalNs % 1000000000L == 0L) out += TDur(totalNs / 1000000000L, start)
          else out += TDurNs(totalNs, start)
        } else out += TNum(numStr.toDouble, start)
      } else if (c.isLetter || c == '_' ||
          (colonIdents && c == ':' && i + 1 < n &&
            (in(i + 1).isLetter || in(i + 1) == '_'))) {
        // a ':' joins an identifier only when followed by an identifier
        // character — `[5m:1m]`'s colon follows a duration and precedes a
        // digit, so it stays punctuation even with colonIdents on
        val start = i
        var go = true
        while (go && i < n) {
          val ch = in(i)
          if (ch.isLetterOrDigit || ch == '_') i += 1
          else if (colonIdents && ch == ':' && i + 1 < n &&
              (in(i + 1).isLetterOrDigit || in(i + 1) == '_')) i += 1
          else go = false
        }
        out += TIdent(in.substring(start, i), start)
      } else {
        val two = if (i + 1 < n) in.substring(i, i + 2) else ""
        if (multiOps.contains(two)) { out += TOp(two, i); i += 2 }
        else if (singleOps.contains(c)) { out += TOp(c.toString, i); i += 1 }
        else throw Ast.ParseError(s"unexpected character '$c'", i)
      }
    }
    out += TEof(n)
    out.result()
  }
}
