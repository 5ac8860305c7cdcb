package graft.logql

/** Hand-written LogQL tokenizer (reference: src/logql/src/lexer.rs — ours is
  * a fresh compact Scala scanner, same token surface).
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

  def tokenize(in: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val start = i
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          in(i) match {
            case '\\' if i + 1 < n =>
              in(i + 1) match {
                case '"'  => sb += '"'
                case '\\' => sb += '\\'
                case 'n'  => sb += '\n'
                case 't'  => sb += '\t'
                case 'r'  => sb += '\r'
                case o    => sb += '\\'; sb += o
              }
              i += 2
            case '"' => closed = true; i += 1
            case o   => sb += o; i += 1
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
      } else if (c.isDigit) {
        val start = i
        while (i < n && (in(i).isDigit || in(i) == '.')) i += 1
        val numStr = in.substring(start, i)
        // sub-second duration suffix FIRST — "20ms" must not lex as
        // 20 minutes + ident "s" (ms/us/ns, integer-valued)
        val two = if (i + 1 < n) in.substring(i, i + 2) else ""
        if (!numStr.contains('.') && Set("ms", "us", "ns").contains(two)) {
          val mult = two match {
            case "ms" => 1000000L; case "us" => 1000L; case "ns" => 1L
          }
          out += TDurNs(numStr.toLong * mult, start)
          i += 2
        // duration suffix? (only integers: 5m; compound 1h30m not supported)
        } else if (i < n && "smhdw".contains(in(i)) && !numStr.contains('.')) {
          val unit = in(i); i += 1
          val mult = unit match {
            case 's' => 1L; case 'm' => 60L; case 'h' => 3600L
            case 'd' => 86400L; case 'w' => 604800L
          }
          out += TDur(numStr.toLong * mult, start)
        } else out += TNum(numStr.toDouble, start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (in(i).isLetterOrDigit || in(i) == '_')) i += 1
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
