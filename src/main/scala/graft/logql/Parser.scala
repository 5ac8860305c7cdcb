package graft.logql

import Ast._
import Lexer._

/** Recursive-descent LogQL parser (reference grammar:
  * src/logql/src/parser.rs — fresh implementation, same language subset).
  *
  * Grammar:
  * {{{
  * query      := metricExpr | logQuery
  * metricExpr := vecFunc [ "(" num "," ] "(" rangeAgg ")" [byWithout]
  *             | vecFunc byWithout "(" rangeAgg ")"
  *             | rangeAgg
  * rangeAgg   := rangeFunc "(" [num ","] logQuery "[" dur "]" ")"
  * logQuery   := selector stage*
  * selector   := "{" [matcher ("," matcher)*] "}"
  * matcher    := ident ("=" | "!=" | "=~" | "!~") string
  * stage      := "|=" str | "!=" str | "|~" str | "!~" str
  *             | "|" ("json" | "logfmt" | "unwrap" ident | labelPred)
  * labelPred  := labelAnd (("or") labelAnd)*
  * labelAnd   := labelCmp (("and" | ",") labelCmp)*
  * labelCmp   := ident strOp string | ident numOp number | "(" labelPred ")"
  * }}}
  */
object Parser {

  private val vectorFuncs =
    Set("sum", "avg", "min", "max", "count", "stddev", "stdvar", "topk",
      "bottomk", "approx_topk")
  private val rangeFuncs = Set(
    "count_over_time", "rate", "rate_counter", "bytes_over_time", "bytes_rate",
    "sum_over_time", "avg_over_time", "min_over_time", "max_over_time",
    "first_over_time", "last_over_time", "quantile_over_time",
    "stddev_over_time", "stdvar_over_time", "absent_over_time")

  def parse(input: String): Query = {
    val p = new P(Lexer.tokenize(input))
    val q = p.query()
    p.expectEof()
    q
  }

  /** Parse a line query only (selector + stages). */
  def parseLogQuery(input: String): LogQuery = {
    val p = new P(Lexer.tokenize(input))
    val q = p.logQuery()
    p.expectEof()
    q
  }

  private final class P(toks: Vector[Tok]) {
    private var i = 0
    // clamp past-the-end reads to the trailing TEof (ParserFuzzSpec)
    private def cur: Tok = if (i < toks.length) toks(i) else toks.last
    private def advance(): Tok = { val t = cur; i += 1; t }
    // bounded recursion: reject pathological nesting as a parse error
    // instead of a StackOverflowError (ParserFuzzSpec)
    private var depth = 0
    private def descend[A](body: => A): A = {
      depth += 1
      if (depth > 400) throw ParseError("expression nesting too deep", cur.pos)
      try body finally depth -= 1
    }
    private def isOp(s: String): Boolean = cur match {
      case TOp(o, _) => o == s
      case _         => false
    }
    private def eatOp(s: String): Unit =
      if (isOp(s)) i += 1 else throw ParseError(s"expected '$s'", cur.pos)
    private def identOpt: Option[String] = cur match {
      case TIdent(s, _) => Some(s)
      case _            => None
    }

    def expectEof(): Unit = cur match {
      case TEof(_) => ()
      case t       => throw ParseError("trailing input", t.pos)
    }

    def query(): Query = cur match {
      case TIdent(name, _) if vectorFuncs.contains(name) || rangeFuncs.contains(name) ||
          name == "label_replace" || name == "sort" || name == "sort_desc" =>
        MetricQuery(metricExpr())
      case TOp("(", _) | TNum(_, _) => MetricQuery(metricExpr())
      case TOp("{", _) => LineQuery(logQuery())
      case t           => throw ParseError("expected '{' or function", t.pos)
    }

    // ---- metric expressions with binary operators -----------------------
    // precedence (loosest → tightest), same ladder as PromQL:
    // or | and,unless | comparisons | +,- | *,/,% | ^ | atom

    def metricExpr(): MetricExpr = descend(orMetric())

    private def orMetric(): MetricExpr = {
      var l = andMetric()
      while (identOpt.contains("or")) {
        advance(); val (on, ig, grp) = matchMods()
        l = BinaryExpr("or", l, andMetric(), bool = false, on, ig, grp)
      }
      l
    }

    private def andMetric(): MetricExpr = {
      var l = cmpMetric()
      var go = true
      while (go) {
        if (identOpt.contains("and")) {
          advance(); val (on, ig, grp) = matchMods()
          l = BinaryExpr("and", l, cmpMetric(), bool = false, on, ig, grp)
        } else if (identOpt.contains("unless")) {
          advance(); val (on, ig, grp) = matchMods()
          l = BinaryExpr("unless", l, cmpMetric(), bool = false, on, ig, grp)
        } else go = false
      }
      l
    }

    private val cmpOps = Set(">", "<", ">=", "<=", "==", "!=")
    private def cmpMetric(): MetricExpr = {
      var l = addMetric()
      var go = true
      while (go) {
        cur match {
          case TOp(o, _) if cmpOps(o) =>
            advance()
            val bool = if (identOpt.contains("bool")) { advance(); true } else false
            val (on, ig, grp) = matchMods()
            l = BinaryExpr(o, l, addMetric(), bool, on, ig, grp)
          case _ => go = false
        }
      }
      l
    }

    private def addMetric(): MetricExpr = {
      var l = mulMetric()
      var go = true
      while (go) {
        cur match {
          case TOp(o, _) if o == "+" || o == "-" =>
            advance(); val (on, ig, grp) = matchMods()
            l = BinaryExpr(o, l, mulMetric(), bool = false, on, ig, grp)
          case _ => go = false
        }
      }
      l
    }

    private def mulMetric(): MetricExpr = {
      var l = powMetric()
      var go = true
      while (go) {
        cur match {
          case TOp(o, _) if o == "*" || o == "/" || o == "%" =>
            advance(); val (on, ig, grp) = matchMods()
            l = BinaryExpr(o, l, powMetric(), bool = false, on, ig, grp)
          case _ => go = false
        }
      }
      l
    }

    private def powMetric(): MetricExpr = {
      val base = metricAtom()
      if (isOp("^")) {
        advance(); val (on, ig, grp) = matchMods()
        BinaryExpr("^", base, powMetric(), bool = false, on, ig, grp)
      } else base
    }

    private def labelList(): Seq[String] = {
      eatOp("(")
      val ls = Seq.newBuilder[String]
      var first = true
      while (!isOp(")")) {
        if (!first) eatOp(",")
        first = false
        advance() match {
          case TIdent(l, _) => ls += l
          case t            => throw ParseError("expected label", t.pos)
        }
      }
      eatOp(")")
      ls.result()
    }

    /** `on(l, …)` / `ignoring(l, …)` then optional `group_left[(l, …)]` /
      * `group_right[(l, …)]` after a binary operator (same grammar as the
      * PromQL side). */
    private def matchMods(): (Seq[String], Seq[String], Option[(Boolean, Seq[String])]) = {
      var on = Seq.empty[String]
      var ig = Seq.empty[String]
      if (identOpt.contains("on") || identOpt.contains("ignoring")) {
        val kind = advance().asInstanceOf[TIdent].s
        val ls = labelList()
        if (kind == "on") on = ls else ig = ls
      }
      var group: Option[(Boolean, Seq[String])] = None
      if (identOpt.contains("group_left") || identOpt.contains("group_right")) {
        val leftMany = advance().asInstanceOf[TIdent].s == "group_left"
        val include = if (isOp("(")) labelList() else Seq.empty
        group = Some((leftMany, include))
      }
      (on, ig, group)
    }

    private def metricAtom(): MetricExpr = cur match {
      case TNum(v, _) => advance(); LiteralExpr(v)
      case TIdent("vector", _) =>
        advance(); eatOp("(")
        val v = cur match {
          case TNum(d, _) => advance(); d
          case t          => throw ParseError("vector() expects a number", t.pos)
        }
        eatOp(")")
        VectorLit(v)
      case TOp("(", _) =>
        advance(); val e = metricExpr(); eatOp(")"); e
      case _ => metricAggExpr()
    }

    private def metricAggExpr(): MetricExpr = cur match {
      case TIdent("label_replace", _) =>
        advance(); eatOp("(")
        val inner = metricExpr(); eatOp(",")
        val dst = str(); eatOp(",")
        val repl = str(); eatOp(",")
        val src = str(); eatOp(",")
        val regex = str()
        eatOp(")")
        LabelReplaceExpr(inner, dst, repl, src, regex)
      case TIdent(f @ ("sort" | "sort_desc"), _) =>
        advance(); eatOp("(")
        val inner = metricExpr()
        eatOp(")")
        SortExpr(f == "sort_desc", inner)
      case TIdent(name, _) if vectorFuncs.contains(name) =>
        advance()
        var by = Seq.empty[String]
        var without = Seq.empty[String]
        var param: Option[Double] = None
        // leading by/without
        if (identOpt.contains("by") || identOpt.contains("without")) {
          val (b, w) = byWithout()
          by = b; without = w
        }
        eatOp("(")
        cur match {
          case TNum(v, _)
              if Set("topk", "bottomk", "quantile", "approx_topk")
                .contains(name) =>
            advance(); eatOp(","); param = Some(v)
          case _ => ()
        }
        val inner = rangeAgg()
        eatOp(")")
        if (by.isEmpty && without.isEmpty &&
          (identOpt.contains("by") || identOpt.contains("without"))) {
          val (b, w) = byWithout()
          by = b; without = w
        }
        VectorExpr(VectorAgg(name, param, inner, by, without))
      case TIdent(name, _) if rangeFuncs.contains(name) =>
        RangeExpr(rangeAgg())
      case t => throw ParseError("expected aggregation function", t.pos)
    }

    private def byWithout(): (Seq[String], Seq[String]) = {
      val kind = advance() match {
        case TIdent(k, _) => k
        case t            => throw ParseError("expected by/without", t.pos)
      }
      eatOp("(")
      val labels = Seq.newBuilder[String]
      var first = true
      while (!isOp(")")) {
        if (!first) eatOp(",")
        first = false
        advance() match {
          case TIdent(l, _) => labels += l
          case t            => throw ParseError("expected label", t.pos)
        }
      }
      eatOp(")")
      if (kind == "by") (labels.result(), Seq.empty) else (Seq.empty, labels.result())
    }

    def rangeAgg(): RangeAgg = {
      val name = advance() match {
        case TIdent(f, _) if rangeFuncs.contains(f) => f
        case t => throw ParseError("expected range function", t.pos)
      }
      eatOp("(")
      var param: Option[Double] = None
      cur match {
        case TNum(v, _) if name == "quantile_over_time" =>
          advance(); eatOp(","); param = Some(v)
        case _ => ()
      }
      // parenthesized selector form: rate(({...} |= "x")[10s]) — the
      // Loki-docs shape (reference corpus.rs "parenthesized selector in
      // range"); the parens wrap the whole log pipeline
      val q = cur match {
        case TOp("(", _) =>
          advance(); val inner = logQuery(); eatOp(")"); inner
        case _ => logQuery()
      }
      val dur = cur match {
        case TOp("[", _) =>
          advance()
          val d = advance() match {
            case TDur(sec, _) => sec
            case t            => throw ParseError("expected duration", t.pos)
          }
          eatOp("]")
          d
        case t => throw ParseError("expected '[range]'", t.pos)
      }
      eatOp(")")
      // `offset` may trail the aggregation (reference parser.rs:898)
      var offset = 0L
      if (identOpt.contains("offset")) {
        advance()
        offset = advance() match {
          case TDur(d, _) => d
          case t          => throw ParseError("expected duration after offset", t.pos)
        }
      }
      RangeAgg(name, q, dur, param, offset)
    }

    def logQuery(): LogQuery = {
      val sel = selector()
      val stages = Seq.newBuilder[Stage]
      var done = false
      while (!done) {
        cur match {
          case TOp("|=", _) => advance(); stages += lineNeedle(LineOp.Contains)
          case TOp("!=", _) => advance(); stages += lineNeedle(LineOp.NotContains)
          case TOp("|~", _) => advance(); stages += lineNeedle(LineOp.Regex)
          case TOp("!~", _) => advance(); stages += lineNeedle(LineOp.NotRegex)
          case TOp("|>", _) => advance(); stages += lineNeedle(LineOp.Pattern)
          case TOp("!>", _) => advance(); stages += lineNeedle(LineOp.NotPattern)
          case TOp("|", _) =>
            advance()
            cur match {
              case TIdent("json", _) =>
                advance()
                val ex = extractionList()
                stages += (if (ex.isEmpty) Stage.Json else Stage.JsonPath(ex))
              case TIdent("logfmt", _) =>
                advance()
                // `--strict` / `--keep-empty` flags (reference ast.rs
                // LogfmtStage.flags): parse-accepted; like the reference's
                // stage lowering they don't change filter semantics
                while (isOp("-")) {
                  advance(); if (isOp("-")) advance()
                  cur match {
                    case TIdent("strict", _) => advance()
                    case TIdent("keep", _) =>
                      advance()
                      if (isOp("-")) { advance() }
                      cur match {
                        case TIdent("empty", _) => advance()
                        case t => throw ParseError("expected 'empty' after keep-", t.pos)
                      }
                    case t => throw ParseError("unknown logfmt flag", t.pos)
                  }
                }
                val ex = extractionList()
                stages += (if (ex.isEmpty) Stage.Logfmt else Stage.LogfmtExtract(ex))
              case TIdent("regexp", _) =>
                advance(); stages += Stage.Regexp(str())
              case TIdent("unpack", _)     => advance(); stages += Stage.Unpack
              case TIdent("decolorize", _) => advance(); stages += Stage.Decolorize
              case TIdent("drop", _) =>
                advance(); stages += Stage.DropLabels(labelItemList())
              case TIdent("keep", _) =>
                advance(); stages += Stage.KeepLabels(labelItemList())
              case TIdent("distinct", _) =>
                advance()
                val ls = Seq.newBuilder[String]
                var more = true
                while (more) {
                  advance() match {
                    case TIdent(l, _) => ls += l
                    case t            => throw ParseError("expected label after distinct", t.pos)
                  }
                  if (isOp(",")) advance() else more = false
                }
                stages += Stage.Distinct(ls.result())
              case TIdent("unwrap", _) =>
                advance()
                advance() match {
                  case TIdent(conv, _) if isOp("(") &&
                      Set("duration", "duration_seconds", "bytes").contains(conv) =>
                    advance() // (
                    val l = advance() match {
                      case TIdent(x, _) => x
                      case t => throw ParseError("expected label in unwrap conversion", t.pos)
                    }
                    eatOp(")")
                    stages += Stage.Unwrap(l, Some(conv))
                  case TIdent(l, _) => stages += Stage.Unwrap(l)
                  case t            => throw ParseError("expected label after unwrap", t.pos)
                }
              case TIdent("line_format", _) =>
                advance()
                stages += Stage.LineFormat(str())
              case TIdent("pattern", _) =>
                advance()
                stages += Stage.Pattern(str())
              case TIdent("label_format", _) =>
                advance()
                val assigns = Seq.newBuilder[(String, Either[String, String])]
                var more = true
                while (more) {
                  val dst = advance() match {
                    case TIdent(l, _) => l
                    case t            => throw ParseError("expected label", t.pos)
                  }
                  eatOp("=")
                  cur match {
                    case TStr(tmpl, _) => advance(); assigns += (dst -> Right(tmpl))
                    case TIdent(src, _) => advance(); assigns += (dst -> Left(src))
                    case t => throw ParseError("expected label or template", t.pos)
                  }
                  if (isOp(",")) advance() else more = false
                }
                stages += Stage.LabelFormat(assigns.result())
              case _ => stages += Stage.LabelFilter(labelPred())
            }
          case _ => done = true
        }
      }
      LogQuery(sel, stages.result())
    }

    /** line-filter needle: a string, or `ip("...")` (Loki allows the ip
      * form only with `|=` / `!=`). */
    private def lineNeedle(op: LineOp): Stage = cur match {
      case TIdent("ip", _) =>
        advance(); eatOp("(")
        val pat = str()
        eatOp(")")
        op match {
          case LineOp.Contains    => Stage.LineIpFilter(contains = true, pat)
          case LineOp.NotContains => Stage.LineIpFilter(contains = false, pat)
          case _ => throw Unsupported("ip() line filter supports only |= and !=")
        }
      case _ => Stage.LineFilter(op, str())
    }

    /** `lbl="json.path"` / bare `lbl` items after `| json` / `| logfmt` —
      * empty when the next token starts a new stage (the bare-parser
      * form). A bare item extracts the path equal to its own name. */
    private def extractionList(): Seq[(String, String)] = {
      val ex = Seq.newBuilder[(String, String)]
      var more = identOpt.isDefined
      while (more) {
        val name = advance().asInstanceOf[TIdent].s
        if (isOp("=")) { advance(); ex += (name -> str()) }
        else ex += (name -> name)
        if (isOp(",")) { advance(); if (identOpt.isEmpty) throw ParseError("expected label", cur.pos) }
        else more = false
        if (more && identOpt.isEmpty) more = false
      }
      ex.result()
    }

    /** `lbl` / `lbl="v"` / `lbl=~"re"` items for `| drop` / `| keep`. */
    private def labelItemList(): Seq[(String, Option[(MatchOp, String)])] = {
      val items = Seq.newBuilder[(String, Option[(MatchOp, String)])]
      var more = true
      while (more) {
        val name = advance() match {
          case TIdent(l, _) => l
          case t            => throw ParseError("expected label", t.pos)
        }
        val matcher = cur match {
          case TOp("=", _)  => advance(); Some((MatchOp.Eq, str()))
          case TOp("!=", _) => advance(); Some((MatchOp.Neq, str()))
          case TOp("=~", _) => advance(); Some((MatchOp.Re, str()))
          case TOp("!~", _) => advance(); Some((MatchOp.Nre, str()))
          case _            => None
        }
        items += (name -> matcher)
        if (isOp(",")) advance() else more = false
      }
      items.result()
    }

    def selector(): Selector = {
      eatOp("{")
      val ms = Seq.newBuilder[LabelMatcher]
      var first = true
      while (!isOp("}")) {
        if (!first) eatOp(",")
        first = false
        val label = advance() match {
          case TIdent(l, _) => l
          case t            => throw ParseError("expected label name", t.pos)
        }
        val op = advance() match {
          case TOp("=", _)  => MatchOp.Eq
          case TOp("!=", _) => MatchOp.Neq
          case TOp("=~", _) => MatchOp.Re
          case TOp("!~", _) => MatchOp.Nre
          case t            => throw ParseError("expected matcher op", t.pos)
        }
        ms += LabelMatcher(label, op, str())
      }
      eatOp("}")
      Selector(ms.result())
    }

    private def str(): String = advance() match {
      case TStr(s, _) => s
      case t          => throw ParseError("expected string", t.pos)
    }

    def labelPred(): LabelPredicate = {
      var left = labelAnd()
      while (identOpt.contains("or")) {
        advance()
        left = LabelPredicate.Or(left, labelAnd())
      }
      left
    }

    private def labelAnd(): LabelPredicate = {
      var left = labelCmp()
      var more = true
      while (more) {
        if (identOpt.contains("and")) { advance(); left = LabelPredicate.And(left, labelCmp()) }
        else if (isOp(",")) { advance(); left = LabelPredicate.And(left, labelCmp()) }
        else more = false
      }
      left
    }

    private def labelCmp(): LabelPredicate = {
      if (isOp("(")) {
        advance()
        val p = labelPred()
        eatOp(")")
        return p
      }
      val label = advance() match {
        case TIdent(l, _) => l
        case t            => throw ParseError("expected label", t.pos)
      }
      val opTok = advance() match {
        case TOp(o, _) => o
        case t         => throw ParseError("expected comparison op", t.pos)
      }
      // unary minus on numeric literals
      val neg = cur match {
        case TOp("-", _) => advance(); true
        case _           => false
      }
      def signed(v: Double): Double = if (neg) -v else v
      def numOp(o: String, pos: Int): CmpOp = o match {
        case "==" | "=" => CmpOp.Eq
        case "!="       => CmpOp.Neq
        case ">"        => CmpOp.Gt
        case ">="       => CmpOp.Gte
        case "<"        => CmpOp.Lt
        case "<="       => CmpOp.Lte
        case other      => throw ParseError(s"bad numeric op '$other'", pos)
      }
      (opTok, cur) match {
        case (_, TStr(_, _)) if neg =>
          throw ParseError("'-' before string", cur.pos)
        case (o, TIdent("ip", _)) =>
          advance(); eatOp("(")
          val pat = str()
          eatOp(")")
          o match {
            case "="  => LabelPredicate.IpCmp(label, eq = true, pat)
            case "!=" => LabelPredicate.IpCmp(label, eq = false, pat)
            case other => throw Unsupported(s"ip() supports only = and !=, got '$other'")
          }
        case ("=", TStr(v, _))  => advance(); LabelPredicate.StrCmp(label, MatchOp.Eq, v)
        case ("!=", TStr(v, _)) => advance(); LabelPredicate.StrCmp(label, MatchOp.Neq, v)
        case ("=~", TStr(v, _)) => advance(); LabelPredicate.StrCmp(label, MatchOp.Re, v)
        case ("!~", TStr(v, _)) => advance(); LabelPredicate.StrCmp(label, MatchOp.Nre, v)
        case (_, TNum(v0, _)) =>
          advance()
          // a bytes-unit suffix makes it a bytes literal: compared by raw
          // byte count, as the write path serializes (reference
          // logql.rs:290-298 numeric_value)
          val byteUnits = Map(
            "B" -> 1d, "KB" -> 1e3, "MB" -> 1e6, "GB" -> 1e9, "TB" -> 1e12,
            "KiB" -> 1024d, "MiB" -> 1024d * 1024, "GiB" -> math.pow(1024, 3),
            "TiB" -> math.pow(1024, 4))
          val scaled = cur match {
            case TIdent(u, _) if byteUnits.contains(u) => advance(); v0 * byteUnits(u)
            case _                                     => v0
          }
          LabelPredicate.NumCmp(label, numOp(opTok, cur.pos), signed(scaled))
        case (_, TDur(sec, _)) =>
          // duration literal: compared in NANOS (reference numeric_value —
          // durations serialize as nanoseconds)
          advance()
          LabelPredicate.NumCmp(label, numOp(opTok, cur.pos), signed(sec.toDouble * 1e9))
        case (_, TDurNs(ns, _)) =>
          advance()
          LabelPredicate.NumCmp(label, numOp(opTok, cur.pos), signed(ns.toDouble))
        case (_, t) => throw ParseError("expected string or number", t.pos)
      }
    }
  }
}
