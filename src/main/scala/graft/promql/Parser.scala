package graft.promql

import Ast._
import graft.logql.Lexer
import graft.logql.Lexer._

/** Recursive-descent PromQL parser with precedence climbing.
  *
  * Precedence (loosest → tightest), per the Prometheus spec:
  * or | unless/and | comparisons | +,- | *,/,% | ^ | unary | atom.
  * Reuses the LogQL tokenizer (same token shapes).
  */
object Parser {

  def parse(input: String): Expr = {
    // colonIdents: recording-rule metric names (job:rate:5m) are plain
    // identifiers in the PromQL grammar
    val p = new P(Lexer.tokenize(input, colonIdents = true))
    val e = p.expr()
    p.expectEof()
    e
  }

  /** shift every selector in `e` by `d` seconds — the denotation of
    * `offset` applied to a SUBQUERY: evaluating the whole inner
    * expression at T−d is exactly evaluating each of its selectors at
    * T−d (selectors keep their own inner offsets additively). */
  private def shiftOffset(e: Expr, d: Long): Expr = e match {
    case s: Selector      => s.copy(offsetSec = s.offsetSec + d)
    case Subquery(x, r, p, a) => Subquery(shiftOffset(x, d), r, p, a)
    case Call(f, as)      => Call(f, as.map(shiftOffset(_, d)))
    case Agg(op, p, x, b, w) => Agg(op, p.map(shiftOffset(_, d)), shiftOffset(x, d), b, w)
    case Binary(op, l, r, b, on, ig, g) =>
      Binary(op, shiftOffset(l, d), shiftOffset(r, d), b, on, ig, g)
    case other => other
  }

  private final class P(toks: Vector[Tok]) {
    private var i = 0
    // past-the-end reads clamp to the trailing TEof instead of throwing
    // IndexOutOfBounds — some error paths advance past EOF before the
    // grammar notices (found by ParserFuzzSpec)
    private def cur: Tok = if (i < toks.length) toks(i) else toks.last
    // recursive descent dies by STACK on unbounded nesting; the wire
    // can always send 100k parens or unary minuses, so reject early
    // with a domain error (ParserFuzzSpec deep-nesting law)
    private var depth = 0
    private def descend[A](body: => A): A = {
      depth += 1
      if (depth > 400) throw ParseError("expression nesting too deep", cur.pos)
      try body finally depth -= 1
    }
    private def advance(): Tok = { val t = cur; i += 1; t }
    private def isOp(s: String): Boolean = cur match {
      case TOp(o, _) => o == s
      case _         => false
    }
    private def isIdent(s: String): Boolean = cur match {
      case TIdent(o, _) => o == s
      case _            => false
    }
    private def eatOp(s: String): Unit =
      if (isOp(s)) i += 1 else throw ParseError(s"expected '$s'", cur.pos)

    def expectEof(): Unit = cur match {
      case TEof(_) => ()
      case t       => throw ParseError("trailing input", t.pos)
    }

    def expr(): Expr = descend(orExpr())

    private def orExpr(): Expr = {
      var l = setExpr()
      while (isIdent("or")) {
        advance(); val (on, ig, grp) = matchMods()
        l = Binary("or", l, setExpr(), bool = false, on, ig, grp)
      }
      l
    }

    private def setExpr(): Expr = {
      var l = cmpExpr()
      var go = true
      while (go) {
        if (isIdent("and")) {
          advance(); val (on, ig, grp) = matchMods()
          l = Binary("and", l, cmpExpr(), bool = false, on, ig, grp)
        } else if (isIdent("unless")) {
          advance(); val (on, ig, grp) = matchMods()
          l = Binary("unless", l, cmpExpr(), bool = false, on, ig, grp)
        }
        else go = false
      }
      l
    }

    private val cmpOps = Set(">", "<", ">=", "<=", "==", "!=")
    private def cmpExpr(): Expr = {
      var l = addExpr()
      var go = true
      while (go) {
        cur match {
          case TOp(o, _) if cmpOps(o) =>
            advance()
            val bool = if (isIdent("bool")) { advance(); true } else false
            val (on, ig, grp) = matchMods()
            l = Binary(o, l, addExpr(), bool, on, ig, grp)
          case _ => go = false
        }
      }
      l
    }

    private def addExpr(): Expr = {
      var l = mulExpr()
      var go = true
      while (go) {
        cur match {
          case TOp(o, _) if o == "+" || o == "-" =>
            advance()
            val (on, ig, grp) = matchMods()
            l = Binary(o, l, mulExpr(), bool = false, on, ig, grp)
          case _ => go = false
        }
      }
      l
    }

    private def mulExpr(): Expr = {
      var l = powExpr()
      var go = true
      while (go) {
        cur match {
          case TOp(o, _) if o == "*" || o == "/" || o == "%" =>
            advance()
            val (on, ig, grp) = matchMods()
            l = Binary(o, l, powExpr(), bool = false, on, ig, grp)
          // `atan2` is a keyword binary operator at `*` precedence in the
          // Prometheus grammar (not a function call)
          case TIdent("atan2", _) =>
            advance()
            val (on, ig, grp) = matchMods()
            l = Binary("atan2", l, powExpr(), bool = false, on, ig, grp)
          case _ => go = false
        }
      }
      l
    }

    /** `^` — right-associative. */
    private def powExpr(): Expr = {
      val base = unary()
      if (isOp("^")) { advance(); Binary("^", base, powExpr(), bool = false) }
      else base
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

    /** optional `on(l, …)` / `ignoring(l, …)` then optional
      * `group_left[(l, …)]` / `group_right[(l, …)]` after a binary
      * operator. A '(' directly after group_left/right is its include
      * list (Prometheus grammar), never a parenthesized operand. */
    private def matchMods(): (Seq[String], Seq[String], Option[(Boolean, Seq[String])]) = {
      var on = Seq.empty[String]
      var ig = Seq.empty[String]
      if (isIdent("on") || isIdent("ignoring")) {
        val kind = advance().asInstanceOf[TIdent].s
        val ls = labelList()
        if (kind == "on") on = ls else ig = ls
      }
      var group: Option[(Boolean, Seq[String])] = None
      if (isIdent("group_left") || isIdent("group_right")) {
        val leftMany = advance().asInstanceOf[TIdent].s == "group_left"
        val include = if (isOp("(")) labelList() else Seq.empty
        group = Some((leftMany, include))
      }
      (on, ig, group)
    }

    private def unary(): Expr = descend(cur match {
      case TOp("-", _) => advance(); Binary("-", NumLit(0), unary(), bool = false)
      case TOp("+", _) => advance(); unary() // unary + is identity
      case _           => postfix(atom())
    })

    /** subquery suffix `[range:res]` on any expression (selectors consume
      * their own plain `[range]` first); `[range:]` = default resolution
      * (resSec 0 — the evaluator substitutes its step). A subquery may
      * carry a trailing `offset d`, folded into every inner selector. */
    private def postfix(e: Expr): Expr =
      if (isOp("[")) {
        advance()
        val r = advance() match {
          case TDur(d, _)    => d * 1000000000L
          case TDurNs(ns, _) => ns
          case t             => throw ParseError("expected duration", t.pos)
        }
        val res = if (isOp(":")) {
          advance()
          cur match {
            case TDur(d, _)    => advance(); d * 1000000000L
            case TDurNs(ns, _) => advance(); ns // sub-second resolution
            case TOp("]", _)   => 0L // default resolution
            case t             => throw ParseError("expected resolution", t.pos)
          }
        } else throw ParseError("expected ':' in subquery", cur.pos)
        eatOp("]")
        var sub: Expr = Subquery(e, r, res)
        var go = true
        while (go) {
          if (isIdent("offset")) {
            advance()
            val neg = isOp("-")
            if (neg) advance()
            val d = advance() match {
              case TDur(d0, _) => if (neg) -d0 else d0
              case t => throw ParseError("expected duration after offset", t.pos)
            }
            sub = shiftOffset(sub, d)
          } else if (isOp("@")) {
            advance()
            val at = cur match {
              case TNum(v, _)         => advance(); AtMod.Time(v.toLong)
              case TIdent("start", _) => advance(); eatOp("("); eatOp(")"); AtMod.Start
              case TIdent("end", _)   => advance(); eatOp("("); eatOp(")"); AtMod.End
              case t => throw ParseError("expected timestamp, start() or end() after @", t.pos)
            }
            sub = sub match {
              case sq: Subquery => sq.copy(at = Some(at))
              case other        => other // offset-wrapped: at folds onto the subquery
            }
          } else go = false
        }
        postfix(sub)
      } else e

    private def atom(): Expr = cur match {
      case TNum(v, _) => advance(); NumLit(v)
      case TStr(s, _) => advance(); StrLit(s)
      case TOp("(", _) =>
        advance(); val e = expr(); eatOp(")"); e
      case TOp("{", _) => selector(None)
      case TIdent(name, _) if aggOps(name) =>
        advance()
        var by = Seq.empty[String]
        var without = Seq.empty[String]
        if (isIdent("by") || isIdent("without")) {
          val (b, w) = byWithout(); by = b; without = w
        }
        eatOp("(")
        var param: Option[Expr] = None
        if (Set("topk", "bottomk", "quantile", "count_values",
            "limitk", "limit_ratio").contains(name)) {
          param = Some(expr()); eatOp(",")
        }
        val inner = expr()
        eatOp(")")
        if (by.isEmpty && without.isEmpty && (isIdent("by") || isIdent("without"))) {
          val (b, w) = byWithout(); by = b; without = w
        }
        Agg(name, param, inner, by, without)
      case TIdent(name, _) if rangeFuncs(name) || scalarFuncs(name) || otherFuncs(name) =>
        // function call — or a metric that shadows a func name when not
        // followed by '('
        if (toks(i + 1) match { case TOp("(", _) => true; case _ => false }) {
          advance(); advance() // name (
          val args = Seq.newBuilder[Expr]
          if (!isOp(")")) {
            args += expr()
            while (isOp(",")) { advance(); args += expr() }
          }
          eatOp(")")
          Call(name, args.result())
        } else selector(Some(advance().asInstanceOf[TIdent].s))
      // Inf/NaN are NUMBER literals in the PromQL grammar (any case)
      case TIdent(s, _) if s.equalsIgnoreCase("inf") =>
        advance(); NumLit(Double.PositiveInfinity)
      case TIdent(s, _) if s.equalsIgnoreCase("nan") =>
        advance(); NumLit(Double.NaN)
      case TIdent(_, _) => selector(Some(advance().asInstanceOf[TIdent].s))
      case t            => throw ParseError("unexpected token", t.pos)
    }

    private def selector(metric: Option[String]): Expr = {
      var matchers = Seq.empty[LabelMatcher]
      if (isOp("{")) {
        advance()
        var first = true
        val ms = Seq.newBuilder[LabelMatcher]
        while (!isOp("}")) {
          if (!first) eatOp(",")
          first = false
          val l = advance() match {
            case TIdent(s, _) => s
            case t            => throw ParseError("expected label", t.pos)
          }
          val op = advance() match {
            case TOp("=", _)  => MatchOp.Eq
            case TOp("!=", _) => MatchOp.Neq
            case TOp("=~", _) => MatchOp.Re
            case TOp("!~", _) => MatchOp.Nre
            case t            => throw ParseError("expected matcher op", t.pos)
          }
          val v = advance() match {
            case TStr(s, _) => s
            case t          => throw ParseError("expected string", t.pos)
          }
          ms += LabelMatcher(l, op, v)
        }
        eatOp("}")
        matchers = ms.result()
      }
      var range: Option[Long] = None
      // `[dur]` is a range selector; `[dur:dur]` is a subquery suffix and
      // belongs to postfix() — look ahead before consuming. The
      // lookahead must bounds-check: `m[` at EOF has no i+2 token
      // (ParserFuzzSpec).
      val isSubquery = isOp("[") && i + 2 < toks.length && (toks(i + 2) match {
        case TOp(":", _) => true
        case _           => false
      })
      if (isOp("[") && !isSubquery) {
        advance()
        range = advance() match {
          case TDur(s, _)    => Some(s * 1000000000L)
          case TDurNs(ns, _) => Some(ns) // sub-second range selector
          case t             => throw ParseError("expected duration", t.pos)
        }
        eatOp("]")
      }
      // `offset d` and `@ t` may appear in either order
      var offset = 0L
      var at: Option[AtMod] = None
      var go = true
      while (go) {
        if (isIdent("offset")) {
          advance()
          // negative offsets (look-ahead) are valid Prometheus since 2.26
          val neg = isOp("-")
          if (neg) advance()
          offset = advance() match {
            case TDur(d, _) => if (neg) -d else d
            case t          => throw ParseError("expected duration after offset", t.pos)
          }
        } else if (isOp("@")) {
          advance()
          at = Some(cur match {
            case TNum(v, _)         => advance(); AtMod.Time(v.toLong)
            case TIdent("start", _) => advance(); eatOp("("); eatOp(")"); AtMod.Start
            case TIdent("end", _)   => advance(); eatOp("("); eatOp(")"); AtMod.End
            case t => throw ParseError("expected timestamp, start() or end() after @", t.pos)
          })
        } else go = false
      }
      Selector(metric, matchers, range, offset, at)
    }

    private def byWithout(): (Seq[String], Seq[String]) = {
      val kind = advance().asInstanceOf[TIdent].s
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
  }
}
