package graft

import org.scalatest.funsuite.AnyFunSuite

/** Parser robustness fuzz: thousands of seeded-random inputs — pure
  * garbage, mutations of valid queries, and adversarial nesting — may
  * be ACCEPTED or REJECTED, but rejection must be a domain error
  * (ParseError / Unsupported / the documented IllegalArgument paths),
  * never a crash class: no StackOverflowError on deep nesting, no
  * NullPointerException, no MatchError, no infinite loop (each parse is
  * time-bounded by construction — the inputs are small). The reference
  * routers feed untrusted query strings straight into their parsers;
  * ours face the same wire. */
class ParserFuzzSpec extends AnyFunSuite {

  private val seeds = Seq(
    """{job="api"} |= "error" | logfmt | dur > 2s""",
    """sum by (service_name) (rate({job="api"}[5m]))""",
    """topk(3, count_over_time({a="b", c!~"d.*"}[1h] offset 10m))""",
    """histogram_quantile(0.9, sum by (le) (rate(http_bucket[5m])))""",
    """rate(purchase{service_name=~"svc-.*"}[5m] @ 1700000000)""",
    """(a + b) * on(x) group_left(y) c or absent(d)""",
    """{ .service.name = "api" && duration > 100ms } | count() > 2""",
    """{ span.http.status_code >= 500 } >> { .error = true }""")

  private val alphabet =
    """{}()[]|=~!<>@,."'`0123456789abcdefghijklmnop_-+*/: msμ∞\\"""

  private def mutate(s: String, rnd: scala.util.Random): String = {
    val sb = new StringBuilder(s)
    for (_ <- 0 to rnd.nextInt(4)) {
      if (sb.nonEmpty) rnd.nextInt(3) match {
        case 0 => sb.setCharAt(rnd.nextInt(sb.length),
          alphabet(rnd.nextInt(alphabet.length)))
        case 1 => sb.deleteCharAt(rnd.nextInt(sb.length))
        case _ => sb.insert(rnd.nextInt(sb.length + 1),
          alphabet(rnd.nextInt(alphabet.length)))
      }
    }
    sb.toString
  }

  private def garbage(rnd: scala.util.Random): String =
    Seq.fill(1 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length)))
      .mkString

  /** accept = returns or throws a DOMAIN error; anything else fails. */
  private def probe(what: String, input: String)(parse: String => Any): Unit =
    try { parse(input); () }
    catch {
      case _: graft.logql.Ast.ParseError => ()
      case _: graft.logql.Ast.Unsupported => ()
      case _: graft.promql.Ast.ParseError => ()
      case _: graft.promql.Ast.Unsupported => ()
      case _: graft.traceql.TraceQL.Unsupported => ()
      case _: IllegalArgumentException => () // numeric literal bounds
      case _: NumberFormatException => ()    // numeric literal bounds
      case e: Throwable =>
        fail(s"$what crashed with ${e.getClass.getSimpleName}: " +
          s"${e.getMessage}\ninput: $input")
    }

  test("logql/promql/traceql parsers never crash on 3000 fuzzed inputs") {
    val rnd = new scala.util.Random(42L)
    for (i <- 0 until 3000) {
      val input =
        if (i % 3 == 0) garbage(rnd)
        else mutate(seeds(rnd.nextInt(seeds.length)), rnd)
      probe("logql", input)(graft.logql.Parser.parse)
      probe("promql", input)(graft.promql.Parser.parse)
      probe("traceql", input)(graft.traceql.TraceQL.parseExpr)
      probe("traceql-metrics", input)(graft.traceql.TraceQL.parseMetrics)
    }
  }

  test("deep nesting is rejected or parsed, never a StackOverflowError") {
    // recursive-descent parsers die by stack on unbounded nesting; the
    // wire can always send 100k parens
    for (depth <- Seq(100, 2000, 100000)) {
      val parens = "(" * depth + "1" + ")" * depth
      probe("promql-parens", parens)(graft.promql.Parser.parse)
      val unary = "-" * depth + "1"
      probe("promql-unary", unary)(graft.promql.Parser.parse)
      val logqlNest = "sum(" * depth + """count_over_time({a="b"}[1m])""" +
        ")" * depth
      probe("logql-nest", logqlNest)(graft.logql.Parser.parse)
    }
  }
}
