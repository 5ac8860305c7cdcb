package graft.promql

import org.scalatest.funsuite.AnyFunSuite

import Ast._

class PromqlParserSpec extends AnyFunSuite {

  test("selector with matchers and range") {
    val Selector(Some("http_requests"), ms, Some(300000000000L), 0, None) =
      Parser.parse("""http_requests{job="api", code=~"5.."}[5m]"""): @unchecked
    assert(ms == Seq(
      LabelMatcher("job", MatchOp.Eq, "api"),
      LabelMatcher("code", MatchOp.Re, "5..")))
  }

  test("offset modifier") {
    val Selector(Some("m"), _, None, 86400, None) =
      Parser.parse("m offset 1d"): @unchecked
  }

  test("subquery vs range selector brackets") {
    val Subquery(Call("rate", _), 604800000000000L, 21600000000000L, None) =
      Parser.parse("rate(m[6h])[1w:6h]"): @unchecked
    val Subquery(Selector(Some("m"), _, None, 0, None), 3600000000000L, 60000000000L, None) =
      Parser.parse("m[1h:1m]"): @unchecked
  }

  test("precedence: or loosest, then and/unless, cmp, add, mul, pow") {
    val Binary("or", Binary("and", _, _, _, _, _, _), _, _, _, _, _) =
      Parser.parse("a and b or c"): @unchecked
    val Binary("+", _, Binary("*", _, _, _, _, _, _), _, _, _, _) =
      Parser.parse("a + b * c"): @unchecked
    val Binary("*", _, Binary("^", _, Binary("^", _, _, _, _, _, _), _, _, _, _), _, _, _, _) =
      Parser.parse("a * b ^ c ^ d"): @unchecked // ^ right-assoc
    val Binary(">", _, _, true, _, _, _) =
      Parser.parse("a > bool 1"): @unchecked
  }

  test("group_left/group_right many-to-one modifiers") {
    val Binary("*", _, _, _, Seq("service"), _, Some((true, Seq()))) =
      Parser.parse("a * on(service) group_left b"): @unchecked
    val Binary("/", _, _, _, _, Seq("pod"), Some((false, Seq("role")))) =
      Parser.parse("a / ignoring(pod) group_right(role) b"): @unchecked
  }

  test("on/ignoring matching modifiers") {
    val Binary("/", _, _, _, Seq("env"), Seq(), None) =
      Parser.parse("a / on(env) b"): @unchecked
    val Binary("+", _, _, _, Seq(), Seq("pod"), None) =
      Parser.parse("a + ignoring(pod) b"): @unchecked
  }

  test("aggregations with params and grouping") {
    val Agg("topk", Some(NumLit(5)), _, Seq("svc"), Seq()) =
      Parser.parse("topk(5, rate(m[1m])) by (svc)"): @unchecked
    val Agg("quantile", Some(NumLit(0.9)), _, Seq(), Seq("pod")) =
      Parser.parse("quantile without (pod) (0.9, m)"): @unchecked
    val Agg("count_values", Some(StrLit("v")), _, _, _) =
      Parser.parse("""count_values("v", m)"""): @unchecked
  }

  test("function calls and nesting") {
    val Call("histogram_quantile", Seq(NumLit(0.99), Agg("sum", _, _, _, _))) =
      Parser.parse("histogram_quantile(0.99, sum by (le) (rate(m[5m])))"): @unchecked
    val Call("label_replace", Seq(_, StrLit("dst"), StrLit("$1"), StrLit("src"), StrLit("(.*)"))) =
      Parser.parse("""label_replace(m, "dst", "$1", "src", "(.*)")"""): @unchecked
    val Call("clamp", Seq(_, NumLit(1), NumLit(2))) =
      Parser.parse("clamp(m, 1, 2)"): @unchecked
  }

  test("unary minus and scalar folding shapes") {
    val Binary("-", NumLit(0), Selector(Some("m"), _, _, _, _), _, _, _, _) =
      Parser.parse("-m"): @unchecked
  }

  test("@ modifier: unix timestamp, start()/end(), either order with offset") {
    val Selector(Some("m"), _, None, 0, Some(AtMod.Time(1609746000))) =
      Parser.parse("m @ 1609746000"): @unchecked
    val Selector(Some("m"), _, Some(300000000000L), 0, Some(AtMod.Start)) =
      Parser.parse("m[5m] @ start()"): @unchecked
    val Selector(Some("m"), _, None, 3600, Some(AtMod.End)) =
      Parser.parse("m @ end() offset 1h"): @unchecked
    val Selector(Some("m"), _, None, 3600, Some(AtMod.Time(5))) =
      Parser.parse("m offset 1h @ 5"): @unchecked
  }

  test("metric names that shadow function names parse as selectors") {
    val Selector(Some("rate"), _, None, 0, None) = Parser.parse("rate"): @unchecked
    val Call("rate", _) = Parser.parse("rate(m[1m])"): @unchecked
  }
}
