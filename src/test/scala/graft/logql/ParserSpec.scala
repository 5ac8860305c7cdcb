package graft.logql

import org.scalatest.funsuite.AnyFunSuite

import Ast._

/** Exact-AST tests, one per construct (reference style:
  * src/logql/tests/ast.rs). */
class ParserSpec extends AnyFunSuite {

  test("selector with all matcher ops") {
    val LineQuery(q) = Parser.parse(
      """{a="x", b!="y", c=~"z.*", d!~"w+"}"""): @unchecked
    assert(q.selector.matchers == Seq(
      LabelMatcher("a", MatchOp.Eq, "x"),
      LabelMatcher("b", MatchOp.Neq, "y"),
      LabelMatcher("c", MatchOp.Re, "z.*"),
      LabelMatcher("d", MatchOp.Nre, "w+")))
    assert(q.stages.isEmpty)
  }

  test("line filters in order") {
    val LineQuery(q) = Parser.parse(
      """{a="x"} |= "inc" != "exc" |~ "re.*" !~ "nre""""): @unchecked
    assert(q.stages == Seq(
      Stage.LineFilter(LineOp.Contains, "inc"),
      Stage.LineFilter(LineOp.NotContains, "exc"),
      Stage.LineFilter(LineOp.Regex, "re.*"),
      Stage.LineFilter(LineOp.NotRegex, "nre")))
  }

  test("string escapes") {
    val LineQuery(q) = Parser.parse("""{a="x"} |= "\"k\": 8\n"""") : @unchecked
    assert(q.stages == Seq(Stage.LineFilter(LineOp.Contains, "\"k\": 8\n")))
  }

  test("json stage and label predicates with and/or/comma") {
    val LineQuery(q) = Parser.parse(
      """{a="x"} | json | k >= 50 and v < 3, s = "ok" or t != 7"""): @unchecked
    assert(q.stages.head == Stage.Json)
    val Stage.LabelFilter(p) = q.stages(1): @unchecked
    // `or` binds loosest: ((k>=50 and v<3, s="ok") or (t!=7))
    p match {
      case LabelPredicate.Or(
        LabelPredicate.And(
          LabelPredicate.And(
            LabelPredicate.NumCmp("k", CmpOp.Gte, 50.0),
            LabelPredicate.NumCmp("v", CmpOp.Lt, 3.0)),
          LabelPredicate.StrCmp("s", MatchOp.Eq, "ok")),
        LabelPredicate.NumCmp("t", CmpOp.Neq, 7.0)) => ()
      case other => fail(s"unexpected tree: $other")
    }
  }

  test("range aggregation with duration units") {
    val MetricQuery(RangeExpr(r)) = Parser.parse(
      """count_over_time({a="x"}[5m])"""): @unchecked
    assert(r.func == "count_over_time")
    assert(r.rangeSec == 300)
    val MetricQuery(RangeExpr(r2)) = Parser.parse(
      """rate({a="x"}[1w])"""): @unchecked
    assert(r2.rangeSec == 604800)
  }

  test("sub-second duration literals compare in nanos (20ms is not 20m)") {
    val LineQuery(q) = Parser.parse("""{a="x"} | logfmt | lat > 20ms"""): @unchecked
    assert(q.stages.last ==
      Stage.LabelFilter(LabelPredicate.NumCmp("lat", CmpOp.Gt, 20000000.0)))
    val LineQuery(q2) = Parser.parse("""{a="x"} | logfmt | lat <= 150us"""): @unchecked
    assert(q2.stages.last ==
      Stage.LabelFilter(LabelPredicate.NumCmp("lat", CmpOp.Lte, 150000.0)))
  }

  test("vector agg with by clause, both positions") {
    val MetricQuery(VectorExpr(v1)) = Parser.parse(
      """sum by (svc) (count_over_time({a="x"}[1h]))"""): @unchecked
    assert(v1.func == "sum" && v1.by == Seq("svc"))
    val MetricQuery(VectorExpr(v2)) = Parser.parse(
      """sum (count_over_time({a="x"}[1h])) by (svc, sev)"""): @unchecked
    assert(v2.by == Seq("svc", "sev"))
    val MetricQuery(VectorExpr(v3)) = Parser.parse(
      """max without (sev) (count_over_time({a="x"}[1h]))"""): @unchecked
    assert(v3.without == Seq("sev"))
  }

  test("topk carries k; quantile_over_time carries phi") {
    val MetricQuery(VectorExpr(v)) = Parser.parse(
      """topk(3, rate({a="x"}[5m]))"""): @unchecked
    assert(v.func == "topk" && v.param.contains(3.0))
    val MetricQuery(RangeExpr(r)) = Parser.parse(
      """quantile_over_time(0.99, {a="x"} | unwrap lat [5m])"""): @unchecked
    assert(r.param.contains(0.99) && r.inner.unwrapLabel.contains("lat"))
  }

  test("unwrap stage") {
    val LineQuery(q) = Parser.parse("""{a="x"} | json | unwrap k"""): @unchecked
    assert(q.unwrapLabel.contains("k"))
  }

  test("ip() label filter parses to IpCmp (= and != only)") {
    val LineQuery(q) = Parser.parse("""{a="x"} | addr = ip("10.0.0.0/8")"""): @unchecked
    assert(q.stages.collect {
      case Stage.LabelFilter(LabelPredicate.IpCmp("addr", true, "10.0.0.0/8")) => ()
    }.nonEmpty)
    val LineQuery(qn) = Parser.parse("""{a="x"} | addr != ip("10.0.0.1-10.0.0.9")"""): @unchecked
    assert(qn.stages.collect {
      case Stage.LabelFilter(LabelPredicate.IpCmp("addr", false, _)) => ()
    }.nonEmpty)
    assertThrows[Unsupported](Parser.parse("""{a="x"} | addr =~ ip("10.0.0.0/8")"""))
  }

  test("ip() line filter parses for |= and !=, rejects |~") {
    val LineQuery(q) = Parser.parse("""{a="x"} |= ip("192.168.0.0/16")"""): @unchecked
    assert(q.stages.contains(Stage.LineIpFilter(contains = true, "192.168.0.0/16")))
    assertThrows[Unsupported](Parser.parse("""{a="x"} |~ ip("10.0.0.0/8")"""))
  }

  test("standalone | ip stage stays invalid") {
    assertThrows[RuntimeException](Parser.parse("""{a="x"} | ip "10.0.0.0/8""""))
  }

  test("parse errors carry position") {
    val e = intercept[ParseError](Parser.parse("""{a=}"""))
    assert(e.pos > 0)
    assertThrows[ParseError](Parser.parse("""{a="x"} trailing"""))
    assertThrows[ParseError](Parser.parse("""{a="unterminated}"""))
  }

  test("compound duration ending in bare digits is a ParseError, not an index crash") {
    // "1h30" — trailing digits with no unit must surface as a parse error
    assertThrows[ParseError](
      Parser.parse("""count_over_time({a="x"}[1h30])"""))
    assertThrows[ParseError](
      Parser.parse("""count_over_time({a="x"}[1m30"""))
  }

  test("negative numbers and floats in label filters") {
    val LineQuery(q) = Parser.parse("""{a="x"} | json | k > -1.5"""): @unchecked
    val Stage.LabelFilter(LabelPredicate.NumCmp("k", CmpOp.Gt, v)) =
      q.stages(1): @unchecked
    assert(v == -1.5)
  }
}
