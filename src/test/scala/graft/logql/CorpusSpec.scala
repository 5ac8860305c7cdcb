package graft.logql

import org.scalatest.funsuite.AnyFunSuite

import Ast._

/** Parser breadth corpus (reference idea: src/logql/tests/corpus.rs — a
  * harvested query list split into must-parse and pinned-unsupported).
  * Every supported query must round through tokenize → parse without
  * throwing; every pinned query must fail EXPLICITLY (Unsupported or
  * ParseError), never silently mis-parse.
  */
class CorpusSpec extends AnyFunSuite {

  private val supported = Seq(
    // line queries: matchers, filters, parsers, formats
    """{job="api"}""",
    """{job="api", env!="dev"}""",
    """{job=~"api|web", pod!~"canary-.*"}""",
    """{job="api"} |= "error" != "timeout"""",
    """{job="api"} |~ "5\\d\\d" !~ "healthz"""",
    """{job="api"} | json""",
    """{job="api"} | logfmt""",
    """{job="api"} | json | status >= 500""",
    """{job="api"} | json | status >= 500 and method = "POST"""",
    """{job="api"} | json | code == 200 or code == 204""",
    """{job="api"} | json | d > -1.5""",
    """{job="api"} | label_format lvl=severity_text""",
    """{job="api"} | label_format msg="{{.method}} {{.path}}"""",
    """{job="api"} | line_format "{{.status}}"""",
    """{job="api"} | pattern "<ip> - <user> <_> \"<method> <path>\""""",
    """{job="api"} | pattern "{\"k\": <kv>}" | kv >= 70""",
    // metric queries: range + vector aggs
    """count_over_time({job="api"}[5m])""",
    """rate({job="api"} |= "error" [1m])""",
    """bytes_over_time({job="api"}[1h])""",
    """bytes_rate({job="api"}[30s])""",
    """sum(count_over_time({job="api"}[5m]))""",
    """sum by (job) (rate({job=~".+"}[5m]))""",
    """max without (pod) (count_over_time({job="api"}[1d]))""",
    """topk(5, count_over_time({job="api"}[1h]))""",
    """bottomk(3, rate({job="api"}[5m]))""",
    """avg_over_time({job="api"} | json | unwrap latency [5m])""",
    """sum_over_time({job="api"} | logfmt | unwrap bytes [1m])""",
    """min_over_time({job="api"} | json | unwrap v [1h])""",
    """max_over_time({job="api"} | json | unwrap v [1h])""",
    """first_over_time({job="api"} | json | unwrap v [1h])""",
    """last_over_time({job="api"} | json | unwrap v [1h])""",
    """stddev_over_time({job="api"} | json | unwrap v [1h])""",
    """stdvar_over_time({job="api"} | json | unwrap v [1h])""",
    """quantile_over_time(0.95, {job="api"} | json | unwrap v [5m])""",
    // binary metric expressions
    """sum by (job) (rate({job="a"}[5m])) / sum by (job) (rate({job="b"}[5m]))""",
    """sum(rate({job="a"}[5m])) > 10""",
    """count_over_time({a="1"}[1m]) + count_over_time({b="2"}[1m])""",
    """sum by (s) (count_over_time({a="1"}[1d])) unless (sum by (s) (count_over_time({b="2"}[1d])) > 17)""",
    """sum by (s) (rate({a="1"}[5m])) / on(s) sum by (s) (rate({b="2"}[5m]))""",
    """sum by (s, p) (rate({a="1"}[5m])) * ignoring(p) sum by (s, p) (rate({b="2"}[5m]))""",
    """sum(rate({a="1"}[5m])) > bool 0.5""",
    """2 * sum(rate({a="1"}[5m]))""",
    """sum by (s) (count_over_time({a="1"}[1h])) % 10""",
    """absent_over_time({job="api"}[5m])""",
    """sum by (s) (count_over_time({a="1"}[1d]) offset 1d)""",
    """avg_over_time({job="api"} | json | unwrap duration(lat) [5m])""",
    """sum_over_time({job="api"} | logfmt | unwrap bytes(sz) [1m])""",
    // parser/reshape stages lowered for real since round 4 (ast.rs:55-88)
    """{job="api"} | decolorize""",
    """{job="api"} | unpack""",
    """{job="api"} | keep job""",
    """{job="api"} | drop pod""",
    """{job="api"} | regexp "lvl=(?P<lvl>\\w+)" | lvl = "err"""",
    """{job="api"} | json lat="latency.ms" | lat > 10""",
    """{job="api"} | logfmt sz="size" | sz >= 1""",
    """{job="api"} | distinct pod""",
    """{job="api"} | keep job, pod="p.*"""",
    """{job="api"} | drop pod=~"p[0-9]+", job""",
    // duration/bytes literals in label filters (logql.rs numeric_value)
    """{job="api"} | logfmt | lat > 1s""",
    """{job="api"} | logfmt | sz >= 20KB""",
    """{job="api"} | json | took <= 5m""",
    // logfmt flags (ast.rs LogfmtStage.flags)
    """{job="api"} | logfmt --strict lvl="level" | lvl = "err"""",
    """{job="api"} | logfmt --keep-empty --strict""",
    // label_replace over metric exprs (reference logs.rs:1102-1188)
    """label_replace(rate({a="1"}[5m]), "d", "$1", "s", "(.*)")""",
    // sort()/sort_desc() over any metric expr (Loki 2.7)
    """sort(rate({a="1"}[5m]))""",
    """sort_desc(sum by (s) (count_over_time({a="1"}[1d])))""",
    // rate_counter over an unwrapped value (Loki counter semantics)
    """rate_counter({a="1"} | logfmt | unwrap v [5m])""",
    // |> / !> pattern line filters (Loki 3.x)
    """{a="1"} |> "<_> error <_>"""",
    """{a="1"} !> "ok <_>"""",
    """label_replace(sum by (s) (count_over_time({a="1"}[1d])), "d", "x$1", "s", "(.+)") / on(d) label_replace(sum by (s) (count_over_time({b="2"}[1d])), "d", "x$1", "s", "(.+)")""",
    // ip() exact / range / CIDR — implemented beyond the reference
    // (which rejects at execution, logql.rs:674)
    """{job="api"} | addr = ip("10.0.0.1")""",
    """{job="api"} | addr != ip("10.0.0.1-10.0.0.200")""",
    """{job="api"} |= ip("192.168.0.0/16")""",
    // IPv6 label filters (exact/range/CIDR, :: compression, v4-mapped)
    """{job="api"} | addr = ip("2001:db8::/32")""",
    """{job="api"} | addr != ip("::1-::ff")""",
    """{job="api"} | addr = ip("::ffff:10.0.1.2")""",
    // __error__ parse-status label (reference logql lexer.rs:552,
    // parser.rs:1364)
    """{app="foo"} | json | __error__ = """"",
    """{a="b"} | json | drop __error__, method="GET"""",
    // harvested Loki-docs forms (reference corpus.rs): backtick raw
    // strings, parenthesized selectors in ranges, grouped label filters
    // with sub-second/bytes literals, or-combined ip(), or vector(0)
    """{name !~ `mysql-\d+`}""",
    """rate(({job="mysql"} |= "error" != "timeout")[10s])""",
    """avg(rate(({job="nginx"} |= "GET" | json | path="/home")[10s])) by (region)""",
    """{app="foo"} | logfmt | ((duration >= 20ms or method="GET") and size <= 20KB)""",
    """{container="query-frontend"} |= "metrics.go" | logfmt | duration > 10s and throughput_mb < 500""",
    """sum(count_over_time({namespace="traefik"}[5m])) or vector(0)""",
    """{job_name="myapp"} | logfmt | addr = ip("192.168.4.0/24") or addr = ip("10.10.15.0/24")""",
    """{name =~ "(?s).*mysql.*"}""",
    """sum(rate({app="foo"}[5m])) * 2""",
    """{job="varlogs"}|json|drop __error__""",
    // shared-lexer upgrades (round 5): single-quoted strings, compound
    // durations, scientific-notation numbers, trailing comments
    """{job='api'} |= 'error'""",
    """count_over_time({job="api"}[1h30m])""",
    """rate({job="api"}[1m30s])""",
    """{job="api"} | json | v > 1e3""",
    """{job="api"} | logfmt | ratio <= 2.5e-3""",
    "sum(rate({job=\"api\"}[5m])) # error rate")

  private val pinnedUnsupported = Seq(
    """{job="api"} | ip "10.0.0.0/8"""",         // standalone ip stage is not LogQL
    """{job="api"} | addr >= ip("10.0.0.1")""",  // ip() only with = / !=
    """vector(5)""")                             // LogQL vector() literal not in subset

  for ((q, i) <- supported.zipWithIndex)
    test(f"corpus supported #$i%02d: ${q.take(60)}") {
      Parser.parse(q) // must not throw
    }

  for ((q, i) <- pinnedUnsupported.zipWithIndex)
    test(f"corpus pinned-unsupported #$i%02d: ${q.take(60)}") {
      val thrown = intercept[RuntimeException](Parser.parse(q))
      assert(thrown.isInstanceOf[Unsupported] || thrown.isInstanceOf[ParseError],
        s"expected an explicit rejection, got $thrown")
    }

  test("pattern compile: literals escape, <_> skips a group, trailing capture greedy") {
    val (re, names) = Lowering.compilePattern("""<ip> - <_> "{<m>}" <rest>""")
    assert(names == Seq("ip", "m", "rest"))
    assert(re == """^(.*?) - (?:.*?) "\{(.*?)\}" (.*)""")
    val jm = java.util.regex.Pattern.compile(re)
      .matcher("""1.2.3.4 - bob "{GET}" /x 200""")
    assert(jm.find())
    assert(jm.group(1) == "1.2.3.4")
    assert(jm.group(2) == "GET")
    assert(jm.group(3) == "/x 200")
  }

  test("named-regexp compile: (?P<n>…) → plain groups with correct indices") {
    // unnamed group shifts indices; (?:…) and char-class '(' do not
    val (re, names) = Lowering.compileNamedRegexp(
      """(a|b) (?:x|y) [(] (?P<m>\w+) (?P<n>[0-9]+)""")
    assert(re == """(a|b) (?:x|y) [(] (\w+) ([0-9]+)""")
    assert(names == Seq("m" -> 2, "n" -> 3))
    val jm = java.util.regex.Pattern.compile(re).matcher("a x ( GET 200")
    assert(jm.find() && jm.group(2) == "GET" && jm.group(3) == "200")
    // no named captures → explicit Unsupported, not a silent no-op
    assertThrows[Unsupported](Lowering.compileNamedRegexp("""plain (group)"""))
  }
}
