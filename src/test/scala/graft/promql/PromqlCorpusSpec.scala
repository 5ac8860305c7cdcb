package graft.promql

import org.scalatest.funsuite.AnyFunSuite

import Ast._

/** PromQL parser-breadth corpus (the same harvested-corpus idea as the
  * LogQL CorpusSpec; reference gets the full grammar from the
  * promql-parser crate, src/querier/src/query/promql.rs:1-20 — this spec
  * measures OUR hand-written parser against real-world query shapes).
  *
  * Sources (public): the Prometheus querying-basics/examples docs, the
  * node-exporter and kubernetes-mixin dashboard families, and the
  * operator sections of the PromQL spec. Every supported query must
  * parse without throwing; every pinned query must fail EXPLICITLY
  * (Unsupported or ParseError), never silently mis-parse.
  */
class PromqlCorpusSpec extends AnyFunSuite {

  private val supported = Seq(
    // selectors and matchers
    """http_requests_total""",
    """http_requests_total{job="apiserver", handler="/api/comments"}""",
    """http_requests_total{job=~".*server"}""",
    """http_requests_total{status!~"4.."}""",
    """http_requests_total{environment=~"staging|testing|development", method!="GET"}""",
    """{__name__="http_requests_total", job="api"}""",
    """http_requests_total{job='api'}""", // single-quoted strings
    """http_requests_total offset 5m""",
    """rate(http_requests_total[5m] offset 1w)""",
    """rate(http_requests_total[5m] offset -1w)""",
    """http_requests_total @ 1609746000""",
    """sum(http_requests_total{method="GET"} @ 1609746000)""",
    """rate(http_requests_total[5m] @ start())""",
    """http_requests_total @ end() offset 5m""",
    // range windows: plain, sub-day units, COMPOUND durations, years
    """rate(http_requests_total[5m])""",
    """increase(http_requests_total[1h30m])""",
    """delta(cpu_temp_celsius{host="zeus"}[2h])""",
    """increase(app_errors_total[90s])""",
    """avg_over_time(up[1y])""",
    """rate(x[1m30s])""",
    // aggregations, by/without in both positions
    """sum(rate(http_requests_total[5m]))""",
    """sum(rate(http_requests_total[5m])) by (job)""",
    """sum by (job) (rate(http_requests_total[5m]))""",
    """avg by (mode) (rate(node_cpu_seconds_total{mode!="idle"}[1m]))""",
    """avg(irate(node_cpu_seconds_total{mode!="idle"}[1m])) without (cpu)""",
    """count(instance_cpu_time_ns) by (app)""",
    """count(count(node_cpu_seconds_total) by (cpu))""",
    """stddev(task_cpu_usage) by (job)""",
    """stdvar(task_cpu_usage)""",
    """group by (job) (up)""",
    """topk(3, sum(rate(instance_cpu_time_ns[5m])) by (app, proc))""",
    """bottomk(3, sum(rate(http_requests_total[5m])) by (job))""",
    """topk by (job) (3, rate(http_requests_total[5m]))""",
    """quantile(0.9, node_load1)""",
    """count_values("version", build_version)""",
    """limitk(10, up)""",
    """limit_ratio(0.1, up)""",
    // arithmetic / comparison / set binary ops
    """(instance_memory_limit_bytes - instance_memory_usage_bytes) / 1024 / 1024""",
    """sum(instance_memory_limit_bytes - instance_memory_usage_bytes) by (app, proc) / 1024 / 1024""",
    """node_memory_MemAvailable_bytes / node_memory_MemTotal_bytes * 100""",
    """100 - (avg by (instance) (irate(node_cpu_seconds_total{mode="idle"}[5m])) * 100)""",
    """1 - (node_filesystem_avail_bytes{mountpoint="/"} / node_filesystem_size_bytes{mountpoint="/"})""",
    """irate(node_network_receive_bytes_total[5m]) * 8""",
    """up == 0""",
    """up{job="prometheus"} == 1""",
    """up == bool 1""",
    """sum(up) by (job) > 2""",
    """rate(errors_total[5m]) / rate(requests_total[5m]) > 0.05""",
    """changes(process_start_time_seconds[1h]) > 2""",
    """node_load1 > on(instance) node_cpu_count""",
    """foo and on() bar""",
    """foo unless on(instance) bar""",
    """foo or vector(0)""",
    """metric1 atan2 metric2""",
    """2 ^ 3 ^ 2""",
    """-node_load1""",
    """+node_load1""", // unary plus is identity
    // vector matching with recording-rule (colon) metric names
    """instance:node_cpu_utilisation:rate5m""",
    """method_code:http_errors:rate5m{code="500"} / ignoring(code) method:http_requests:rate5m""",
    """method_code:http_errors:rate5m / ignoring(code) group_left method:http_requests:rate5m""",
    """foo * on(instance) group_left(version) bar""",
    """foo * on(instance) group_right(version, build) bar""",
    """cluster:node_cpu:sum_rate5m / count(sum(node_cpu_seconds_total) by (instance))""",
    // histograms
    """histogram_quantile(0.9, rate(http_request_duration_seconds_bucket[10m]))""",
    """histogram_quantile(0.99, sum by (le, job) (rate(http_request_duration_seconds_bucket[5m])))""",
    // functions
    """absent(up{job="myjob"})""",
    """absent_over_time(up{job="myjob"}[1h])""",
    """time() - node_boot_time_seconds""",
    """predict_linear(node_filesystem_free_bytes[1h], 4 * 3600) < 0""",
    """clamp_max(node_load1, 100)""",
    """clamp_min(node_load1, 0)""",
    """clamp(node_load1, 0, 100)""",
    """round(node_load1, 0.5)""",
    """sgn(delta(x[1h]))""",
    """sqrt(node_load1)""",
    """ln(node_load1)""",
    """exp(node_load1)""",
    """abs(delta(x[1h]))""",
    """floor(node_load1)""",
    """ceil(node_load1)""",
    """label_replace(up, "host", "$1", "instance", "(.*):.*")""",
    """label_join(up, "endpoint", "-", "instance", "job")""",
    """scalar(sum(up))""",
    """vector(1)""",
    """vector(time())""",
    """timestamp(up)""",
    """sort_desc(sum(rate(http_requests_total[5m])) by (job))""",
    """sort(node_load1)""",
    """sort_by_label(up, "instance")""",
    """day_of_week()""",
    """hour(vector(1609746000))""",
    """holt_winters(x[10m], 0.5, 0.5)""",
    """double_exponential_smoothing(x[10m], 0.5, 0.5)""",
    """deriv(node_filesystem_free_bytes[1h])""",
    """resets(counter_total[1h])""",
    """irate(http_requests_total[5m])""",
    """idelta(gauge_metric[5m])""",
    // _over_time family, subqueries (incl. DEFAULT resolution), offsets
    """avg_over_time(rate(http_requests_total[5m])[30m:1m])""",
    """max_over_time(deriv(rate(distance_covered_total[5s])[30s:5s])[10m:])""",
    """quantile_over_time(0.5, http_requests_total[10m])""",
    """sum_over_time(http_requests_total[1h:])""",
    """min_over_time(rate(http_requests_total[5m])[30m:1m])""",
    """stddev_over_time(x[10m])""",
    """mad_over_time(x[10m])""",
    """last_over_time(up[5m])""",
    """present_over_time(up[5m])""",
    """max_over_time(x[5m:30s] offset 1h)""", // offset on a subquery
    """rate(count_over_time(click[1d])[2d:1d])""", // counter family over subquery
    // literals: scientific notation, hex, Inf/NaN, comments
    """node_network_transmit_bytes_total > 1e6""",
    """rate(x[5m]) > 2.5e-3""",
    """x == 0xff""",
    """clamp_min(node_load1, -Inf)""",
    """foo != NaN""",
    "up == 1 # healthy targets",
    // metric names shadowing function names (no call parens)
    """rate{job="api"}""",
    """sum_over_time{job="api"} > 0""",
    // sub-second ranges/resolutions (ms dashboards) — round 6
    """rate(x[500ms])""",
    """sum_over_time(x[30s:100ms])""",
    """max_over_time(x[250ms])""",
    """avg_over_time(x[10s:250ms])""",
    // @ on a subquery — round 6
    """max_over_time(x[5m:30s] @ end())""",
    """sum_over_time(x[1h:5m] @ 1609746000)""",
    // native-histogram functions — round 6 (registered NativeHistTable;
    // classic float series yield the empty vector, as in Prometheus)
    """histogram_count(rate(native_hist[5m]))""",
    """histogram_sum(rate(native_hist[5m]))""",
    """histogram_avg(native_hist)""",
    """histogram_quantile(0.9, increase(native_hist[5m]))""",
    """histogram_fraction(0, 2, rate(native_hist[5m]))""",
    // experimental v3 info() — round 6 (broadcast left join onto the
    // registered target_info labels; q306)
    """info(up)""",
    """info(rate(http_requests_total[5m]))""")

  private val pinnedUnsupported = Seq(
    """{job="api"} |= "error"""",                // LogQL, not PromQL
    """sum(rate(x[5m"""                          // truncated input
  )

  for ((q, i) <- supported.zipWithIndex)
    test(f"corpus supported #$i%03d: ${q.take(64)}") {
      Parser.parse(q) // must not throw
    }

  for ((q, i) <- pinnedUnsupported.zipWithIndex)
    test(f"corpus pinned-unsupported #$i%02d: ${q.take(64)}") {
      val thrown = intercept[RuntimeException](Parser.parse(q))
      assert(thrown.isInstanceOf[Unsupported] || thrown.isInstanceOf[ParseError],
        s"expected an explicit rejection, got $thrown")
    }

  test("sub-second range selector carries nanos") {
    val Call(_, Seq(Selector(_, _, Some(r), _, _))) =
      Parser.parse("rate(x[500ms])"): @unchecked
    assert(r == 500000000L)
  }

  test("sub-second subquery resolution carries nanos") {
    val Call(_, Seq(Subquery(_, r, res, _))) =
      Parser.parse("sum_over_time(x[30s:100ms])"): @unchecked
    assert(r == 30000000000L && res == 100000000L)
  }

  // targeted shape checks for the constructs the corpus surfaced
  test("compound duration lexes to one token: 1h30m = 5400s") {
    val Call(_, Seq(Selector(_, _, Some(r), _, _))) =
      Parser.parse("increase(x[1h30m])"): @unchecked
    assert(r == 5400L * 1000000000L)
  }

  test("default-resolution subquery carries res 0") {
    val Call(_, Seq(Subquery(_, r, res, _))) =
      Parser.parse("sum_over_time(x[1h:])"): @unchecked
    assert(r == 3600L * 1000000000L && res == 0L)
  }

  test("offset after a subquery folds into every inner selector") {
    val Call(_, Seq(Subquery(Call(_, Seq(sel: Selector)), _, _, _))) =
      Parser.parse("max_over_time(count_over_time(x[5m])[1h:5m] offset 1d)"): @unchecked
    assert(sel.offsetSec == 86400L)
  }

  test("recording-rule names keep their colons") {
    val Selector(m, _, _, _, _) =
      Parser.parse("instance:node_cpu_utilisation:rate5m"): @unchecked
    assert(m.contains("instance:node_cpu_utilisation:rate5m"))
  }

  test("Inf/NaN are number literals") {
    assert(Parser.parse("Inf") == NumLit(Double.PositiveInfinity))
    val NumLit(v) = Parser.parse("NaN"): @unchecked
    assert(v.isNaN)
    val Binary("-", NumLit(z), NumLit(inf), _, _, _, _) =
      Parser.parse("-Inf"): @unchecked
    assert(z == 0.0 && inf.isPosInfinity)
  }

  test("scientific and hex literals") {
    assert(Parser.parse("1e6") == NumLit(1e6))
    assert(Parser.parse("2.5e-3") == NumLit(2.5e-3))
    assert(Parser.parse("0xff") == NumLit(255.0))
  }
}
