package graft.traceql

import org.scalatest.funsuite.AnyFunSuite

import TraceQL._

/** TraceQL parser-breadth corpus (same harvested-corpus discipline as
  * the LogQL/PromQL CorpusSpecs; sources: the Grafana Tempo TraceQL
  * documentation examples). Every supported query must parse; every
  * pinned one must reject EXPLICITLY, never silently mis-parse. */
class TraceqlCorpusSpec extends AnyFunSuite {

  private val supported = Seq(
    """{}""",
    """{ resource.service.name = "frontend" }""",
    """{ span.http.method = "GET" }""",
    """{ .http.status_code = 200 }""",
    """{ span.http.status_code >= 400 }""",
    """{ span.http.status_code >= 400 && span.http.status_code < 500 }""",
    """{ duration > 2s }""",
    """{ duration >= 300ms }""",
    """{ status = error }""",
    """{ status != ok }""",
    """{ kind = server }""",
    """{ name = "HTTP POST" }""",
    """{ name =~ "GET /api/.*" }""",
    """{ name !~ "healthz|metrics" }""",
    """{ resource.service.name = "frontend" && status = error }""",
    """{ span.region = "eu" || span.region = "us" }""",
    """{ .k = "7" }""",
    """{ span.k >= 50 }""",
    """{ resource.service.name = "app" && span.k != 3 }""",
    // structural + pipeline (beyond the reference subset)
    """{ resource.service.name = "gateway" } >> { status = error }""",
    """{ name = "checkout" } > { span.db = "true" }""",
    """{ status = error } << { name = "purchase" }""",
    """{ resource.service.name = "api" } | count() > 3""",
    """{ resource.service.name = "api" } | avg(duration) > 100ms""",
    // spanset set algebra (round 6)
    """{ name = "a" } && { name = "b" }""",
    """{ name = "a" } || { duration > 150ms }""",
    """{ name = "a" } && { name = "b" } | count() >= 2""",
    // duration equality (Tempo grammar allows it) — round 6
    """{ duration = 2s }""",
    """{ duration != 100 }""",
    // metrics second-stage
    """{ status = error } | rate() by (resource.service.name)""")

  private val pinnedUnsupported = Seq(
    """{ span.x ^ 3 }""",                // not a condition
    """name = "no-braces"""")

  for ((q, i) <- supported.zipWithIndex)
    test(f"corpus supported #$i%02d: ${q.take(60)}") {
      if (q.contains("| count") || q.contains("| avg") ||
          q.contains(">>") || q.contains(" > {") || q.contains("<<") ||
          q.contains("} &&") || q.contains("} ||"))
        TraceQL.parseExpr(q)
      else if (q.contains("| rate"))
        TraceQL.parseMetrics(q)
      else TraceQL.parse(q)
    }

  for ((q, i) <- pinnedUnsupported.zipWithIndex)
    test(f"corpus pinned-unsupported #$i%02d: ${q.take(60)}") {
      intercept[Unsupported] {
        TraceQL.parseExpr(q)
      }
    }

  test("numeric coercion and enum shapes parse to the right conditions") {
    val Seq(n) = TraceQL.parse("""{ span.http.status_code >= 400 }""")
    assert(n == NumCmp("span.http.status_code", ">=", 400.0))
    val Seq(e) = TraceQL.parse("""{ status = error }""")
    assert(e == EnumEq("status", "error", negated = false))
    val Seq(r) = TraceQL.parse("""{ name =~ "GET /.*" }""")
    assert(r == ReMatch("name", "GET /.*", negated = false))
    val Seq(d) = TraceQL.parse("""{ duration > 1500 }""")
    assert(d == DurCmp(">", 1500L))
  }
}
