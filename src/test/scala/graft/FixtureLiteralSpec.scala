package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate against data-coupled fixture literals creeping into operator
  * bodies: day spines and phantom-tail clamps must derive from the data
  * (Tables.eventsDayBounds / Footers.timestampMicrosRange), so the same
  * operator is correct on ANY dataset — not just the driver testdata.
  * (Explicit query-window parameters in the language-surface fixtures —
  * e.g. a LogQL query pinned to "Jan 2024" — are user inputs, not
  * operator logic, and stay allowed.) */
class FixtureLiteralSpec extends AnyFunSuite {

  private def sources(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
      if (f.isDirectory) sources(f)
      else if (f.getName.endsWith(".scala")) Seq(f)
      else Seq.empty
    }

  private def read(f: java.io.File): String = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  test("no epoch-day fixture literal (19752) anywhere in main sources") {
    val offenders = sources(new java.io.File("src/main/scala"))
      .filter(f => read(f).contains("19752"))
    assert(offenders.isEmpty,
      s"data-coupled last-day literal found in: ${offenders.map(_.getName).mkString(", ")}")
  }

  test("CoreOps derives its spines from data, not the fixture epoch") {
    val text = read(new java.io.File("src/main/scala/graft/operators/CoreOps.scala"))
    assert(!text.contains("1704067200"),
      "CoreOps must not pin the events fixture epoch — use svcDaySpine/eventsDayBounds")
  }
}
