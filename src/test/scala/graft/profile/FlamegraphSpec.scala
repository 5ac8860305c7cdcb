package graft.profile

import org.scalatest.funsuite.AnyFunSuite

import Flamegraph._

class FlamegraphSpec extends AnyFunSuite {

  // app(10) ─┬─ a(6) ── x(2)
  //          └─ b(3)
  private val nodes = Seq(
    Node(Seq("app"), 10),
    Node(Seq("app", "a"), 6),
    Node(Seq("app", "a", "x"), 2),
    Node(Seq("app", "b"), 3))

  test("levels encode totals, selfs, and delta starts") {
    val e = encodeLevels(nodes)
    assert(e.total == 10)
    assert(e.names == Seq("app", "a", "x", "b"))
    // level 0: [delta 0, total 10, self 1 (=10-6-3), name app]
    assert(e.levels(0) == Seq(0L, 10L, 1L, 0L))
    // level 1: a at 0 (delta 0, total 6, self 4), b at 6 (prevEnd=6 → delta 0)
    assert(e.levels(1) == Seq(0L, 6L, 4L, 1L, 0L, 3L, 3L, 3L))
    // level 2: x under a at 0
    assert(e.levels(2) == Seq(0L, 2L, 2L, 2L))
  }

  test("sibling gaps delta-encode relative to the previous bar end") {
    // two roots: r1(4) with child c(1), r2(5) with child d(5) — d's bar
    // starts at 4+? r2 starts at 4; c occupies [0,1); d starts at 4 →
    // delta from c's end (1) is 3
    val e = encodeLevels(Seq(
      Node(Seq("r1"), 4), Node(Seq("r1", "c"), 1),
      Node(Seq("r2"), 5), Node(Seq("r2", "d"), 5)))
    assert(e.levels(0) == Seq(0L, 4L, 3L, 0L, 0L, 5L, 0L, 2L))
    assert(e.levels(1) == Seq(0L, 1L, 1L, 1L, 3L, 5L, 5L, 3L))
    assert(e.total == 9)
  }

  test("empty input") {
    assert(encodeLevels(Seq.empty).total == 0)
  }

  test("diff encoding: 7-int groups, synthetic total root, per-side offsets") {
    // left: app(10){a(6){x(2)}, b(3)}  right: app(8){a(8){x(4)}} (b absent)
    val e = encodeDiffLevels(Seq(
      DiffNode(Seq("app"), 10, 8),
      DiffNode(Seq("app", "a"), 6, 8),
      DiffNode(Seq("app", "a", "x"), 2, 4),
      DiffNode(Seq("app", "b"), 3, 0)))
    assert(e.leftTicks == 10 && e.rightTicks == 8 && e.total == 18)
    assert(e.names == Seq("total", "app", "a", "b", "x"))
    // root: synthetic "total" with zero selfs
    assert(e.levels(0) == Seq(0L, 10L, 0L, 0L, 8L, 0L, 0L))
    // level 1: app — left self 10-6-3=1, right self 8-8-0=0
    assert(e.levels(1) == Seq(0L, 10L, 1L, 0L, 8L, 0L, 1L))
    // level 2: a (l 6 self 4 / r 8 self 4), then b at left off 6
    // (deltas relative to the previous bar END per side)
    assert(e.levels(2) == Seq(0L, 6L, 4L, 0L, 8L, 4L, 2L,
      0L, 3L, 3L, 0L, 0L, 0L, 3L))
    // level 3: x under a
    assert(e.levels(3) == Seq(0L, 2L, 2L, 0L, 4L, 4L, 4L))
    assert(e.maxSelf == 4L)
  }
}
