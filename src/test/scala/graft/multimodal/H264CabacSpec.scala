package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** CABAC laws: the arithmetic engine must be a bit-exact
  * encoder/decoder pair under arbitrary context/bypass/terminate
  * schedules, the LPS tables must satisfy the spec's structural
  * invariants, the probability estimator must actually ADAPT, and the
  * I-slice macroblock layer must reconstruct the same planes as the
  * CAVLC coder from a very different byte stream. The init-constant
  * cut is stated in [[H264Cabac]]'s scaladoc; everything tested here
  * is the normative machinery that cut does not touch. */
class H264CabacSpec extends AnyFunSuite {

  test("rangeTabLPS structure: quartile growth, state decay, spec anchors") {
    val t = H264Cabac.RangeTabLPS
    assert(t.length == 64 && t.forall(_.length == 4))
    assert(t(0).toSeq == Seq(128, 176, 208, 240), "state-0 anchor row")
    assert(t(63).toSeq == Seq(2, 2, 2, 2), "terminate floor row")
    for (s <- 0 until 64; q <- 0 until 4) {
      assert(t(s)(q) >= 2 && t(s)(q) <= 240, s"bounds at ($s,$q)")
      if (q > 0 && s < 63)
        assert(t(s)(q) > t(s)(q - 1), s"quartile growth at ($s,$q)")
      if (s > 0)
        assert(t(s)(q) <= t(s - 1)(q), s"state decay at ($s,$q)")
    }
  }

  test("transIdxLPS structure: falls or holds, MPS rises to 62, state 63 fixed") {
    val t = H264Cabac.TransIdxLPS
    assert(t.length == 64)
    assert(t(0) == 0 && t(1) == 0, "states 0/1 floor at 0")
    assert(t(63) == 63, "terminate state is a fixed point")
    for (s <- 1 until 63)
      assert(t(s) < s, s"an LPS at state $s must fall (got ${t(s)})")
  }

  test("engine round-trip: random decision/bypass/terminate schedules are bit-exact") {
    val rnd = new scala.util.Random(11L)
    for (trial <- 1 to 20) {
      val n = 200 + rnd.nextInt(2000)
      // a schedule: (kind, ctxIdx, bin) — kinds 0=decision 1=bypass
      val sched = Vector.fill(n)((rnd.nextInt(2), rnd.nextInt(16),
        rnd.nextInt(2)))
      val e = new H264Cabac.Enc
      val ecx = new H264Cabac.Ctxs(16)
      sched.foreach {
        case (0, c, b) => e.decision(ecx, c, b)
        case (_, _, b) => e.bypass(b)
      }
      e.terminate(1)
      val bytes = e.flush()
      var pos = 0
      val d = new H264Cabac.Dec(() => {
        // reads past the payload only hit the zero padding the flush
        // wrote; a genuinely truncated stream throws in the slice layer
        val byteI = pos >> 3
        val v = if (byteI < bytes.length)
          (bytes(byteI) >> (7 - (pos & 7))) & 1 else 0
        pos += 1; v
      })
      val dcx = new H264Cabac.Ctxs(16)
      sched.foreach {
        case (0, c, b) =>
          assert(d.decision(dcx, c) == b, s"trial $trial decision drift")
        case (_, _, b) =>
          assert(d.bypass() == b, s"trial $trial bypass drift")
      }
      assert(d.terminate() == 1, s"trial $trial terminate drift")
      assert(ecx.state.toSeq == dcx.state.toSeq,
        s"trial $trial context state drift")
    }
  }

  test("the estimator adapts: a heavily biased source codes far below 1 bit/bin") {
    val rnd = new scala.util.Random(13L)
    val n = 20000
    val bins = Vector.fill(n)(if (rnd.nextInt(100) < 97) 0 else 1)
    val e = new H264Cabac.Enc
    val cx = new H264Cabac.Ctxs(1)
    bins.foreach(b => e.decision(cx, 0, b))
    e.terminate(1)
    val bits = e.flush().length * 8
    assert(bits < n / 3, s"no adaptation: $bits bits for $n 97%-biased bins")
  }

  test("CABAC I frames reconstruct the plan exactly; CAVLC and CABAC planes agree") {
    val w = 64; val h = 48
    def g(f: Int)(bx: Int, by: Int): Int = 16 + (bx * 37 + by * 53 + f * 11) % 224
    val frames = (0 until 3).map { f =>
      H264.FramePlan((bx, by) =>
        (bx + by + f) % 4 match {
          case 0 => H264.MbI4(g(f)(bx, by))
          case 1 if by > 0 => H264.MbI16(g(f)(bx, by), mode = 0)
          case 2 if bx > 0 => H264.MbI16(g(f)(bx, by), mode = 1)
          case _ => H264.MbI16(g(f)(bx, by), mode = 2)
        })
    }
    val cavlc = H264.encode(w, h, frames)
    val cabac = H264.encode(w, h, frames, cabac = true)
    assert(cavlc.toSeq != cabac.toSeq, "the two entropy coders must differ")
    val d1 = H264.decode(cavlc).get
    val d2 = H264.decode(cabac).get
    assert(d2.width == w && d2.height == h && d2.frames.length == 3)
    for (f <- 0 until 3) {
      assert(d1.frames(f).y.toSeq == d2.frames(f).y.toSeq,
        s"frame $f: CAVLC and CABAC planes diverge")
      assert(d2.frames(f).cb.forall(_ == 128) && d2.frames(f).cr.forall(_ == 128))
    }
  }

  test("CABAC handles extreme levels through the unbounded UEG0 suffix") {
    // the 16↔240 checkerboard drives levels past the CAVLC escape
    // ranges; CABAC's EG0 bypass suffix has no table bound at all
    val w = 64; val h = 64
    def g(bx: Int, by: Int): Int = if ((bx + by) % 2 == 0) 16 else 240
    val plan = H264.FramePlan((bx, by) =>
      if ((bx + by) % 3 == 0) H264.MbI4(g(bx, by)) else H264.MbI16(g(bx, by)))
    val d = H264.decode(H264.encode(w, h, Seq(plan), cabac = true)).get
    val expect = Array.tabulate(w * h)(i =>
      math.max(0, math.min(255, g((i % w) / 16, (i / w) / 16))))
    assert(d.frames(0).y.toSeq == expect.toSeq)
  }

  test("CABAC P slices are out of subset: the encoder refuses, streams stay honest") {
    val w = 48; val h = 32
    val i = H264.FramePlan((bx, by) => H264.MbI16(60 + bx * 7 + by * 3))
    val p = H264.FramePlan((_, _) => H264.MbI16(0), skipAll = true)
    intercept[IllegalArgumentException] {
      H264.encode(w, h, Seq(i, p), cabac = true)
    }
  }

  test("CABAC bit-flip fuzz never crashes and mostly rejects") {
    val base = H264.encode(64, 48, Seq(
      H264.FramePlan((bx, by) => if ((bx + by) % 2 == 0)
        H264.MbI4(40 + 10 * bx) else H264.MbI16(200 - 9 * by))), cabac = true)
    assert(H264.decode(base).isDefined)
    val rnd = new scala.util.Random(47L)
    var rejected = 0
    for (_ <- 1 to 400) {
      val b = base.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      if (H264.decode(b).isEmpty) rejected += 1 // and never crashes
    }
    assert(rejected > 150, s"fuzz too permissive: only $rejected/400 rejected")
    // truncations: every prefix returns None or a frame, never throws
    for (n <- 0 until base.length) {
      try { H264.decode(java.util.Arrays.copyOf(base, n)); () }
      catch { case e: Throwable =>
        fail(s"cabac truncated at $n threw ${e.getClass.getSimpleName}") }
    }
  }
}
