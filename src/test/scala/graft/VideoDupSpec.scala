package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws under q390's video near-dup family: the decoded planes match the
  * oracle's closed form for every role, a uniform brightness lift leaves
  * the per-frame gradient-sign hash INVARIANT (role 1 ≡ role 0), and the
  * role-2 last-frame edit stays within the Hamming confirm threshold
  * while touching ONLY the last frame's band.
  */
class VideoDupSpec extends AnyFunSuite {

  /** the oracle's closed-form reconstructed MB luma. */
  private def oracleL(id: Long, f: Int, bx: Int, by: Int): Int = {
    val g = id / 9 * 9; val role = (id / 3) % 3
    val u7 = (((bx - f) % 7) + 7) % 7
    (16L + (13L * u7 * u7 + u7.toLong * ((g % 97) + 7) + 29L * by +
      by.toLong * u7 * ((g % 89) % 13 + 3) +
      (g % 101) * (by + 2) + g * 7) % 224).toInt +
      (if (role == 1) 8 else 0) +
      (if (role == 2 && f == 3 && bx == 0) by % 3 else 0)
  }

  private def planesOf(plan: (Int, Int, Seq[graft.multimodal.Mpeg1.FramePlan]))
      : Vector[Array[Int]] = {
    val (w, h, frames) = plan
    val d = graft.multimodal.Mpeg1.decode(
      graft.multimodal.Mpeg1.encode(w, h, frames)).get
    assert(d.width == 64 && d.height == 64 && d.frames.length == 4)
    d.frames.map(_.y)
  }

  private def decodePlanes(id: Long): Vector[Array[Int]] =
    planesOf(operators.MultimodalOps.videoPlan(id))

  /** the q390 per-frame 12-bit gradient-sign bands off a decoded plane. */
  private def bands(planes: Vector[Array[Int]]): Array[Long] =
    Array.tabulate(4) { f =>
      val y = planes(f)
      var band = 0L
      for (by <- 0 until 4; c <- 0 until 3) {
        val l = y((by * 16 + 8) * 64 + c * 16 + 8)
        val r = y((by * 16 + 8) * 64 + (c + 1) * 16 + 8)
        if (r > l) band |= 1L << (by * 3 + c)
      }
      band
    }

  test("decoded planes match the oracle's closed form for all three roles") {
    // group 36 → lane ids 37 (role 0), 40 (role 1), 43 (role 2)
    for (id <- Seq(37L, 40L, 43L, 1L, 4L, 7L, 109L)) {
      val planes = decodePlanes(id)
      for (f <- 0 until 4; by <- 0 until 4; bx <- 0 until 4) {
        val got = planes(f)((by * 16 + 8) * 64 + bx * 16 + 8)
        assert(got == oracleL(id, f, bx, by), s"id=$id f=$f mb=($bx,$by)")
        // MB-flat: every pixel of the block equals the center sample
        assert(planes(f)(by * 16 * 64 + bx * 16) == got, s"corner id=$id f=$f")
      }
    }
  }

  test("uniform brightness lift leaves every band invariant (role 1 ≡ role 0)") {
    for (g <- Seq(0L, 36L, 90L, 153L)) {
      val b0 = bands(decodePlanes(g + 1))
      val b1 = bands(decodePlanes(g + 4))
      assert(b0.sameElements(b1), s"group $g: brightness changed the hash")
    }
  }

  test("q392 delta classes: exact re-encode hashes identically; near edit stays in the last band") {
    for (g <- Seq(0L, 36L, 90L, 153L)) {
      val corpus0 = bands(decodePlanes(g + 1)) // corpus role 0
      // class 0 (from the role-0 doc): +4 brightness — hash-identical
      val exact = bands(planesOf(
        operators.MultimodalOps.deltaVideoPlan(50000000L + g + 1)))
      assert(exact.sameElements(corpus0), s"group $g: exact class moved the hash")
      // class 1 (from the role-1 doc): un-lifted content with the f=3
      // refresh cell re-authored across its sign boundary — frames 0-2
      // identical to role 0's plane, EXACTLY one bit flips in the last
      // band (deterministically near, never accidentally exact)
      val near = bands(planesOf(
        operators.MultimodalOps.deltaVideoPlan(50000000L + g + 4)))
      assert(near(0) == corpus0(0) && near(1) == corpus0(1) &&
        near(2) == corpus0(2), s"group $g: near class moved an untouched frame")
      assert(java.lang.Long.bitCount(near(3) ^ corpus0(3)) == 1,
        s"group $g: near edit must flip exactly one bit")
    }
  }

  test("role-2 edit flips at most 2 bits, all in the last frame's band") {
    for (g <- Seq(0L, 36L, 90L, 153L)) {
      val b0 = bands(decodePlanes(g + 1))
      val b2 = bands(decodePlanes(g + 7))
      assert(b0(0) == b2(0) && b0(1) == b2(1) && b0(2) == b2(2),
        s"group $g: an untouched frame's band moved")
      assert(java.lang.Long.bitCount(b0(3) ^ b2(3)) <= 2,
        s"group $g: last-frame edit exceeded the designed bit budget")
    }
  }
}
