package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** APNG: composition semantics (dispose NONE/BACKGROUND/PREVIOUS,
  * blend SOURCE/OVER incl. fractional alpha), sequence/CRC discipline,
  * and the honest-rejection fuzz law. */
class ApngSpec extends AnyFunSuite {

  private def opaque(r: Int, g: Int, b: Int): (Int, Int, Int, Int) =
    (r, g, b, 255)

  test("single full-canvas frame round-trips pixel-exactly") {
    val w = 9; val h = 7
    val f0 = Apng.FrameSpec(0, 0, w, h, 0, 0, 4, 100,
      (x, y) => (x * 20 % 256, y * 30 % 256, (x + y) % 256, 255))
    val a = Apng.decode(Apng.encode(w, h, 0, Seq(f0))).get
    assert(a.width == w && a.height == h && a.canvases.length == 1)
    for (y <- 0 until h; x <- 0 until w) {
      val px = a.canvases(0)(y * w + x)
      assert(((px >> 16) & 0xFF) == x * 20 % 256)
      assert(((px >> 8) & 0xFF) == y * 30 % 256)
      assert((px & 0xFF) == (x + y) % 256)
      assert(((px >>> 24) & 0xFF) == 255)
    }
  }

  test("dispose PREVIOUS reverts, dispose BACKGROUND clears") {
    val w = 8; val h = 6
    val base = Apng.FrameSpec(0, 0, w, h, 0, 0, 1, 10,
      (_, _) => opaque(10, 20, 30))
    // frame 1 paints a patch, dispose PREVIOUS -> frame 2 sees base again
    val f1 = Apng.FrameSpec(2, 1, 3, 2, 2, 0, 1, 10, (_, _) => opaque(200, 0, 0))
    // frame 2 paints another patch, dispose BACKGROUND -> frame 3 sees hole
    val f2 = Apng.FrameSpec(4, 3, 2, 2, 1, 0, 1, 10, (_, _) => opaque(0, 200, 0))
    val f3 = Apng.FrameSpec(0, 0, 1, 1, 0, 0, 1, 10, (_, _) => opaque(1, 2, 3))
    val a = Apng.decode(Apng.encode(w, h, 2, Seq(base, f1, f2, f3))).get
    assert(a.numPlays == 2 && a.canvases.length == 4)
    val c1 = a.canvases(1); val c2 = a.canvases(2); val c3 = a.canvases(3)
    assert(((c1(1 * w + 2) >> 16) & 0xFF) == 200)      // patch visible in f1
    assert(((c2(1 * w + 2) >> 16) & 0xFF) == 10)       // reverted by PREVIOUS
    assert(((c2(3 * w + 4) >> 8) & 0xFF) == 200)       // f2 patch visible
    assert(c3(3 * w + 4) == 0)                          // cleared by BACKGROUND
    assert(((c3(0) >> 16) & 0xFF) == 1)                 // f3 painted
    assert(((c3(5 * w + 7) >> 16) & 0xFF) == 10)        // base elsewhere
  }

  test("blend OVER: binary alpha is exact conditional copy") {
    val w = 6; val h = 4
    val base = Apng.FrameSpec(0, 0, w, h, 0, 0, 1, 10,
      (_, _) => opaque(100, 100, 100))
    val f1 = Apng.FrameSpec(1, 1, 4, 2, 0, 1, 1, 10,
      (x, y) => if ((x + y) % 2 == 0) (250, 5, 5, 255) else (9, 9, 9, 0))
    val a = Apng.decode(Apng.encode(w, h, 0, Seq(base, f1))).get
    val c = a.canvases(1)
    for (y <- 1 until 3; x <- 1 until 5) {
      val px = c(y * w + x)
      if ((x + y) % 2 == 0) assert(((px >> 16) & 0xFF) == 250)
      else assert(((px >> 16) & 0xFF) == 100) // transparent src keeps dst
    }
  }

  test("blend OVER: fractional alpha matches the float formula within 1") {
    val w = 5; val h = 5
    val base = Apng.FrameSpec(0, 0, w, h, 0, 0, 1, 10,
      (x, y) => (40 + x, 50 + y, 60, 255))
    val f1 = Apng.FrameSpec(0, 0, w, h, 0, 1, 1, 10,
      (x, y) => (200, 20, 100, 30 + 40 * ((x + y) % 5)))
    val a = Apng.decode(Apng.encode(w, h, 0, Seq(base, f1))).get
    val c = a.canvases(1)
    for (y <- 0 until h; x <- 0 until w) {
      val sa = (30 + 40 * ((x + y) % 5)) / 255.0
      def blend(sc: Int, dc: Int): Double = sc * sa + dc * (1 - sa)
      val px = c(y * w + x)
      assert(math.abs(((px >> 16) & 0xFF) - blend(200, 40 + x)) <= 1.0)
      assert(math.abs(((px >> 8) & 0xFF) - blend(20, 50 + y)) <= 1.0)
      assert(math.abs((px & 0xFF) - blend(100, 60)) <= 1.0)
      assert(((px >>> 24) & 0xFF) == 255) // opaque dst stays opaque
    }
  }

  test("still-PNG (no acTL) and framing violations reject honestly") {
    val w = 7; val h = 5
    val frames = Seq(
      Apng.FrameSpec(0, 0, w, h, 0, 0, 1, 10, (x, y) => opaque(x, y, 1)),
      Apng.FrameSpec(1, 1, 2, 2, 1, 0, 1, 10, (_, _) => opaque(7, 8, 9)))
    val apng = Apng.encode(w, h, 0, frames)
    assert(Apng.decode(Array.emptyByteArray).isEmpty)
    assert(Apng.decode(apng.take(30)).isEmpty)
    assert(Apng.decode(apng.take(apng.length - 4)).isEmpty) // no IEND
    assert(Apng.decode(apng ++ Array[Byte](0)).isEmpty)     // trailing
    val badCrc = apng.clone()
    badCrc(apng.length - 20) = (badCrc(apng.length - 20) ^ 1).toByte
    assert(Apng.decode(badCrc).isEmpty)
    // a plain PNG without acTL must not decode as an animation
    val still = Multimodal.syntheticPng(16, 8,
      (x, y) => ((x * 3 + y) % 256, x % 256, y % 256), _ => 0)
    assert(Apng.decode(still).isEmpty)
    assert(Multimodal.pngPixels(still).nonEmpty, "still PNG sanity")
  }

  test("frame-count / sequence discipline") {
    val w = 6; val h = 6
    val frames = Seq(
      Apng.FrameSpec(0, 0, w, h, 0, 0, 1, 10, (_, _) => opaque(5, 5, 5)),
      Apng.FrameSpec(0, 0, 2, 2, 0, 0, 1, 10, (_, _) => opaque(9, 9, 9)),
      Apng.FrameSpec(3, 3, 2, 2, 0, 0, 1, 10, (_, _) => opaque(4, 4, 4)))
    val apng = Apng.encode(w, h, 0, frames)
    assert(Apng.decode(apng).get.canvases.length == 3)
    // drop the LAST fcTL+fdAT pair wholesale: count mismatch must reject
    def findChunk(b: Array[Byte], typ: String, from: Int): Int = {
      var i = from
      while (i + 8 <= b.length) {
        if (new String(b, i + 4, 4, "US-ASCII") == typ) return i
        val len = ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
          ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        i += 12 + len
      }
      -1
    }
    val lastFctl = {
      var at = findChunk(apng, "fcTL", 8); var nxt = at
      while ({ nxt = findChunk(apng, "fcTL", at + 1); nxt >= 0 }) at = nxt
      at
    }
    val iend = findChunk(apng, "IEND", 8)
    val chopped = apng.take(lastFctl) ++ apng.drop(iend)
    assert(Apng.decode(chopped).isEmpty, "fcTL count != acTL num_frames")
  }

  test("bit-flip fuzz never crashes") {
    val w = 10; val h = 8
    val frames = Seq(
      Apng.FrameSpec(0, 0, w, h, 0, 0, 1, 10, (x, y) => opaque(x * 9, y * 7, 3)),
      Apng.FrameSpec(2, 2, 5, 4, 2, 1, 1, 10,
        (x, y) => (x * 31 % 256, y * 17 % 256, 8, (x * y * 29) % 256)))
    val apng = Apng.encode(w, h, 1, frames)
    var seed = 77L
    for (_ <- 1 to 400) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = apng.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      Apng.decode(m) // must not throw
    }
  }
}
