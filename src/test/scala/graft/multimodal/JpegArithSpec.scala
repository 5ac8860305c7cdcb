package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Arithmetic-coded JPEG (T.81 Annex D QM-coder + §F.1.4/§F.2.4
  * models). No external decoder supports arithmetic JPEG in this
  * container (JDK ImageIO rejects it outright), so correctness rests on
  * two stronger local laws: (1) the randomized QM round-trip campaign —
  * heavily biased decision streams force the carry/0xFF-stuffing edge
  * paths of BYTEOUT/FLUSH — and (2) entropy-layer transparency: the
  * arithmetic and Huffman encodings of one image share FDCT and
  * quantizer, so they MUST decode to bit-identical pixels. */
class JpegArithSpec extends AnyFunSuite {

  /** deterministic xorshift so failures replay. */
  private final class Rng(seed0: Long) {
    private var s = seed0
    def next(): Long = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s
    }
    def int(bound: Int): Int = ((next() >>> 1) % bound).toInt
  }

  test("QM coder round-trips randomized biased decision streams") {
    for (seed <- 1 to 40) {
      val rng = new Rng(seed * 2654435761L)
      val nCtx = 1 + rng.int(8)
      val n = 200 + rng.int(4000)
      // per-context bias; a few contexts extremely skewed so long MPS
      // runs hit the A>=0x8000 fast path and byte-carry chains
      val bias = Array.fill(nCtx)(1 + rng.int(99))
      val ctxs = new Array[Int](n)
      val bits = new Array[Int](n)
      for (k <- 0 until n) {
        ctxs(k) = rng.int(nCtx)
        bits(k) = if (rng.int(100) < bias(ctxs(k))) 1 else 0
      }
      val encStats = JpegArith.freshStats(JpegArith.FixedBin + 1)
      val enc = new JpegArith.Encoder
      for (k <- 0 until n) enc.encode(encStats, ctxs(k), bits(k))
      // a few decisions through the non-adapting fixed bin too
      val tailBits = Array.tabulate(32)(k => (k * 7 + seed) & 1)
      tailBits.foreach(b => enc.encode(encStats, JpegArith.FixedBin, b))
      val ecs = enc.flush()
      // entropy segment must be marker-clean: every 0xFF is 0x00-stuffed
      for (j <- 0 until ecs.length - 1)
        assert((ecs(j) & 0xFF) != 0xFF || ecs(j + 1) == 0,
          s"unstuffed 0xFF at $j (seed $seed)")
      val decStats = JpegArith.freshStats(JpegArith.FixedBin + 1)
      val dec = new JpegArith.Decoder(ecs, 0, ecs.length)
      for (k <- 0 until n)
        assert(dec.decode(decStats, ctxs(k)) == bits(k),
          s"decision $k of $n diverged (seed $seed)")
      tailBits.zipWithIndex.foreach { case (b, k) =>
        assert(dec.decode(decStats, JpegArith.FixedBin) == b,
          s"fixed-bin decision $k diverged (seed $seed)")
      }
    }
  }

  test("block-flat arithmetic images round-trip exactly") {
    for ((w, h) <- Seq((16, 16), (20, 13), (8, 8), (9, 25))) {
      def v(x: Int, y: Int) = ((x / 8) * 41 + (y / 8) * 17 + 5) % 256
      val p = Jpeg.decodeGray(Jpeg.encodeGrayArith(w, h, v)).get
      assert(p.width == w && p.height == h && p.channels == 1)
      val expect = for (y <- 0 until h; x <- 0 until w) yield v(x, y).toLong
      assert(p.sumR == expect.sum, s"$w x $h")
      assert(p.peakLumaMilli == expect.max * 1000)
    }
  }

  test("entropy-layer transparency: arithmetic decode == Huffman decode") {
    for (seed <- 1 to 10) {
      val rng = new Rng(seed * 0x9E3779B97F4A7C15L)
      val w = 8 + rng.int(40); val h = 8 + rng.int(32)
      // general images: full AC path, both codings share the FDCT
      def v(x: Int, y: Int) =
        (x * (3 + seed) + y * 7 + (x * y) % (5 + seed)) % 256
      val a = Jpeg.decodeGrayPlane(Jpeg.encodeGrayArith(w, h, v)).get
      val b = Jpeg.decodeGrayPlane(Jpeg.encodeGray(w, h, v)).get
      assert(a._1 == b._1 && a._2 == b._2)
      assert(java.util.Arrays.equals(a._3, b._3),
        s"pixels diverged at $w x $h (seed $seed)")
    }
  }

  test("adaptive coder beats static Huffman on a smooth gradient") {
    val w = 128; val h = 96
    def v(x: Int, y: Int) = ((x + y) / 4) % 256
    val arith = Jpeg.encodeGrayArith(w, h, v)
    val huff = Jpeg.encodeGray(w, h, v)
    // header overheads differ (DAC vs two DHTs); compare whole files —
    // the adaptive QM coder should still win comfortably here
    assert(arith.length < huff.length,
      s"arithmetic ${arith.length} B vs Huffman ${huff.length} B")
  }

  test("truncation and garbage reject to None, never a crash") {
    def v(x: Int, y: Int) = (x * 11 + y * 3) % 256
    val jpg = Jpeg.encodeGrayArith(24, 16, v)
    val whole = Jpeg.decodeGray(jpg).get
    for (cut <- Seq(2, 8, 20, jpg.length / 2, jpg.length - 1)) {
      val r = Jpeg.decodeGray(jpg.take(cut))
      // a truncated ENTROPY segment can still zero-feed to a full image
      // (tail bits are implicit zeros in Annex D) — but truncation
      // before the scan header must reject
      if (cut < 30) assert(r.isEmpty, s"cut $cut")
    }
    val rng = new Rng(42)
    for (trial <- 1 to 50) {
      val mutated = jpg.clone()
      val at = rng.int(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rng.int(8))).toByte
      Jpeg.decodeGray(mutated) // any Option outcome; must not throw
    }
    assert(whole.nPx == 24 * 16)
    // restart intervals inside an arithmetic frame: honest rejection —
    // splice a DRI segment in front of the SOS of a real file
    val sosAt = {
      var k = 2
      while (!((jpg(k) & 0xFF) == 0xFF && (jpg(k + 1) & 0xFF) == 0xDA)) k += 1
      k
    }
    val dri = Array(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x02).map(_.toByte)
    val spliced = jpg.take(sosAt) ++ dri ++ jpg.drop(sosAt)
    assert(Jpeg.decodeGray(spliced).isEmpty, "DRI + SOF9 must reject")
  }

  test("SOF10 progressive-arithmetic: all four scan models round-trip") {
    for (seed <- 1 to 8) {
      val rng = new Rng(seed * 0x9E3779B97F4A7C15L)
      val w = 8 + rng.int(40); val h = 8 + rng.int(32)
      def v(x: Int, y: Int) =
        (x * (5 + seed) + y * 11 + (x * y) % (7 + seed)) % 256
      val prog = Jpeg.decodeGrayPlane(
        Jpeg.encodeGrayProgressiveArith(w, h, v)).get
      val seq = Jpeg.decodeGrayPlane(Jpeg.encodeGray(w, h, v)).get
      assert(prog._1 == seq._1 && prog._2 == seq._2)
      assert(java.util.Arrays.equals(prog._3, seq._3),
        s"SOF10 pixels diverged at $w x $h (seed $seed)")
    }
  }

  test("SOF10 block-flat images round-trip exactly") {
    for ((w, h) <- Seq((16, 16), (20, 13), (9, 25))) {
      def v(x: Int, y: Int) = ((x / 8) * 41 + (y / 8) * 17 + 5) % 256
      val p = Jpeg.decodeGray(Jpeg.encodeGrayProgressiveArith(w, h, v)).get
      val expect = for (y <- 0 until h; x <- 0 until w) yield v(x, y).toLong
      assert(p.sumR == expect.sum, s"$w x $h")
    }
  }

  test("SOF10 truncation/garbage rejects or decodes cleanly, never crashes") {
    def v(x: Int, y: Int) = (x * 7 + y * 3) % 256
    val jpg = Jpeg.encodeGrayProgressiveArith(24, 16, v)
    for (cut <- Seq(3, 12, 40, jpg.length / 2, jpg.length - 1))
      Jpeg.decodeGray(jpg.take(cut)) // any Option; must not throw
    val rng = new Rng(777)
    for (_ <- 1 to 50) {
      val mutated = jpg.clone()
      val at = rng.int(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rng.int(8))).toByte
      Jpeg.decodeGray(mutated) // must not throw
    }
  }
}
