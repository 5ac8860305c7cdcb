package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Lossless JPEG (SOF3, T.81 Annex H): predictive coding must
  * reconstruct ARBITRARY images bit-exactly — no block/IDCT tolerance
  * story at all — across all seven predictors. */
class JpegLosslessSpec extends AnyFunSuite {

  test("arbitrary images round-trip exactly across all 7 predictors") {
    for (sel <- 1 to 7; (w, h) <- Seq((1, 1), (17, 9), (32, 24), (5, 40))) {
      def v(x: Int, y: Int) =
        (x * 37 + y * 101 + (x * y) % 29 + sel * 13) % 256
      val jpg = Jpeg.encodeGrayLossless(w, h, v, sel)
      val (dw, dh, px) = Jpeg.decodeGrayPlane(jpg).get
      assert(dw == w && dh == h, s"sel=$sel $w x $h")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == v(x, y), s"($x,$y) sel=$sel $w x $h")
    }
  }

  test("extreme values (0/255 checkerboards, ramps) survive predictor 4") {
    // predictor 4 (a+b-c) can predict far outside [0,255]; the coded
    // difference must still reconstruct exactly
    val w = 16; val h = 16
    def checker(x: Int, y: Int) = if (((x + y) & 1) == 0) 0 else 255
    val (_, _, px) =
      Jpeg.decodeGrayPlane(Jpeg.encodeGrayLossless(w, h, checker, 4)).get
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) == checker(x, y))
  }

  test("decodeGray stats match the exact pixel fold") {
    def v(x: Int, y: Int) = (x * 3 + y * 7) % 256
    val p = Jpeg.decodeGray(Jpeg.encodeGrayLossless(20, 10, v, 5)).get
    val expect = for (y <- 0 until 10; x <- 0 until 20) yield v(x, y).toLong
    assert(p.sumR == expect.sum && p.nPx == 200)
    assert(p.peakLumaMilli == expect.max * 1000)
  }

  test("malformed lossless streams reject honestly") {
    def v(x: Int, y: Int) = (x + y * 5) % 256
    val jpg = Jpeg.encodeGrayLossless(24, 16, v, 3)
    for (cut <- Seq(2, 10, 40, jpg.length / 2))
      assert(Jpeg.decodeGray(jpg.take(cut)).isEmpty, s"cut $cut")
    // a bad predictor selector (Ss = 0) must reject: locate the SOS
    val sosAt = {
      var k = 2
      while (!((jpg(k) & 0xFF) == 0xFF && (jpg(k + 1) & 0xFF) == 0xDA)) k += 1
      k
    }
    val badSel = jpg.clone()
    badSel(sosAt + 2 + 3 + 2) = 0 // Ss byte inside the 1-component SOS
    assert(Jpeg.decodeGray(badSel).isEmpty, "Ss=0 must reject")
    var seed = 99L
    for (_ <- 1 to 50) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val mutated = jpg.clone()
      val at = ((seed >>> 16) % mutated.length).toInt.abs
      mutated(at) = (mutated(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      Jpeg.decodeGray(mutated) // must not throw
    }
  }
}
