package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Animated GIF: inter-frame composition semantics proven against
  * hand-written expected canvases (disposal 1/2/3, transparency,
  * interlace) and the decoder cross-checked frame-by-frame against the
  * JDK's independent ImageIO GIF reader. */
class GifAnimSpec extends AnyFunSuite {

  private val pal = Array(0x000000, 0xFF0000, 0x00FF00, 0x0000FF,
    0xFFFFFF, 0x808080, 0x123456, 0xABCDEF)

  private def anim(sw: Int, sh: Int, specs: Seq[GifAnim.FrameSpec],
      bg: Int = 0, loop: Int = 0): GifAnim.Anim = {
    val bytes = GifAnim.syntheticAnimatedGif(sw, sh, pal, bg, loop, specs)
    val a = GifAnim.decode(bytes)
    assert(a.isDefined, "decode failed")
    a.get
  }

  test("disposal 1 accumulates: a sub-rect patch persists under later patches") {
    // 4×3 canvas: frame0 = all red(1); frame1 = 2×1 green(2) patch at
    // (1,1); frame2 = 1×1 blue(3) at (3,0). Expected canvases written
    // out by hand, no shared compositor.
    val a = anim(4, 3, Seq(
      GifAnim.FrameSpec(0, 0, 4, 3, 1, -1, 5, interlaced = false, (_, _) => 1),
      GifAnim.FrameSpec(1, 1, 2, 1, 1, -1, 6, interlaced = false, (_, _) => 2),
      GifAnim.FrameSpec(3, 0, 1, 1, 1, -1, 7, interlaced = false, (_, _) => 3)))
    val c = GifAnim.compose(a)
    val R = 0xFF0000; val G = 0x00FF00; val B = 0x0000FF
    assert(c(0).toSeq == Seq(R, R, R, R, R, R, R, R, R, R, R, R))
    assert(c(1).toSeq == Seq(R, R, R, R, R, G, G, R, R, R, R, R))
    assert(c(2).toSeq == Seq(R, R, R, B, R, G, G, R, R, R, R, R))
    assert(a.frames.map(_.delayCs) == Vector(5, 6, 7))
    assert(a.loopCount.contains(0))
  }

  test("disposal 2 restores the frame rect to background before the next frame") {
    // bg index 4 (white). frame0 full gray(5), disposal 1; frame1 red
    // 2×2 at (0,0) with disposal 2; frame2 tiny blue at (3,2): by then
    // frame1's rect must be WHITE (background), not gray or red.
    val a = anim(4, 3, Seq(
      GifAnim.FrameSpec(0, 0, 4, 3, 1, -1, 2, interlaced = false, (_, _) => 5),
      GifAnim.FrameSpec(0, 0, 2, 2, 2, -1, 2, interlaced = false, (_, _) => 1),
      GifAnim.FrameSpec(3, 2, 1, 1, 1, -1, 2, interlaced = false, (_, _) => 3)),
      bg = 4)
    val c = GifAnim.compose(a)
    val W = 0xFFFFFF; val Y = 0x808080; val R = 0xFF0000; val B = 0x0000FF
    assert(c(1).toSeq == Seq(R, R, Y, Y, R, R, Y, Y, Y, Y, Y, Y))
    assert(c(2).toSeq == Seq(W, W, Y, Y, W, W, Y, Y, Y, Y, Y, B))
  }

  test("disposal 3 restores the canvas to its pre-frame state") {
    // frame0 full red disposal 1; frame1 full green disposal 3; frame2
    // 1×1 blue: the green frame must vanish entirely, red returns.
    val a = anim(2, 2, Seq(
      GifAnim.FrameSpec(0, 0, 2, 2, 1, -1, 2, interlaced = false, (_, _) => 1),
      GifAnim.FrameSpec(0, 0, 2, 2, 3, -1, 2, interlaced = false, (_, _) => 2),
      GifAnim.FrameSpec(0, 0, 1, 1, 1, -1, 2, interlaced = false, (_, _) => 3)))
    val c = GifAnim.compose(a)
    val R = 0xFF0000; val G = 0x00FF00; val B = 0x0000FF
    assert(c(1).toSeq == Seq(G, G, G, G))
    assert(c(2).toSeq == Seq(B, R, R, R))
  }

  test("a transparent index never overwrites the canvas") {
    // frame0 full red; frame1 full-rect patch of green where (x+y)
    // even, transparent(0) where odd → red shows through the holes
    val a = anim(3, 2, Seq(
      GifAnim.FrameSpec(0, 0, 3, 2, 1, -1, 2, interlaced = false, (_, _) => 1),
      GifAnim.FrameSpec(0, 0, 3, 2, 1, 0, 2, interlaced = false,
        (x, y) => if ((x + y) % 2 == 0) 2 else 0)))
    val c = GifAnim.compose(a)
    val R = 0xFF0000; val G = 0x00FF00
    assert(c(1).toSeq == Seq(G, R, G, R, G, R))
  }

  test("interlaced frames decode to the same indices as progressive ones") {
    def spec(inter: Boolean) = GifAnim.FrameSpec(0, 0, 7, 11, 1, -1, 3,
      interlaced = inter, (x, y) => (x * 3 + y * 5) % pal.length)
    val plain = anim(7, 11, Seq(spec(false)))
    val inter = anim(7, 11, Seq(spec(true)))
    assert(inter.frames.head.interlaced)
    assert(plain.frames.head.indices.toSeq == inter.frames.head.indices.toSeq)
    assert(GifAnim.compose(plain).head.toSeq ==
      GifAnim.compose(inter).head.toSeq)
  }

  test("frame rects and count cross-check against the JDK ImageIO GIF reader") {
    // the interlaced frame is ≥8 rows tall so all four passes are
    // non-empty: the JDK reader consumes a data row for an EMPTY pass
    // (h < 5) instead of skipping it per the spec pass order — our
    // decoder is spec-correct there (the interlace test above pins the
    // small-height order), so the cross-check uses the regime where
    // the two agree
    val specs = Seq(
      GifAnim.FrameSpec(0, 0, 9, 12, 1, -1, 4, interlaced = false,
        (x, y) => (x + y * 2) % pal.length),
      GifAnim.FrameSpec(2, 1, 5, 4, 1, 0, 8, interlaced = false,
        (x, y) => (x * y + 3) % pal.length),
      GifAnim.FrameSpec(1, 2, 6, 9, 1, -1, 12, interlaced = true,
        (x, y) => (x * 5 + y) % pal.length))
    val bytes = GifAnim.syntheticAnimatedGif(9, 12, pal, 0, 2, specs)
    val a = GifAnim.decode(bytes).get
    val it = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
    assert(it.hasNext, "JDK GIF reader missing")
    val reader = it.next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) == 3)
    for (fi <- 0 until 3) {
      val img = reader.read(fi)
      val f = a.frames(fi)
      assert(img.getWidth == f.w && img.getHeight == f.h, s"frame $fi dims")
      for (y <- 0 until f.h; x <- 0 until f.w) {
        val ci = f.indices(y * f.w + x) & 0xFF
        val argb = img.getRGB(x, y)
        if (ci == f.transparent)
          assert((argb >>> 24) == 0, s"frame $fi ($x,$y) should be transparent")
        else {
          assert((argb >>> 24) == 0xFF, s"frame $fi ($x,$y) should be opaque")
          assert((argb & 0xFFFFFF) == f.palette(ci),
            s"frame $fi ($x,$y): jdk=${argb & 0xFFFFFF}%06x ours=${f.palette(ci)}%06x")
        }
      }
    }
    reader.dispose()
    assert(a.loopCount.contains(2))
  }

  test("a single-frame animation agrees with the gifPixels fast path") {
    def idx(x: Int, y: Int) = (x * 7 + y * 3) % pal.length
    val single = Multimodal.syntheticGif(8, 6, pal, idx)
    val multi = GifAnim.syntheticAnimatedGif(8, 6, pal, 0, 0,
      Seq(GifAnim.FrameSpec(0, 0, 8, 6, 1, -1, 1, interlaced = false, idx)))
    val ps = Multimodal.gifPixels(single).get
    val canvas = GifAnim.compose(GifAnim.decode(multi).get).head
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    canvas.foreach { rgb =>
      sumR += (rgb >> 16) & 0xFF; sumG += (rgb >> 8) & 0xFF; sumB += rgb & 0xFF
    }
    assert((ps.sumR, ps.sumG, ps.sumB) == ((sumR, sumG, sumB)))
    // and gifPixels itself reads the ANIMATED stream's first frame
    val psAnim = Multimodal.gifPixels(multi).get
    assert((psAnim.sumR, psAnim.sumG, psAnim.sumB) == ((sumR, sumG, sumB)))
  }

  test("malformed streams refuse loudly: out-of-screen rects, truncation") {
    val ok = GifAnim.syntheticAnimatedGif(4, 4, pal, 0, 0,
      Seq(GifAnim.FrameSpec(0, 0, 4, 4, 1, -1, 1, interlaced = false, (_, _) => 1)))
    assert(GifAnim.decode(ok).isDefined)
    // truncations at every prefix either decode (a shorter valid tail
    // is impossible here) or return None — never throw
    for (n <- 0 until ok.length)
      assert(GifAnim.decode(java.util.Arrays.copyOf(ok, n)).isEmpty)
    // a frame rect escaping the logical screen
    val bad = ok.clone()
    // image descriptor starts after header(13) + GCT(8*3) + NETSCAPE(19)
    // + GCE(8): find 0x2C and widen the rect bytes
    val di = bad.indexOf(0x2C.toByte)
    bad(di + 5) = 9 // width LE16 low byte: 9 > screen 4
    assert(GifAnim.decode(bad).isEmpty)
  }

  test("cumulative decode bounds: a small stream cannot demand huge memory") {
    // 3 one-pixel frames on a 2^26-px logical screen: the stream is a
    // few hundred bytes, but compose() would retain 3 full canvases
    // (>2^27 px). The decoder must reject it, not decode-then-OOM.
    val huge = GifAnim.syntheticAnimatedGif(8192, 8192, pal, 0, 0,
      (1 to 3).map(_ =>
        GifAnim.FrameSpec(0, 0, 1, 1, 1, -1, 1, interlaced = false, (_, _) => 1)))
    assert(GifAnim.decode(huge).isEmpty)
    // the same frames on a small screen stay decodable
    val small = GifAnim.syntheticAnimatedGif(4, 4, pal, 0, 0,
      (1 to 3).map(_ =>
        GifAnim.FrameSpec(0, 0, 1, 1, 1, -1, 1, interlaced = false, (_, _) => 1)))
    assert(GifAnim.decode(small).exists(_.frames.length == 3))
  }
}
