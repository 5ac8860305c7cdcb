package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: the block-flat path must be EXACT (DC-only
  * spectra survive any conforming IDCT), the general AC path must agree
  * with the JDK's own libjpeg-based decoder within the small IDCT
  * variance the JPEG standard permits, and malformed/unsupported inputs
  * must reject to None. */
class JpegSpec extends AnyFunSuite {

  test("block-flat images round-trip exactly (incl. non-multiple-of-8 crops)") {
    for ((w, h) <- Seq((16, 16), (20, 13), (8, 8), (9, 25))) {
      def v(x: Int, y: Int) = ((x / 8) * 41 + (y / 8) * 17 + 5) % 256
      val jpg = Jpeg.encodeGray(w, h, v)
      val p = Jpeg.decodeGray(jpg).get
      assert(p.width == w && p.height == h && p.channels == 1)
      val expect = for (y <- 0 until h; x <- 0 until w) yield v(x, y).toLong
      assert(p.sumR == expect.sum, s"$w x $h")
      assert(p.peakLumaMilli == expect.max * 1000)
      // the fixture is a real JPEG: the JDK's decoder agrees exactly on
      // flat blocks (DC-only IDCT is implementation-invariant)
      // raster samples, NOT getRGB — the JDK maps TYPE_BYTE_GRAY through
      // a linear-gray→sRGB color conversion in getRGB (5 becomes 38)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == v(x, y), s"($x,$y) in $w x $h")
    }
  }

  test("general AC blocks agree with the JDK decoder within IDCT tolerance") {
    val w = 32; val h = 24
    def v(x: Int, y: Int) = (x * 11 + y * 7 + (x * y) % 13) % 256
    val jpg = Jpeg.encodeGray(w, h, v)
    val mine = Jpeg.decodeGray(jpg).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img.getWidth == w && img.getHeight == h)
    // per-pixel agreement is only required within the standard's IDCT
    // variance; compare aggregate sums loosely and track the max delta
    // by re-decoding pixel-wise through a second mine-vs-JDK pass
    var sumJdk = 0L
    for (y <- 0 until h; x <- 0 until w) sumJdk += img.getRaster.getSample(x, y, 0)
    assert(math.abs(mine.sumR - sumJdk) <= 2L * w * h,
      s"mine=${mine.sumR} jdk=$sumJdk")
    // quality with all-ones quant tables is near-lossless: the decoded
    // image must stay within ±2 of the SOURCE on average
    var sumSrc = 0L
    for (y <- 0 until h; x <- 0 until w) sumSrc += v(x, y)
    assert(math.abs(mine.sumR - sumSrc) <= 2L * w * h)
  }

  test("unsupported and malformed inputs decode to None") {
    val good = Jpeg.encodeGray(16, 16, (x, y) => (x + y) % 256)
    assert(Jpeg.decodeGray(good).isDefined)
    assert(Jpeg.decodeGray(good.dropRight(10)).isEmpty)   // truncated scan
    assert(Jpeg.decodeGray(good.take(20)).isEmpty)        // truncated headers
    assert(Jpeg.decodeGray(Array[Byte](1, 2, 3)).isEmpty) // not a JPEG
    // a COLOR JPEG (3 components) from the JDK encoder must be rejected
    // by the GRAY decoder (never mis-decoded as gray) — and accepted by
    // the color one
    val rgb = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) rgb.setRGB(x, y, x * 1000 + y)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "jpg", buf)
    assert(Jpeg.decodeGray(buf.toByteArray).isEmpty)
    assert(Jpeg.decodeRgb(buf.toByteArray).isDefined)
  }

  test("MCU-flat COLOR images round-trip exactly through the integer transforms") {
    // 4:4:4 flat 8x8 tiles and 4:2:0 flat 16x16 MCUs: the decoded RGB
    // must equal the closed form ycbcrToRgb(rgbToYcbcr(src)) per pixel
    for ((c420, t, w, h) <- Seq((false, 8, 20, 13), (true, 16, 31, 21),
        (false, 8, 8, 8), (true, 16, 16, 16))) {
      def src(x: Int, y: Int) = (
        ((x / t) * 41 + (y / t) * 17 + 30) % 256,
        ((x / t) * 23 + (y / t) * 31 + 99) % 256,
        ((x / t) * 37 + (y / t) * 7 + 180) % 256)
      val jpg = Jpeg.encodeColor(w, h, src, c420)
      val (dw, dh, r, g, b) = Jpeg.decodeRgb(jpg).get
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (sr, sg, sb) = src(x, y)
        val (yy, cb, cr) = Jpeg.rgbToYcbcr(sr, sg, sb)
        val (er, eg, eb) = Jpeg.ycbcrToRgb(yy, cb, cr)
        assert(r(y * w + x) == er && g(y * w + x) == eg && b(y * w + x) == eb,
          s"($x,$y) c420=$c420 $w x $h")
      }
    }
  }

  test("our color fixtures are standard JPEGs: the JDK decoder agrees on flat MCUs") {
    for (c420 <- Seq(false, true)) {
      val t = if (c420) 16 else 8
      val w = 32; val h = 16
      // 4:2:0 uses a UNIFORM color: the JDK's fancy (triangular) chroma
      // upsampler interpolates across MCU boundaries, so tiled chroma is
      // only comparable between identical upsamplers — a uniform image
      // is upsampling-invariant for every conforming decoder. 4:4:4 has
      // no upsampling, so the tiled pattern compares directly.
      def src(x: Int, y: Int) =
        if (c420) (40, 90, 200)
        else (((x / t) * 19 + 40) % 256, ((y / t) * 53 + 90) % 256, 200)
      val jpg = Jpeg.encodeColor(w, h, src, c420)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      val (_, _, r, g, b) = Jpeg.decodeRgb(jpg).get
      // flat MCUs are upsampling-invariant; only the YCbCr→RGB rounding
      // differs between conforming decoders — allow ±2 per channel
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        assert(math.abs(((p >> 16) & 0xFF) - r(y * w + x)) <= 2, s"r($x,$y)")
        assert(math.abs(((p >> 8) & 0xFF) - g(y * w + x)) <= 2, s"g($x,$y)")
        assert(math.abs((p & 0xFF) - b(y * w + x)) <= 2, s"b($x,$y)")
      }
    }
  }

  test("JDK-encoded color JPEGs decode under our decoder (shared-file compare)") {
    // constant-color image: chroma upsampling strategy differences
    // vanish, so two conforming decoders of the SAME file must agree
    // within the standard's tolerance
    val w = 24; val h = 18
    val img0 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img0.setRGB(x, y, 0x4080C0)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img0, "jpg", buf)
    val jpg = buf.toByteArray
    val (dw, dh, r, g, b) = Jpeg.decodeRgb(jpg).get
    assert(dw == w && dh == h)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    for (y <- 0 until h; x <- 0 until w) {
      val p = jdk.getRGB(x, y)
      assert(math.abs(((p >> 16) & 0xFF) - r(y * w + x)) <= 2, s"r($x,$y)")
      assert(math.abs(((p >> 8) & 0xFF) - g(y * w + x)) <= 2, s"g($x,$y)")
      assert(math.abs((p & 0xFF) - b(y * w + x)) <= 2, s"b($x,$y)")
    }
  }

  // ---- progressive (SOF2) ------------------------------------------------

  /** JDK progressive encode (libjpeg's simple-progression scan script:
    * DC first with Al, spectral-selection AC firsts, then DC and AC
    * REFINEMENT scans — all four progressive scan kinds). */
  private def jdkProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    buf.toByteArray
  }

  private def hasSof2(jpg: Array[Byte]): Boolean =
    jpg.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2)

  test("progressive encode decodes pixel-identically to the sequential encode") {
    // same FDCT, same quantizer, same coefficients — only the scan
    // structure differs, so the two decodes must agree EXACTLY,
    // including non-flat AC blocks and non-multiple-of-8 crops
    for ((w, h) <- Seq((16, 16), (21, 13), (8, 8))) {
      def v(x: Int, y: Int) = (x * 11 + y * 7 + (x * y) % 13) % 256
      val seq = Jpeg.decodeGrayPlane(Jpeg.encodeGray(w, h, v)).get
      val prog = Jpeg.encodeGrayProgressive(w, h, v)
      assert(hasSof2(prog) && !hasSof2(Jpeg.encodeGray(w, h, v)))
      val dec = Jpeg.decodeGrayPlane(prog).get
      assert(dec._1 == w && dec._2 == h)
      assert(dec._3.toSeq == seq._3.toSeq, s"$w x $h diverged")
    }
  }

  test("our progressive stream is standard: the JDK decoder agrees on flat blocks") {
    val w = 20; val h = 13
    def v(x: Int, y: Int) = ((x / 8) * 41 + (y / 8) * 17 + 5) % 256
    val jpg = Jpeg.encodeGrayProgressive(w, h, v)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == v(x, y), s"($x,$y)")
  }

  test("JDK-encoded progressive grayscale decodes under our decoder (±2)") {
    val w = 32; val h = 24
    def v(x: Int, y: Int) = (x * 11 + y * 7 + (x * y) % 13) % 256
    val img0 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img0.getRaster.setSample(x, y, 0, v(x, y))
    val jpg = jdkProgressive(img0)
    assert(hasSof2(jpg), "JDK fixture must actually be progressive")
    val (dw, dh, px) = Jpeg.decodeGrayPlane(jpg).get
    assert(dw == w && dh == h)
    // same file, two conforming decoders: per-pixel within the
    // standard's IDCT variance
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    for (y <- 0 until h; x <- 0 until w)
      assert(math.abs(px(y * w + x) - jdk.getRaster.getSample(x, y, 0)) <= 2,
        s"($x,$y): ours=${px(y * w + x)} jdk=${jdk.getRaster.getSample(x, y, 0)}")
  }

  test("JDK-encoded progressive COLOR decodes under our decoder (uniform fixture)") {
    // constant color so chroma-upsampler differences vanish (the JDK's
    // fancy upsampler interpolates across MCU boundaries)
    val w = 24; val h = 18
    val img0 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img0.setRGB(x, y, 0x4080C0)
    val jpg = jdkProgressive(img0)
    assert(hasSof2(jpg))
    val (dw, dh, r, g, b) = Jpeg.decodeRgb(jpg).get
    assert(dw == w && dh == h)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    for (y <- 0 until h; x <- 0 until w) {
      val p = jdk.getRGB(x, y)
      assert(math.abs(((p >> 16) & 0xFF) - r(y * w + x)) <= 2, s"r($x,$y)")
      assert(math.abs(((p >> 8) & 0xFF) - g(y * w + x)) <= 2, s"g($x,$y)")
      assert(math.abs((p & 0xFF) - b(y * w + x)) <= 2, s"b($x,$y)")
    }
  }

  test("progressive rejections stay honest") {
    val good = Jpeg.encodeGrayProgressive(16, 16, (x, y) => (x + y) % 256)
    assert(Jpeg.decodeGray(good).isDefined)
    assert(Jpeg.decodeGray(good.dropRight(6)).isEmpty) // truncated final scan
    // progressive + restart intervals: still rejected (DRI before SOS)
    val withDri = {
      val out = new java.io.ByteArrayOutputStream()
      // splice a DRI segment right after SOI
      out.write(good, 0, 2)
      out.write(Array[Byte](0xFF.toByte, 0xDD.toByte, 0, 4, 0, 8))
      out.write(good, 2, good.length - 2)
      out.toByteArray
    }
    assert(Jpeg.decodeGray(withDri).isEmpty)
  }

  test("restart intervals: encode+decode parity with plain baseline, JDK agreement, marker checks") {
    // general (non-flat) content across several interval lengths,
    // including ri=1 (a marker between every MCU, full RST0-7 cycling
    // on the 12-block image) and non-multiple-of-8 crops
    for ((w, h, ri) <- Seq((32, 24, 1), (32, 24, 3), (20, 13, 2), (17, 9, 5))) {
      def v(x: Int, y: Int) = (x * 7 + y * 13 + x * y) % 256
      val rjpg = Jpeg.encodeGrayRestart(w, h, v, ri)
      val plain = Jpeg.encodeGray(w, h, v)
      val pR = Jpeg.decodeGray(rjpg).get
      val pP = Jpeg.decodeGray(plain).get
      assert(pR == pP, s"restart decode diverged at $w x $h ri=$ri")
      // the stream is a REAL restart-interval JPEG: the JDK decoder
      // (independent libjpeg lineage) reads it and agrees with its own
      // decode of the plain encoding pixel for pixel
      val jdkR = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rjpg))
      val jdkP = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(plain))
      assert(jdkR.getWidth == w && jdkR.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(jdkR.getRaster.getSample(x, y, 0) ==
          jdkP.getRaster.getSample(x, y, 0), s"JDK($x,$y) ri=$ri")
      // and the DRI segment really is in the stream
      assert(rjpg.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xDD))
    }
    // a WRONG restart marker number is a framing violation, not a guess
    val good = Jpeg.encodeGrayRestart(32, 24, (x, y) => (x + y) % 256, 2)
    val idx = (1 until good.length).find(i => // first real FF D0 pair
      (good(i - 1) & 0xFF) == 0xFF && (good(i) & 0xFF) == 0xD0).get
    val bad = good.clone()
    bad(idx) = 0xD5.toByte // out-of-cycle marker
    assert(Jpeg.decodeGray(bad).isEmpty)
    // truncation inside an interval still rejects
    assert(Jpeg.decodeGray(good.dropRight(8)).isEmpty)
  }

  test("COLOR restart intervals decode through the shared MCU loop, 4:4:4 and 4:2:0") {
    // general (non-flat) color content: restart and plain encodings of
    // the same image must decode identically (all three DC predictors
    // reset per interval), and the JDK decoder agrees with itself on
    // both streams
    def px(x: Int, y: Int) =
      ((x * 11 + y * 3) % 256, (x * 5 + y * 17) % 256, (x * 7 + y * 13 + 64) % 256)
    for ((chroma420, w, h, ri) <- Seq((false, 24, 16, 2), (true, 32, 32, 1),
        (true, 35, 19, 3))) {
      val rjpg = Jpeg.encodeColor(w, h, px, chroma420, restartInterval = ri)
      val plain = Jpeg.encodeColor(w, h, px, chroma420)
      val (wr, hr, rR, gR, bR) = Jpeg.decodeRgb(rjpg).get
      val (wp, hp, rP, gP, bP) = Jpeg.decodeRgb(plain).get
      assert(wr == wp && hr == hp)
      assert(rR.sameElements(rP) && gR.sameElements(gP) && bR.sameElements(bP),
        s"color restart diverged ($w x $h 420=$chroma420 ri=$ri)")
      val jdkR = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rjpg))
      val jdkP = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(plain))
      assert(jdkR.getWidth == w && jdkR.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(jdkR.getRGB(x, y) == jdkP.getRGB(x, y),
          s"JDK($x,$y) 420=$chroma420 ri=$ri")
    }
  }
}
