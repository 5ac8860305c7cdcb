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
    // a COLOR JPEG (3 components) from the JDK encoder must be rejected,
    // not mis-decoded as gray
    val rgb = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) rgb.setRGB(x, y, x * 1000 + y)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "jpg", buf)
    assert(Jpeg.decodeGray(buf.toByteArray).isEmpty)
  }
}
