package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** TIFF 6.0 baseline: round trips across byte orders / strip layouts /
  * all three baseline compressions, WIRE INTEROP both directions with
  * the JDK's independent ImageIO TIFF plugin, and the fuzz law. */
class TiffSpec extends AnyFunSuite {

  private def gray(x: Int, y: Int, s: Int): Int = (x * 7 + y * 13) % 256
  private def rgb(x: Int, y: Int, s: Int): Int =
    (x * 11 + y * 3 + s * 77) % 256

  test("round trips: gray and RGB, all compressions, both endians, strips") {
    for {
      comp <- Seq(1, 5, 32773)
      le <- Seq(true, false)
      (spp, px) <- Seq((1, gray _), (3, rgb _))
      rps <- Seq(5, 64)
    } {
      val w = 23; val h = 17
      val bytes = Tiff.encode(w, h, spp, px, comp, rps, le)
      val img = Tiff.decode(bytes).get
      assert(img.width == w && img.height == h && img.samplesPerPixel == spp)
      assert(img.compression == comp)
      assert(img.nStrips == (h + rps - 1) / rps)
      for (y <- 0 until h; x <- 0 until w; s <- 0 until spp)
        assert(img.pixels((y * w + x) * spp + s) == px(x, y, s),
          s"comp=$comp le=$le spp=$spp rps=$rps ($x,$y,$s)")
    }
  }

  test("LZW survives dictionary-reset-sized payloads") {
    // > 4094 dictionary entries force the mid-stream Clear path
    val w = 256; val h = 96
    def px(x: Int, y: Int, s: Int) = ((x * x + y * 31 + x * y) % 251)
    val bytes = Tiff.encode(w, h, 1, px, 5, h, littleEndian = true)
    val img = Tiff.decode(bytes).get
    for (y <- 0 until h; x <- 0 until w)
      assert(img.pixels(y * w + x) == px(x, y, 0), s"($x,$y)")
  }

  test("JDK ImageIO reads our BIG LZW TIFF (width-change boundary crossed)") {
    // > 510 dictionary entries force the 9->10->11-bit transitions on
    // the wire; the independent JDK decoder adjudicates the §13 early-
    // change timing
    val w = 256; val h = 96
    def px(x: Int, y: Int, s: Int) = (x * x + y * 31 + x * y) % 251
    val bytes = Tiff.encode(w, h, 1, px, 5, h, littleEndian = true)
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assume(bi != null, "no ImageIO TIFF plugin")
    for (y <- 0 until h; x <- 0 until w)
      assert(bi.getRaster.getSample(x, y, 0) == px(x, y, 0), s"($x,$y)")
  }

  test("we read the JDK's BIG LZW TIFF (same boundary, other direction)") {
    val w = 256; val h = 96
    def px(x: Int, y: Int) = (x * x + y * 31 + x * y) % 251
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, px(x, y))
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("TIFF")
    assume(writers.hasNext, "no ImageIO TIFF writer")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    ios.close(); writer.dispose()
    val img = Tiff.decode(bos.toByteArray)
    assert(img.nonEmpty, "JDK LZW stream must decode")
    for (y <- 0 until h; x <- 0 until w)
      assert(img.get.pixels(y * w + x) == px(x, y), s"($x,$y)")
  }

  test("JDK ImageIO reads our TIFFs (all compressions)") {
    for (comp <- Seq(1, 5, 32773); le <- Seq(true, false)) {
      val w = 31; val h = 14
      val bytes = Tiff.encode(w, h, 1, gray _, comp, 6, le)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assume(bi != null, "no ImageIO TIFF plugin")
      assert(bi.getWidth == w && bi.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(bi.getRaster.getSample(x, y, 0) == gray(x, y, 0),
          s"comp=$comp le=$le ($x,$y)")
    }
    // RGB through ImageIO as well
    val w = 19; val h = 9
    val bytes = Tiff.encode(w, h, 3, rgb _, 5, 4, littleEndian = true)
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assume(bi != null)
    for (y <- 0 until h; x <- 0 until w; s <- 0 until 3)
      assert(bi.getRaster.getSample(x, y, s) == rgb(x, y, s))
  }

  test("we read JDK-ImageIO-written TIFFs (none and LZW)") {
    val w = 27; val h = 12
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, gray(x, y, 0))
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("TIFF")
    assume(writers.hasNext, "no ImageIO TIFF writer")
    for (compName <- Seq(None, Some("LZW"))) {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("TIFF").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      compName.foreach { cn =>
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType(cn)
      }
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
      ios.close(); writer.dispose()
      val img = Tiff.decode(bos.toByteArray)
      assume(img.nonEmpty, s"JDK wrote features outside the baseline scope ($compName)")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.get.pixels(y * w + x) == gray(x, y, 0),
          s"$compName ($x,$y)")
    }
  }

  test("framing violations reject honestly") {
    val bytes = Tiff.encode(20, 10, 1, gray _, 5, 4, littleEndian = true)
    assert(Tiff.decode(Array.emptyByteArray).isEmpty)
    assert(Tiff.decode(bytes.take(6)).isEmpty)
    assert(Tiff.decode(bytes.take(bytes.length / 2)).isEmpty)
    val badMagic = bytes.clone(); badMagic(2) = 43
    assert(Tiff.decode(badMagic).isEmpty)
    val badOrder = bytes.clone(); badOrder(0) = 'X'
    assert(Tiff.decode(badOrder).isEmpty)
  }

  test("bit-flip fuzz never crashes") {
    val bytes = Tiff.encode(33, 21, 3, rgb _, 32773, 7, littleEndian = false)
    var seed = 51L
    for (_ <- 1 to 400) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = bytes.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      Tiff.decode(m) // must not throw
    }
  }
}
