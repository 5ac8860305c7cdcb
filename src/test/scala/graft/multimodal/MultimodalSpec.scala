package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Container-header decode: real byte-layout parsing (the q277 round
  * trip proves offsets; here the edge paths — multi-segment JPEG walks,
  * truncation, garbage — which must return None, never a guess). */
class MultimodalSpec extends AnyFunSuite {

  test("round trips for all three containers") {
    for ((fmt, w, h) <- Seq(("png", 640, 480), ("jpeg", 1, 65535), ("gif", 16, 16)))
      assert(Multimodal.imageDims(Multimodal.syntheticImage(fmt, w, h))
        .contains((w, h)), s"$fmt $w x $h")
  }

  test("JPEG marker walk skips multiple APPn/COM segments before SOF") {
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    val app1 = Array(0xFF, 0xE1).map(_.toByte) ++ be16(8) ++ Array.fill[Byte](6)(1)
    val com = Array(0xFF, 0xFE).map(_.toByte) ++ be16(5) ++ Array.fill[Byte](3)(2)
    val sof2 = Array(0xFF, 0xC2).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(123) ++ be16(456) ++ Array[Byte](3, 0)
    val buf = Array(0xFF, 0xD8).map(_.toByte) ++ app1 ++ com ++ sof2
    assert(Multimodal.imageDims(buf).contains((456, 123)))
  }

  test("WAV chunk walk and MP4 box walk round trip; junk chunks skipped") {
    assert(Multimodal.wavMeta(Multimodal.syntheticWav(44100, 2))
      .contains((44100, 2)))
    // a LIST chunk before fmt must be skipped by size
    val wav = Multimodal.syntheticWav(16000, 1)
    val withList = wav.take(12) ++
      "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array.fill[Byte](4)(9) ++
      wav.drop(12)
    assert(Multimodal.wavMeta(withList).contains((16000, 1)))
    assert(Multimodal.mp4Meta(Multimodal.syntheticMp4(90000, 12345L))
      .contains((90000, 12345L)))
    assert(Multimodal.wavMeta("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(Multimodal.mp4Meta(Array[Byte](0, 0, 0, 1)).isEmpty)
  }

  test("WAV 16-bit PCM samples decode to exact integer stats") {
    // mixed signs prove the LE16 sign extension: [-3, 0, 5, -32768, 32767]
    val wav = Multimodal.syntheticWavPcm(8000, 1, Seq(-3, 0, 5, -32768, 32767))
    val p = Multimodal.wavPcm(wav).get
    assert(p.sampleRate == 8000 && p.channels == 1 && p.nSamples == 5L)
    assert(p.peak == 32768L)
    assert(p.sumAbs == 3L + 0L + 5L + 32768L + 32767L)
    assert(p.sumSq == 9L + 25L + 32768L * 32768L + 32767L * 32767L)

    // a junk chunk between fmt and data is skipped by size
    val withJunk = wav.take(36) ++
      "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array.fill[Byte](4)(7) ++
      wav.drop(36)
    assert(Multimodal.wavPcm(withJunk).get.sumSq == p.sumSq)

    // non-PCM format (IEEE float = 3) and 8-bit PCM are rejected
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(Multimodal.wavPcm(nonPcm).isEmpty)
    val eightBit = wav.clone(); eightBit(34) = 8
    assert(Multimodal.wavPcm(eightBit).isEmpty)

    // data chunk truncated mid-sample: the partial sample is not read
    val cut = wav.dropRight(1)
    assert(Multimodal.wavPcm(cut).get.nSamples == 4L)
  }

  test("PNG pixels decode exactly through all five scanline filters") {
    // gradient + noise pixels; every row uses a different filter type
    def px(x: Int, y: Int) = ((x * 40 + y) % 256, (255 - x * 3 + y * 7) % 256,
      (x * y + 13) % 256)
    val png = Multimodal.syntheticPng(6, 10, px, y => y % 5)
    val p = Multimodal.pngPixels(png).get
    assert(p.width == 6 && p.height == 10 && p.channels == 3 && p.nPx == 60L)
    val expect = for (y <- 0 until 10; x <- 0 until 6) yield px(x, y)
    assert(p.sumR == expect.map(_._1.toLong).sum)
    assert(p.sumG == expect.map(_._2.toLong).sum)
    assert(p.sumB == expect.map(_._3.toLong).sum)
    val lumas = expect.map { case (r, g, b) => 299L * r + 587L * g + 114L * b }
    assert(p.sumLumaMilli == lumas.sum && p.peakLumaMilli == lumas.max)
    // the fixture is a real PNG: Java's own ImageIO agrees pixel-for-pixel
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 6 && img.getHeight == 10)
    for (y <- 0 until 10; x <- 0 until 6) {
      val rgb = img.getRGB(x, y)
      val (r, g, b) = px(x, y)
      assert(((rgb >> 16) & 0xFF) == r && ((rgb >> 8) & 0xFF) == g &&
        (rgb & 0xFF) == b, s"pixel ($x,$y)")
    }
  }

  test("PNG decode rejects corrupt, truncated, and unsupported shapes") {
    val good = Multimodal.syntheticPng(4, 4, (x, y) => (x, y, x + y), _ => 4)
    assert(Multimodal.pngPixels(good).isDefined)
    // flip one IDAT byte: CRC verification must reject, not mis-decode
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5A).toByte
    assert(Multimodal.pngPixels(corrupt).isEmpty)
    // truncated mid-IDAT
    assert(Multimodal.pngPixels(good.dropRight(16)).isEmpty)
    // header-only fixture (no IDAT): decode has no pixels to return
    assert(Multimodal.pngPixels(Multimodal.syntheticImage("png", 4, 4)).isEmpty)
    // 16-bit depth rejected (patch IHDR depth byte + re-CRC is overkill:
    // corrupting the depth also breaks the CRC, which is itself the point)
    val depth = good.clone(); depth(24) = 16.toByte
    assert(Multimodal.pngPixels(depth).isEmpty)
  }

  test("GIF pixels decode exactly through real LZW (incl. dictionary reuse)") {
    // repetitive pattern → the encoder emits genuine multi-symbol dict
    // codes, so the decoder's dictionary growth and KwKwK paths run
    val palette = (0 until 256).map(i =>
      (i << 16) | (((i * 7) % 256) << 8) | ((i * 13) % 256)).toArray
    def idx(x: Int, y: Int) = (x / 3 + y / 2) % 16 // runs of repeats
    val gif = Multimodal.syntheticGif(24, 10, palette, idx)
    val p = Multimodal.gifPixels(gif).get
    assert(p.width == 24 && p.height == 10 && p.nPx == 240L)
    val expect = for (y <- 0 until 10; x <- 0 until 24) yield palette(idx(x, y))
    assert(p.sumR == expect.map(c => ((c >> 16) & 0xFF).toLong).sum)
    assert(p.sumG == expect.map(c => ((c >> 8) & 0xFF).toLong).sum)
    assert(p.sumB == expect.map(c => (c & 0xFF).toLong).sum)
    // the fixture is a real GIF: Java's own ImageIO agrees pixel-for-pixel
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img.getWidth == 24 && img.getHeight == 10)
    for (y <- 0 until 10; x <- 0 until 24)
      assert((img.getRGB(x, y) & 0xFFFFFF) == palette(idx(x, y)), s"($x,$y)")
    // KwKwK stress: aaa... from a 1-entry-effective palette pattern
    val runs = Multimodal.syntheticGif(64, 3, palette, (_, _) => 7)
    val pr = Multimodal.gifPixels(runs).get
    assert(pr.nPx == 192L && pr.sumR == 192L * 7)
    // dictionary overflow: enough distinct context to pass 4096 entries
    val big = Multimodal.syntheticGif(200, 80, palette,
      (x, y) => (x * 31 + y * 17 + x * y) % 256)
    val pb = Multimodal.gifPixels(big).get
    val bigExpect = for (y <- 0 until 80; x <- 0 until 200)
      yield palette((x * 31 + y * 17 + x * y) % 256)
    assert(pb.sumR == bigExpect.map(c => ((c >> 16) & 0xFF).toLong).sum)
    val bigImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(big))
    for (y <- 0 until 80 by 7; x <- 0 until 200 by 13)
      assert((bigImg.getRGB(x, y) & 0xFFFFFF) ==
        palette((x * 31 + y * 17 + x * y) % 256), s"($x,$y)")
  }

  test("GIF decode rejects truncated and malformed streams") {
    val palette = Array.tabulate(16)(i => i * 0x111111)
    val good = Multimodal.syntheticGif(8, 8, palette, (x, y) => (x + y) % 16)
    assert(Multimodal.gifPixels(good).isDefined)
    assert(Multimodal.gifPixels(good.dropRight(12)).isEmpty)
    // header-only fixture (no image data)
    assert(Multimodal.gifPixels(Multimodal.syntheticImage("gif", 4, 4)).isEmpty)
    assert(Multimodal.gifPixels("GIF8 but not really".getBytes).isEmpty)
  }

  test("garbage and truncated payloads decode to None") {
    assert(Multimodal.imageDims(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.imageDims("not an image at all".getBytes).isEmpty)
    // PNG signature but truncated before IHDR dims
    val cut = Multimodal.syntheticImage("png", 9, 9).take(17)
    assert(Multimodal.imageDims(cut).isEmpty)
    // JPEG SOI with no SOF before the buffer ends
    assert(Multimodal.imageDims(Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)).isEmpty)
  }

  test("decodeFeatures dispatches every container to its real decoder") {
    // png: 2x1, known pixels
    val png = Multimodal.syntheticPng(2, 1,
      (x, _) => if (x == 0) (10, 20, 30) else (0, 0, 255), _ => 0)
    val Some(("png", pf)) = Multimodal.decodeFeatures(png)
    assert(pf.toSeq == Seq(2L, 1L, 2L, 10L, 20L, 285L,
      299L * 10 + 587 * 20 + 114 * 285, 114L * 255))
    // gif: 1 pixel, palette-mapped
    val gif = Multimodal.syntheticGif(1, 1, Array(0x010203), (_, _) => 0)
    val Some(("gif", gf)) = Multimodal.decodeFeatures(gif)
    assert(gf.toSeq == Seq(1L, 1L, 1L, 1L, 2L, 3L,
      299L + 587 * 2 + 114 * 3, 299L + 587 * 2 + 114 * 3))
    // jpeg: block-flat 8x8 gray 100 → exact round trip
    val jpg = Jpeg.encodeGray(8, 8, (_, _) => 100)
    val Some(("jpeg", jf)) = Multimodal.decodeFeatures(jpg)
    assert(jf.toSeq == Seq(8L, 8L, 64L, 6400L, 6400L, 6400L,
      64L * 100000, 100000L))
    // wav: two known samples
    val wav = Multimodal.syntheticWavPcm(8000, 1, Seq(3, -4))
    val Some(("wav", wf)) = Multimodal.decodeFeatures(wav)
    assert(wf.toSeq == Seq(8000L, 1L, 2L, 4L, 7L, 25L,
      math.floor(1000 * math.sqrt(12.5)).toLong, 0L))
    // avi: two block-flat MJPEG frames → exact gray mass + motion
    val f0 = Jpeg.encodeGray(8, 8, (_, _) => 10)
    val f1 = Jpeg.encodeGray(8, 8, (_, _) => 30)
    val avi = Avi.syntheticAvi(8, 8, 40000L, Seq(f0, f1))
    val Some(("avi", af)) = Multimodal.decodeFeatures(avi)
    assert(af.toSeq == Seq(8L, 8L, 2L, 128L, 64L * 10 + 64 * 30,
      64L * 20, 40000L, 0L))
    // payloads no decoder accepts → None, never a guess
    assert(Multimodal.decodeFeatures("plain text, definitely no magic".getBytes).isEmpty)
    assert(Multimodal.decodeFeatures(Array[Byte](1, 2, 3)).isEmpty)
    // RIFF/WAVE magic but truncated body → None (not a fake wav)
    assert(Multimodal.decodeFeatures(wav.take(16)).isEmpty)
  }
}
