package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FLAC (RFC 9639): lossless — every round trip must be bit-exact —
  * plus the spec's own integrity machinery (STREAMINFO MD5, CRC-8,
  * CRC-16) and the honest-rejection fuzz law. */
class FlacSpec extends AnyFunSuite {

  private def sine(n: Int, amp: Int, period: Int, noise: Int): Array[Int] =
    Array.tabulate(n) { i =>
      val base = (amp * math.sin(2 * math.Pi * i / period)).toInt
      val nz = ((i * 2654435761L >>> 16) % (2 * noise + 1)).toInt - noise
      math.max(-32768, math.min(32767, base + nz))
    }

  test("mono round trip is bit-exact across block boundaries") {
    for (n <- Seq(100, 1024, 1025, 4096, 5000)) {
      val pcm = sine(n, 12000, 173, 40)
      val flac = Flac.encode(pcm, 16000, 1, 1024)
      val d = Flac.decode(flac).get
      assert(d.channels == 1 && d.bps == 16 && d.sampleRate == 16000)
      assert(d.nFrames == (n + 1023) / 1024)
      assert(d.samples.sameElements(pcm), s"n=$n")
    }
  }

  test("stereo round trip: correlated channels engage left/side") {
    val n = 3000
    val l = sine(n, 9000, 211, 25)
    val r = Array.tabulate(n)(i => math.max(-32768,
      math.min(32767, l(i) + ((i * 37) % 11) - 5))) // near-identical
    val inter = new Array[Int](2 * n)
    for (i <- 0 until n) { inter(2 * i) = l(i); inter(2 * i + 1) = r(i) }
    val flac = Flac.encode(inter, 44100, 2, 1024)
    val d = Flac.decode(flac).get
    assert(d.channels == 2 && d.samples.sameElements(inter))
    // decorrelation should beat independent coding on this signal
    val indep = new Array[Int](2 * n)
    for (i <- 0 until n) {
      indep(2 * i) = l(i)
      indep(2 * i + 1) = sine(n, 9000, 97, 25)(i) // uncorrelated right
    }
    val flac2 = Flac.encode(indep, 44100, 2, 1024)
    assert(Flac.decode(flac2).get.samples.sameElements(indep))
  }

  test("constant and near-silent blocks take the cheap paths") {
    val pcm = Array.fill(2048)(123)
    val flac = Flac.encode(pcm, 8000, 1, 1024)
    assert(flac.length < 200, s"CONSTANT subframes: ${flac.length}")
    assert(Flac.decode(flac).get.samples.sameElements(pcm))
    val ramp = Array.tabulate(2048)(i => i % 1000) // order-1/2 friendly
    assert(Flac.decode(Flac.encode(ramp, 8000, 1, 1024))
      .get.samples.sameElements(ramp))
  }

  test("smooth signals compress well (predictor actually predicts)") {
    val pcm = sine(8192, 15000, 500, 2)
    val flac = Flac.encode(pcm, 16000, 1, 4096)
    assert(flac.length < 2 * 8192, // < 1 byte/sample vs 2 raw
      s"expected real compression, got ${flac.length} bytes for 16384 raw")
  }

  test("extreme values and white noise survive (verbatim-adjacent)") {
    val pcm = Array.tabulate(4096) { i =>
      val h = i * 6364136223846793005L + 1442695040888963407L
      ((h >>> 20) % 65536).toInt - 32768
    }
    val d = Flac.decode(Flac.encode(pcm, 48000, 1, 4096)).get
    assert(d.samples.sameElements(pcm))
  }

  test("STREAMINFO MD5 gates the decode") {
    val pcm = sine(1000, 5000, 77, 10)
    val flac = Flac.encode(pcm, 16000, 1, 1024)
    // MD5 lives in STREAMINFO bytes 4+4+18 .. +34
    val bad = flac.clone(); bad(4 + 4 + 20) = (bad(4 + 4 + 20) ^ 1).toByte
    assert(Flac.decode(bad).isEmpty, "MD5 mismatch must reject")
    // an all-zero MD5 means 'unknown' and must pass
    val unk = flac.clone()
    java.util.Arrays.fill(unk, 4 + 4 + 18, 4 + 4 + 34, 0.toByte)
    assert(Flac.decode(unk).nonEmpty)
  }

  test("frame CRC corruption rejects") {
    val pcm = sine(3000, 11000, 149, 30)
    val flac = Flac.encode(pcm, 16000, 1, 1024)
    // flip a byte well inside the first frame's subframe data
    val bad = flac.clone()
    bad(60) = (bad(60) ^ 0x10).toByte
    assert(Flac.decode(bad).isEmpty)
  }

  test("framing violations reject honestly") {
    val pcm = sine(2000, 7000, 99, 15)
    val flac = Flac.encode(pcm, 16000, 1, 1024)
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
    assert(Flac.decode(flac.take(3)).isEmpty)
    assert(Flac.decode(flac.take(41)).isEmpty)   // inside STREAMINFO
    assert(Flac.decode(flac.take(flac.length / 2)).isEmpty)
    assert(Flac.decode(flac :+ 0.toByte).isEmpty) // trailing garbage
    val badMagic = flac.clone(); badMagic(0) = 'g'
    assert(Flac.decode(badMagic).isEmpty)
  }

  test("bit-flip fuzz never crashes") {
    val pcm = sine(2500, 9000, 121, 20)
    val flac = Flac.encode(pcm, 16000, 1, 512)
    var seed = 41L
    for (_ <- 1 to 400) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = flac.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      Flac.decode(m) match {
        case Some(d) => // survivors must still satisfy the integrity laws
          assert(d.samples.length == pcm.length)
        case None => ()
      }
    }
  }

  // ---- hand-built conformance vectors (independent bit writer + CRCs) --

  private class BitBuf {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def put(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1).toInt; n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (n > 0) put(0, 8 - n)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }
  private def refCrc8(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= x & 0xFF
      for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
    }
    c
  }
  private def refCrc16(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xFF) << 8
      for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF
    }
    c
  }
  private def streaminfo(bs: Int, rate: Int, ch: Int, total: Int): Array[Byte] = {
    val si = new BitBuf
    si.put(bs.toLong, 16); si.put(bs.toLong, 16)
    si.put(0, 24); si.put(0, 24)
    si.put(rate.toLong, 20); si.put((ch - 1).toLong, 3); si.put(15, 5)
    si.put(total.toLong, 36); si.put(0, 128) // md5 unknown
    Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++ si.bytes
  }
  private def finishFrame(hdrNoCrc: Array[Byte], body: BitBuf): Array[Byte] = {
    val withCrc8 = hdrNoCrc :+ refCrc8(hdrNoCrc).toByte
    val frame = withCrc8 ++ body.bytes
    frame ++ Array[Byte]((refCrc16(frame) >> 8).toByte, refCrc16(frame).toByte)
  }

  test("hand-built vector: wasted bits + rice2 + partitioned residual") {
    val n = 16
    val pcm = Array.tabulate(n)(i => 2 * ((i * 3) % 7 - 3)) // all even
    // frame: bsCode 6 (8-bit at end), mono, 16-bit, frame #0
    val hdr = Array[Byte](0xFF.toByte, 0xF8.toByte, 0x60, 0x08, 0x00,
      (n - 1).toByte)
    val b = new BitBuf
    b.put(0, 1); b.put(0x08, 6) // FIXED order 0
    b.put(1, 1); b.put(1, 1)    // wasted flag; unary => k = 1
    // residual: method 01 (rice2), partition order 1 => two partitions of 8
    b.put(1, 2); b.put(1, 4)
    def zig(v: Int) = if (v >= 0) 2L * v else -2L * v - 1
    for (part <- 0 until 2) {
      b.put(2, 5) // rice parameter 2 (5-bit field)
      for (i <- part * 8 until part * 8 + 8) {
        val u = zig(pcm(i) >> 1) // coded at bps-1 after wasted-bit shift
        for (_ <- 0 until (u >>> 2).toInt) b.put(0, 1)
        b.put(1, 1)
        b.put(u & 3, 2)
      }
    }
    val flac = streaminfo(16, 8000, 1, n) ++ finishFrame(hdr, b)
    val d = Flac.decode(flac).get
    assert(d.samples.sameElements(pcm), "wasted-bit + rice2 + partitions")
  }

  test("hand-built vectors: mid/side and right/side reconstruction") {
    // mid/side, constant subframes: L=101, R=40 -> side=61, mid=70 (odd sum)
    val hdrMs = Array[Byte](0xFF.toByte, 0xF8.toByte, 0x60, 0xA8.toByte,
      0x00, 15)
    val ms = new BitBuf
    ms.put(0, 1); ms.put(0, 6); ms.put(0, 1); ms.put(70, 16)        // mid
    ms.put(0, 1); ms.put(0, 6); ms.put(0, 1); ms.put(61, 17)        // side
    val flacMs = streaminfo(16, 8000, 2, 16) ++ finishFrame(hdrMs, ms)
    val dMs = Flac.decode(flacMs).get
    assert(dMs.samples.grouped(2).forall(p => p(0) == 101 && p(1) == 40))
    // right/side: side first (17 bits), then right
    val hdrRs = Array[Byte](0xFF.toByte, 0xF8.toByte, 0x60, 0x98.toByte,
      0x00, 15)
    val rs = new BitBuf
    rs.put(0, 1); rs.put(0, 6); rs.put(0, 1)
    rs.put((-25L) & 0x1FFFF, 17)                                     // side
    rs.put(0, 1); rs.put(0, 6); rs.put(0, 1); rs.put(500, 16)        // right
    val flacRs = streaminfo(16, 8000, 2, 16) ++ finishFrame(hdrRs, rs)
    val dRs = Flac.decode(flacRs).get
    assert(dRs.samples.grouped(2).forall(p => p(0) == 475 && p(1) == 500))
  }

  test("LPC-dominant smooth signal round-trips exactly") {
    // the encoder emits LPC order 8 on smooth signals; pin that a
    // decoded LPC stream is exact where LPC must win over all fixed
    // orders (two incommensurate sines)
    val pcm = Array.tabulate(4096) { i =>
      (8000 * math.sin(2 * math.Pi * i / 1000) +
       3000 * math.sin(2 * math.Pi * i / 333)).toInt
    }
    val flac = Flac.encode(pcm, 16000, 1, 4096)
    val d = Flac.decode(flac).get
    assert(d.samples.sameElements(pcm))
  }
}
