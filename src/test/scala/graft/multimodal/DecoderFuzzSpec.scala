package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Decoder robustness fuzz: the multimodal contract is "undecodable
  * payloads surface as None/null, never an exception" — web corpora
  * are full of truncated downloads and bit-rotted files, and one
  * crashing payload must not fail a 100 TB scan. Feed every decoder
  * (a) random bytes behind each format's REAL magic, (b) truncations
  * of VALID files at every prefix length band, and (c) random interior
  * bit flips of valid files. Any return is fine; any escaping
  * exception is the failure. */
class DecoderFuzzSpec extends AnyFunSuite {

  // valid fixtures via the JDK encoder (JPEG/PNG/GIF/WAV writers)
  private def encode(fmt: String, w: Int, h: Int,
      rnd: scala.util.Random): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      if (fmt == "gif") java.awt.image.BufferedImage.TYPE_BYTE_INDEXED
      else java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt())
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def wav(n: Int, rnd: scala.util.Random): Array[Byte] = {
    val data = Array.fill(n * 2)(rnd.nextInt(256).toByte)
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(data.length).put(data)
    bb.array()
  }

  private def probe(what: String, bytes: Array[Byte]): Unit =
    try { Multimodal.decodeFeatures(bytes); () }
    catch { case e: Throwable =>
      fail(s"$what: decodeFeatures threw ${e.getClass.getSimpleName}: " +
        s"${e.getMessage} (len=${bytes.length})")
    }

  test("random bytes behind real magics never escape as exceptions") {
    val rnd = new scala.util.Random(7L)
    val magics = Seq[Array[Byte]](
      Array(0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
      "GIF89a".getBytes("ASCII"),
      Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte),
      "RIFF????WAVE".getBytes("ASCII"),
      "RIFF????AVI ".getBytes("ASCII"))
    for (i <- 0 until 600) {
      val m = magics(i % magics.length)
      val body = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      probe(s"magic-garbage#$i", m ++ body)
    }
  }

  test("every truncation of valid png/gif/jpeg/wav decodes or returns None") {
    val rnd = new scala.util.Random(11L)
    val valids = Seq(
      "png" -> encode("png", 9, 7, rnd),
      "gif" -> encode("gif", 8, 6, rnd),
      "jpeg" -> encode("jpg", 17, 13, rnd),
      "wav" -> wav(257, rnd))
    for ((fmt, full) <- valids) {
      probe(s"$fmt-full", full) // sanity: the intact file must not throw
      // every length from 0 to full: truncation can land mid-chunk,
      // mid-Huffman-stream, mid-sample
      for (len <- 0 until full.length)
        probe(s"$fmt-trunc", full.take(len))
    }
  }

  test("animated GIF decode+compose never escapes an exception on fuzzed input") {
    val rnd = new scala.util.Random(17L)
    def probeAnim(what: String, bytes: Array[Byte]): Unit =
      try GifAnim.decode(bytes).foreach(a => { GifAnim.compose(a); () })
      catch { case e: Throwable =>
        fail(s"$what: GifAnim threw ${e.getClass.getSimpleName}: " +
          s"${e.getMessage} (len=${bytes.length})")
      }
    val pal = Array.tabulate(8)(k => k * 0x212121)
    val valid = GifAnim.syntheticAnimatedGif(7, 6, pal, 0, 1, Seq(
      GifAnim.FrameSpec(0, 0, 7, 6, 1, -1, 3, interlaced = false, (x, y) => (x + y) % 8),
      GifAnim.FrameSpec(2, 1, 4, 3, 2, 0, 5, interlaced = true, (x, y) => (x * 3 + y) % 8),
      GifAnim.FrameSpec(1, 2, 5, 2, 3, -1, 4, interlaced = false, (x, y) => (x + 2 * y) % 8)))
    assert(GifAnim.decode(valid).isDefined)
    // interior bit flips: every GCE/descriptor/LZW byte is a target
    for (i <- 0 until 500) {
      val b = valid.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      probeAnim(s"anim-flip#$i", b)
    }
    // random bytes behind the magic
    for (i <- 0 until 300)
      probeAnim(s"anim-garbage#$i", "GIF89a".getBytes("ASCII") ++
        Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte))
  }

  test("interior bit flips of valid files never escape as exceptions") {
    val rnd = new scala.util.Random(13L)
    val valids = Seq(
      "png" -> encode("png", 9, 7, rnd),
      "gif" -> encode("gif", 8, 6, rnd),
      "jpeg" -> encode("jpg", 17, 13, rnd),
      "wav" -> wav(257, rnd))
    for ((fmt, full) <- valids; i <- 0 until 400) {
      val b = full.clone()
      for (_ <- 0 to rnd.nextInt(3)) {
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      probe(s"$fmt-flip#$i", b)
    }
  }

  test("WARC framing: valid files round-trip; truncation/garbage/flips reject with None, never throw") {
    import graft.sources.Warc
    val crlf = "\r\n"
    def rec(typ: String, payload: String, extra: String = ""): String = {
      s"WARC/1.0${crlf}WARC-Type: $typ${crlf}" +
        s"WARC-Record-ID: <urn:uuid:42-$typ>$crlf$extra" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}$crlf" +
        crlf + payload + crlf + crlf
    }
    val http = s"HTTP/1.1 200 OK${crlf}Content-Type: text/html$crlf$crlf<p>hi & bye</p>"
    val valid = (rec("warcinfo", s"software: graft$crlf") +
      rec("request", s"GET / HTTP/1.1$crlf$crlf",
        s"WARC-Target-URI: https://x.example/$crlf") +
      rec("response", http)).getBytes("UTF-8")
    // round trip: framing, header fold to lowercase, payload bytes, http split
    val recs = Warc.parse(valid).get
    assert(recs.map(_.warcType.get) == Vector("warcinfo", "request", "response"))
    assert(recs(1).targetUri.contains("https://x.example/"))
    val (status, hdrs, body) = Warc.httpResponse(recs(2).payload).get
    assert(status == 200 && hdrs("content-type") == "text/html")
    assert(new String(body, "UTF-8") == "<p>hi & bye</p>")
    // a continuation line folds into the previous header value
    val folded = ("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
      "X-Long: part one" + crlf + " part two" + crlf +
      "Content-Length: 0" + crlf + crlf + crlf + crlf).getBytes("UTF-8")
    assert(Warc.parse(folded).get.head.headers("x-long") == "part one part two")
    // EVERY truncation either rejects or lands EXACTLY on a record
    // boundary (a prefix ending at a record separator IS a shorter
    // valid file) — and never throws
    val b1 = rec("warcinfo", s"software: graft$crlf").getBytes("UTF-8").length
    val b2 = b1 + rec("request", s"GET / HTTP/1.1$crlf$crlf",
      s"WARC-Target-URI: https://x.example/$crlf").getBytes("UTF-8").length
    for (n <- 0 until valid.length) {
      val r = Warc.parse(java.util.Arrays.copyOf(valid, n))
      if (n == b1 || n == b2)
        assert(r.isDefined, s"record-boundary prefix $n must parse")
      else assert(r.isEmpty, s"truncation at $n must reject")
    }
    // trailing garbage after a well-formed record rejects the file
    assert(Warc.parse(valid ++ "junk".getBytes("UTF-8")).isEmpty)
    // random garbage and interior bit flips never escape as exceptions
    val rnd = new scala.util.Random(17L)
    for (i <- 0 until 300) {
      val g = "WARC/1.0\r\n".getBytes("UTF-8") ++
        Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      try { Warc.parse(g); () }
      catch { case e: Throwable => fail(s"garbage#$i threw $e") }
    }
    for (i <- 0 until 400) {
      val b = valid.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      try { Warc.parse(b).foreach(_.foreach(r => Warc.httpResponse(r.payload))); () }
      catch { case e: Throwable => fail(s"flip#$i threw $e") }
    }
    // Content-Length lies (short and long) reject rather than misframe
    val lieShort = new String(valid, "ISO-8859-1")
      .replaceFirst("Content-Length: 17", "Content-Length: 16")
    assert(lieShort != new String(valid, "ISO-8859-1"), "fixture drifted")
    assert(Warc.parse(lieShort.getBytes("ISO-8859-1")).isEmpty)
  }

  test("WARC entity decoding: gzip inflates; truncation/unknown/bomb reject with None, flips never throw") {
    import graft.sources.Warc
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val body = "hello <b>world</b> & more".getBytes("UTF-8")
    assert(Warc.decodedBody(Map.empty, body).get.sameElements(body))
    assert(Warc.decodedBody(Map("content-encoding" -> "identity"), body)
      .get.sameElements(body))
    val z = gz(body)
    assert(Warc.decodedBody(Map("content-encoding" -> "gzip"), z)
      .get.sameElements(body))
    // every truncation of the gzip stream rejects (header, deflate
    // blocks and the CRC/ISIZE trailer all fail closed) — never throws
    for (n <- 0 until z.length)
      assert(Warc.decodedBody(Map("content-encoding" -> "gzip"),
        java.util.Arrays.copyOf(z, n)).isEmpty, s"gzip truncated at $n")
    // interior bit flips: any answer, no escaping exception
    val rnd = new scala.util.Random(23L)
    for (i <- 0 until 300) {
      val b = z.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      try { Warc.decodedBody(Map("content-encoding" -> "gzip"), b); () }
      catch { case e: Throwable => fail(s"gzip-flip#$i threw $e") }
    }
    // unknown codings refuse honestly
    assert(Warc.decodedBody(Map("content-encoding" -> "br"), body).isEmpty)
    // a zip bomb (tiny stream inflating past MaxEntityBytes) is cut off
    val bomb = gz(new Array[Byte]((Warc.MaxEntityBytes + 1024).toInt))
    assert(bomb.length < 1024 * 1024, "bomb fixture should compress tiny")
    assert(Warc.decodedBody(Map("content-encoding" -> "gzip"), bomb).isEmpty)
  }

  test("H.264 motion-P streams: every truncation and random flip returns None or a frame, never throws") {
    val base = H264.encode(64, 48, Seq(
      H264.FramePlan((bx, by) => H264.MbI16(40 + bx * 13 + by * 17)),
      H264.FramePlan((_, _) => H264.MbI16(0), pmb = Some((bx, by) =>
        if ((bx + by) % 3 == 0) H264.PSkip else H264.PMove(16, -16, 4))),
      H264.FramePlan((_, _) => H264.MbI16(0), skipAll = true)))
    assert(H264.decode(base).isDefined)
    // every prefix: truncation can land mid-NAL, mid-VLC, mid-escape
    for (n <- 0 until base.length) {
      try { H264.decode(java.util.Arrays.copyOf(base, n)); () }
      catch { case e: Throwable =>
        fail(s"h264 truncated at $n threw ${e.getClass.getSimpleName}") }
    }
    // interior bit flips: any answer, no escaping exception
    val rnd = new scala.util.Random(29L)
    for (i <- 0 until 300) {
      val b = base.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      try { H264.decode(b); () }
      catch { case e: Throwable => fail(s"h264-flip#$i threw $e") }
    }
  }
}
