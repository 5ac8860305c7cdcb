package graft.multimodal

/** FLAC codec (RFC 9639 / xiph.org FLAC format) — the lossless audio
  * format real speech/music corpora are distributed in (LibriSpeech,
  * Common Voice exports). Completes the audio family next to the RIFF
  * WAV walk ([[Multimodal.wavPcm]]): a training pipeline ingesting an
  * audio corpus meets FLAC long before raw WAV.
  *
  * Public format only, transcribed from the spec like the arithmetic
  * JPEG coder (no FLAC implementation exists in this container; parity
  * laws + the spec's own integrity fields carry conformance):
  *
  *  - stream = "fLaC", STREAMINFO metadata block (incl. the MD5 of the
  *    raw interleaved little-endian PCM — decode verifies it), frames;
  *  - frame = 14-bit sync + blocking strategy, coded block-size /
  *    sample-rate / channel-assignment / sample-size, UTF-8-style coded
  *    frame number, CRC-8 over the header, per-channel subframes,
  *    bit padding, CRC-16 over the whole frame;
  *  - subframe = CONSTANT | VERBATIM | FIXED order 0-4 | LPC order
  *    1-32 (quantized integer predictor, arithmetic-shift division),
  *    with the wasted-bits unary prefix;
  *  - residual = Rice coding, 4-bit (method 0) or 5-bit (method 1)
  *    parameters, 2^po partitions, raw-bits escape code;
  *  - stereo decorrelation: independent, left/side, right/side,
  *    mid/side (side subframes carry bps+1 bits).
  *
  * The encoder emits CONSTANT / FIXED(0-4) / LPC(8) subframes (chosen
  * by residual cost), left/side decorrelation when it wins, and Rice
  * parameters by exhaustive search; the decoder accepts the full
  * grammar above. Strictness contract (DecoderFuzzSpec law): any sync,
  * CRC, count, MD5 or grammar violation rejects with None — honest
  * rejection, never a crash.
  */
object Flac {

  val MaxSamples = 1 << 24

  // ---- CRCs (FLAC §9: CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0) ----

  private val crc8Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i; var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
      t(i) = c & 0xFF; i += 1
    }
    t
  }
  private val crc16Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8; var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1; k += 1 }
      t(i) = c & 0xFFFF; i += 1
    }
    t
  }
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Tab(c ^ (b(i) & 0xFF)); i += 1 }
    c
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc16Tab(((c >> 8) ^ (b(i) & 0xFF)) & 0xFF) ^ ((c << 8) & 0xFFFF); i += 1 }
    c & 0xFFFF
  }

  // ---- MSB-first bit I/O ------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def put(v: Long, bits: Int): Unit = {
      var left = bits
      while (left > 0) {
        val take = math.min(left, 56 - nBits)
        acc = (acc << take) | ((v >>> (left - take)) & ((1L << take) - 1))
        nBits += take; left -= take
        while (nBits >= 8) {
          out.write(((acc >>> (nBits - 8)) & 0xFF).toInt)
          nBits -= 8
        }
      }
    }
    def putSigned(v: Int, bits: Int): Unit = put(v.toLong & ((1L << bits) - 1), bits)
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def align(): Unit = if (nBits % 8 != 0) put(0, 8 - nBits % 8)
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BitReader(val bytes: Array[Byte], var pos: Int) {
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(): Int = {
      if (pos >= bytes.length) throw Truncated
      val v = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def read(bits: Int): Long = {
      var v = 0L; var i = 0
      while (i < bits) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(bits: Int): Int = {
      val u = read(bits)
      val sh = 64 - bits
      ((u << sh).toLong >> sh).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) { q += 1; if (q > MaxSamples) throw Truncated }
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }
  private object Truncated extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  // ---- fixed predictors (FLAC §10.2.2) ----------------------------------

  /** residual of fixed order k at position i over history s (i >= k). */
  private def fixedResidual(s: Array[Int], i: Int, k: Int): Long = k match {
    case 0 => s(i)
    case 1 => s(i).toLong - s(i - 1)
    case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
    case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
    case _ => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) - 4L * s(i - 3) + s(i - 4)
  }
  private def fixedRestore(s: Array[Int], i: Int, k: Int, e: Long): Long = k match {
    case 0 => e
    case 1 => e + s(i - 1)
    case 2 => e + 2L * s(i - 1) - s(i - 2)
    case 3 => e + 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
    case _ => e + 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
  }

  // ---- Rice helpers ------------------------------------------------------

  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else (-v << 1) - 1
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1)

  private def bestRiceParam(res: Array[Long], from: Int, until: Int): (Int, Long) = {
    var best = 0; var bestBits = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var bits = 0L; var i = from
      while (i < until) { bits += (zigzag(res(i)) >>> p) + 1 + p; i += 1 }
      if (bits < bestBits) { bestBits = bits; best = p }
      p += 1
    }
    (best, bestBits)
  }

  // ---- encoder -----------------------------------------------------------

  /** quantized LPC via Levinson-Durbin; returns (coefs, shift) or None
    * when the block is degenerate (constant / tiny). */
  private def lpcAnalyze(s: Array[Int], order: Int, precision: Int):
      Option[(Array[Int], Int)] = {
    val n = s.length
    if (n <= order * 2) return None
    val r = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var acc = 0.0; var i = lag
      while (i < n) { acc += s(i).toDouble * s(i - lag); i += 1 }
      r(lag) = acc; lag += 1
    }
    if (r(0) == 0.0) return None
    val a = new Array[Double](order + 1)
    var err = r(0)
    var m = 1
    while (m <= order) {
      var acc = r(m)
      var j = 1
      while (j < m) { acc -= a(j) * r(m - j); j += 1 }
      if (err == 0.0) return None
      val k = acc / err
      a(m) = k
      var lo = 1
      val half = new Array[Double](m)
      while (lo < m) { half(lo) = a(lo) - k * a(m - lo); lo += 1 }
      lo = 1
      while (lo < m) { a(lo) = half(lo); lo += 1 }
      err *= (1 - k * k)
      if (err <= 0.0) return None
      m += 1
    }
    val maxC = (1 to order).map(j => math.abs(a(j))).max
    if (maxC == 0.0 || maxC.isNaN || maxC.isInfinite) return None
    var shift = precision - 1 - (math.getExponent(maxC) + 1)
    if (shift > 15) shift = 15
    if (shift < 0) return None
    val q = new Array[Int](order)
    var carry = 0.0
    var j = 1
    while (j <= order) {
      val ideal = a(j) * (1L << shift) + carry
      var v = math.round(ideal).toInt
      val lim = (1 << (precision - 1)) - 1
      if (v > lim) v = lim
      if (v < -lim - 1) v = -lim - 1
      carry = ideal - v
      q(j - 1) = v
      j += 1
    }
    Some((q, shift))
  }

  private def lpcResidual(s: Array[Int], coefs: Array[Int], shift: Int,
      i: Int): Long = {
    var pred = 0L; var j = 0
    while (j < coefs.length) { pred += coefs(j).toLong * s(i - 1 - j); j += 1 }
    s(i).toLong - (pred >> shift)
  }

  /** one subframe for channel data `s` at `bps` effective bits. */
  private def writeSubframe(bw: BitWriter, s: Array[Int], bps: Int): Unit = {
    val n = s.length
    val const = n > 0 && s.forall(_ == s(0))
    if (const) {
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1) // CONSTANT, no wasted bits
      bw.putSigned(s(0), bps)
      return
    }
    // candidate: best fixed order 0..4
    var bestK = 0; var bestKBits = Long.MaxValue
    var bestKRes: Array[Long] = null
    var k = 0
    while (k <= 4) {
      if (n > k) {
        val res = new Array[Long](n - k)
        var i = k
        var ok = true
        while (i < n) {
          val e = fixedResidual(s, i, k)
          if (e < Int.MinValue.toLong * 2 || e > Int.MaxValue.toLong * 2) ok = false
          res(i - k) = e; i += 1
        }
        if (ok) {
          val (_, bits) = bestRiceParam(res, 0, res.length)
          val total = bits + k.toLong * bps
          if (total < bestKBits) { bestKBits = total; bestK = k; bestKRes = res }
        }
      }
      k += 1
    }
    // candidate: LPC order 8, precision 12
    val order = math.min(8, math.max(1, n / 4))
    val lpc = lpcAnalyze(s, order, 12).flatMap { case (coefs, shift) =>
      val res = new Array[Long](n - order)
      var i = order
      while (i < n) { res(i - order) = lpcResidual(s, coefs, shift, i); i += 1 }
      val (_, bits) = bestRiceParam(res, 0, res.length)
      val total = bits + order.toLong * bps + 4 + 5 + order.toLong * 12
      if (total < bestKBits) Some((coefs, shift, res, total)) else None
    }
    bw.put(0, 1)
    lpc match {
      case Some((coefs, shift, res, _)) =>
        bw.put(0x20L | (coefs.length - 1), 6) // 1xxxxx LPC
        bw.put(0, 1)                          // no wasted bits
        var i = 0
        while (i < coefs.length) { bw.putSigned(s(i), bps); i += 1 }
        bw.put(11, 4)                         // precision 12 → code 11
        bw.put(shift.toLong, 5)
        i = 0
        while (i < coefs.length) { bw.putSigned(coefs(i), 12); i += 1 }
        writeResidual(bw, res)
      case None =>
        bw.put(0x08L | bestK, 6)              // 001xxx FIXED
        bw.put(0, 1)
        var i = 0
        while (i < bestK) { bw.putSigned(s(i), bps); i += 1 }
        writeResidual(bw, bestKRes)
    }
  }

  private def writeResidual(bw: BitWriter, res: Array[Long]): Unit = {
    bw.put(0, 2) // method 0: 4-bit Rice parameters
    bw.put(0, 4) // partition order 0
    val (p, _) = bestRiceParam(res, 0, res.length)
    bw.put(p.toLong, 4)
    var i = 0
    while (i < res.length) {
      val u = zigzag(res(i))
      bw.putUnary((u >>> p).toInt)
      if (p > 0) bw.put(u & ((1L << p) - 1), p)
      i += 1
    }
  }

  /** UTF-8-style coded number (frame ordinal), FLAC §9.1.5. */
  private def writeCodedNumber(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    if (v < 0x80) { out.write(v.toInt); return }
    var bytes = 2
    while (bytes < 7 && v >= (1L << (bytes * 5 + 1))) bytes += 1
    out.write((0xFF00 >> bytes) & 0xFF | (v >>> ((bytes - 1) * 6)).toInt)
    var i = bytes - 2
    while (i >= 0) { out.write(0x80 | ((v >>> (i * 6)) & 0x3F).toInt); i -= 1 }
  }

  /** encode 16-bit PCM (`samples` interleaved when `channels` = 2) as a
    * FLAC stream; left/side decorrelation is chosen per frame when it
    * costs less. */
  def encode(samples: Array[Int], sampleRate: Int, channels: Int,
      blockSize: Int): Array[Byte] = {
    require(channels == 1 || channels == 2, "mono or stereo")
    require(samples.length % channels == 0)
    require(blockSize >= 16 && blockSize <= 65535)
    require(sampleRate > 0 && sampleRate < (1 << 20))
    val bps = 16
    val nTotal = samples.length / channels
    require(nTotal > 0 && nTotal <= MaxSamples)
    samples.foreach(s => require(s >= -32768 && s <= 32767, "16-bit range"))
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // ---- STREAMINFO (last metadata block, type 0, length 34) ----
    val si = new BitWriter
    si.put(blockSize.toLong, 16); si.put(blockSize.toLong, 16)
    si.put(0, 24); si.put(0, 24)             // frame sizes unknown
    si.put(sampleRate.toLong, 20)
    si.put((channels - 1).toLong, 3)
    si.put((bps - 1).toLong, 5)
    si.put(nTotal.toLong, 36)
    val md = java.security.MessageDigest.getInstance("MD5")
    samples.foreach { s => md.update((s & 0xFF).toByte); md.update(((s >> 8) & 0xFF).toByte) }
    val md5 = md.digest()
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.toBytes); out.write(md5)
    // ---- frames ----
    var frameNo = 0L
    var off = 0
    while (off < nTotal) {
      val bs = math.min(blockSize, nTotal - off)
      val hdr = new java.io.ByteArrayOutputStream()
      hdr.write(0xFF); hdr.write(0xF8) // sync + fixed blocking strategy
      // block size code 0111 (16-bit at end), sample rate from STREAMINFO
      hdr.write(0x70)
      val (chans, chanCode) =
        if (channels == 1)
          (Seq(Array.tabulate(bs)(i => samples(off + i))), 0)
        else {
          val l = Array.tabulate(bs)(i => samples((off + i) * 2))
          val r = Array.tabulate(bs)(i => samples((off + i) * 2 + 1))
          val side = Array.tabulate(bs)(i => l(i) - r(i))
          // crude decorrelation gain proxy: first-difference mass
          def cost(a: Array[Int]) = {
            var c = 0L; var i = 1
            while (i < a.length) { c += math.abs(a(i).toLong - a(i - 1)); i += 1 }
            c
          }
          if (cost(side) < cost(r)) (Seq(l, side), 8) else (Seq(l, r), 1)
        }
      hdr.write((chanCode << 4) | (4 << 1)) // sample size code 100 = 16
      writeCodedNumber(hdr, frameNo)
      hdr.write(((bs - 1) >> 8) & 0xFF); hdr.write((bs - 1) & 0xFF)
      val hb = hdr.toByteArray
      val frame = new java.io.ByteArrayOutputStream()
      frame.write(hb)
      frame.write(crc8(hb, 0, hb.length))
      val bw = new BitWriter
      chans.zipWithIndex.foreach { case (cd, idx) =>
        val effBps = if (chanCode == 8 && idx == 1) bps + 1 else bps
        writeSubframe(bw, cd, effBps)
      }
      frame.write(bw.toBytes)
      val fb = frame.toByteArray
      val c16 = crc16(fb, 0, fb.length)
      out.write(fb)
      out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
      off += bs
      frameNo += 1
    }
    out.toByteArray
  }

  // ---- decoder -----------------------------------------------------------

  final case class Decoded(sampleRate: Int, channels: Int, bps: Int,
      samples: Array[Int], nFrames: Int, md5Ok: Boolean)

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decodeImpl(bytes)
    catch {
      case Truncated => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def decodeImpl(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
        bytes(2) != 'a' || bytes(3) != 'C') return None
    // ---- metadata walk: STREAMINFO must be first ----
    var i = 4
    var last = false
    var first = true
    var sampleRate = 0; var channels = 0; var bps = 0
    var nTotal = 0L
    var minBlock = 0; var maxBlock = 0
    var md5 = new Array[Byte](16)
    while (!last) {
      if (i + 4 > bytes.length) return None
      val h = bytes(i) & 0xFF
      last = (h & 0x80) != 0
      val btype = h & 0x7F
      val len = ((bytes(i + 1) & 0xFF) << 16) | ((bytes(i + 2) & 0xFF) << 8) |
        (bytes(i + 3) & 0xFF)
      if (first && btype != 0) return None
      if (btype == 127) return None // invalid block type
      if (i + 4 + len > bytes.length) return None
      if (btype == 0) {
        if (!first || len != 34) return None
        val br = new BitReader(bytes, i + 4)
        minBlock = br.read(16).toInt; maxBlock = br.read(16).toInt
        br.read(24); br.read(24)
        sampleRate = br.read(20).toInt
        channels = br.read(3).toInt + 1
        bps = br.read(5).toInt + 1
        nTotal = br.read(36)
        md5 = java.util.Arrays.copyOfRange(bytes, i + 4 + 18, i + 4 + 34)
        if (sampleRate == 0 || minBlock < 16 || maxBlock < minBlock) return None
        if (bps < 8 || bps > 24) return None // 4-7 and 32 out of scope
        if (channels > 8) return None
        if (nTotal <= 0 || nTotal > MaxSamples) return None
      }
      first = false
      i += 4 + len
    }
    if (channels == 0) return None
    // ---- frames ----
    val outSamples = new Array[Int]((nTotal * channels).toInt)
    var got = 0L
    var nFrames = 0
    while (got < nTotal) {
      if (i + 5 > bytes.length) return None
      val frameStart = i
      if ((bytes(i) & 0xFF) != 0xFF || (bytes(i + 1) & 0xFC) != 0xF8)
        return None // sync + reserved bit; variable blocking rejected below
      val variable = (bytes(i + 1) & 1) != 0
      val bsCode = (bytes(i + 2) >> 4) & 0xF
      val srCode = bytes(i + 2) & 0xF
      val chanCode = (bytes(i + 3) >> 4) & 0xF
      val ssCode = (bytes(i + 3) >> 1) & 0x7
      if ((bytes(i + 3) & 1) != 0) return None // reserved
      i += 4
      // coded number (frame or sample ordinal)
      val b0 = bytes(i) & 0xFF
      var extra = 0
      if (b0 >= 0x80) {
        var mask = 0x40
        while ((b0 & mask) != 0) { extra += 1; mask >>= 1 }
        if (extra == 0 || extra > 6) return None
      }
      var j = 0
      while (j < extra) {
        if ((bytes(i + 1 + j) & 0xC0) != 0x80) return None
        j += 1
      }
      i += 1 + extra
      val bs = bsCode match {
        case 0 => return None
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => val v = (bytes(i) & 0xFF) + 1; i += 1; v
        case 7 =>
          val v = (((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)) + 1
          i += 2; v
        case c => 256 << (c - 8)
      }
      srCode match {
        case 0 => ()
        case 12 => i += 1
        case 13 | 14 => i += 2
        case 15 => return None
        case _ => () // table-coded rates carry no extra bytes
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case _ => return None
      }
      if (frameBps != bps) return None
      val nCh = if (chanCode < 8) chanCode + 1
        else if (chanCode <= 10) 2
        else return None
      if (nCh != channels) return None
      val hdrCrc = bytes(i) & 0xFF
      if (crc8(bytes, frameStart, i) != hdrCrc) return None
      i += 1
      if (variable) return None // encoder scope: fixed blocking streams
      val remaining = nTotal - got
      if (bs > remaining) return None
      if (bs > maxBlock) return None
      // ---- subframes ----
      val br = new BitReader(bytes, i)
      val chanData = new Array[Array[Int]](nCh)
      var c = 0
      while (c < nCh) {
        val sideBoost = chanCode match {
          case 8 => if (c == 1) 1 else 0  // left/side
          case 9 => if (c == 0) 1 else 0  // right/side
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        chanData(c) = readSubframe(br, bs, bps + sideBoost).getOrElse(return None)
        c += 1
      }
      br.align()
      i = br.bytePos
      if (i + 2 > bytes.length) return None
      val fCrc = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
      if (crc16(bytes, frameStart, i) != fCrc) return None
      i += 2
      // ---- stereo reconstruction ----
      val base = (got * channels).toInt
      var t = 0
      while (t < bs) {
        chanCode match {
          case 8 => // left/side: R = L - side
            val l = chanData(0)(t); val s = chanData(1)(t)
            outSamples(base + t * 2) = l
            outSamples(base + t * 2 + 1) = l - s
          case 9 => // right/side: L = R + side
            val s = chanData(0)(t); val r = chanData(1)(t)
            outSamples(base + t * 2) = r + s
            outSamples(base + t * 2 + 1) = r
          case 10 => // mid/side
            val m = chanData(0)(t); val s = chanData(1)(t)
            val sum = (m << 1) | (s & 1)
            outSamples(base + t * 2) = (sum + s) >> 1
            outSamples(base + t * 2 + 1) = (sum - s) >> 1
          case _ =>
            var cc = 0
            while (cc < nCh) {
              outSamples(base + t * nCh + cc) = chanData(cc)(t); cc += 1
            }
        }
        t += 1
      }
      val lim = 1 << (bps - 1)
      var v = base
      while (v < base + bs * channels) {
        if (outSamples(v) < -lim || outSamples(v) >= lim) return None
        v += 1
      }
      got += bs
      nFrames += 1
    }
    if (got != nTotal) return None
    if (i != bytes.length) return None // trailing garbage
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = (bps + 7) / 8
    outSamples.foreach { s =>
      var b = 0
      while (b < bytesPer) { md.update(((s >> (8 * b)) & 0xFF).toByte); b += 1 }
    }
    val md5Ok = java.util.Arrays.equals(md.digest(), md5) ||
      md5.forall(_ == 0)
    if (!md5Ok) return None
    Some(Decoded(sampleRate, channels, bps, outSamples, nFrames, md5Ok))
  }

  private def readSubframe(br: BitReader, bs: Int, bps: Int): Option[Array[Int]] = {
    if (br.readBit() != 0) return None // padding bit
    val ty = br.read(6).toInt
    var effBps = bps
    if (br.readBit() == 1) { // wasted bits: unary count-1
      var w = 1
      while (br.readBit() == 0) { w += 1; if (w > 30) return None }
      if (w >= bps) return None
      effBps -= w
      val s = readSubframeBody(br, bs, effBps, ty).getOrElse(return None)
      var i = 0
      while (i < s.length) { s(i) = s(i) << w; i += 1 }
      return Some(s)
    }
    readSubframeBody(br, bs, effBps, ty)
  }

  private def readSubframeBody(br: BitReader, bs: Int, bps: Int,
      ty: Int): Option[Array[Int]] = {
    if (ty == 0) { // CONSTANT
      val v = br.readSigned(bps)
      return Some(Array.fill(bs)(v))
    }
    if (ty == 1) { // VERBATIM
      val s = new Array[Int](bs)
      var i = 0
      while (i < bs) { s(i) = br.readSigned(bps); i += 1 }
      return Some(s)
    }
    if ((ty & 0x38) == 0x08 && (ty & 0x07) <= 4) { // FIXED order 0-4
      val order = ty & 0x07
      if (order > bs) return None
      val s = new Array[Int](bs)
      var i = 0
      while (i < order) { s(i) = br.readSigned(bps); i += 1 }
      val res = readResidual(br, bs, order).getOrElse(return None)
      i = order
      while (i < bs) {
        val v = fixedRestore(s, i, order, res(i - order))
        if (v < Int.MinValue || v > Int.MaxValue) return None
        s(i) = v.toInt; i += 1
      }
      return Some(s)
    }
    if ((ty & 0x20) != 0) { // LPC, order = low5 + 1
      val order = (ty & 0x1F) + 1
      if (order > bs) return None
      val s = new Array[Int](bs)
      var i = 0
      while (i < order) { s(i) = br.readSigned(bps); i += 1 }
      val precCode = br.read(4).toInt
      if (precCode == 15) return None
      val precision = precCode + 1
      val shift = br.read(5).toInt // spec: signed, but negative is forbidden
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      val res = readResidual(br, bs, order).getOrElse(return None)
      i = order
      while (i < bs) {
        var pred = 0L; var j = 0
        while (j < order) { pred += coefs(j).toLong * s(i - 1 - j); j += 1 }
        val v = res(i - order) + (pred >> shift)
        if (v < Int.MinValue || v > Int.MaxValue) return None
        s(i) = v.toInt; i += 1
      }
      return Some(s)
    }
    None // reserved types (000001x, 0001xx, 01xxxx above fixed band)
  }

  private def readResidual(br: BitReader, bs: Int, order: Int): Option[Array[Long]] = {
    val method = br.read(2).toInt
    if (method > 1) return None
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = br.read(4).toInt
    val nPart = 1 << po
    if (bs % nPart != 0) return None
    val partLen = bs / nPart
    if (partLen - order < 0) return None // first partition would be negative
    val res = new Array[Long](bs - order)
    var w = 0
    var p = 0
    while (p < nPart) {
      val cnt = if (p == 0) partLen - order else partLen
      if (cnt < 0) return None
      val param = br.read(pBits).toInt
      if (param == escape) {
        val raw = br.read(5).toInt
        var i = 0
        while (i < cnt) {
          res(w) = if (raw == 0) 0L else br.readSigned(raw).toLong
          w += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.readUnary()
          val u = (q.toLong << param) | (if (param > 0) br.read(param) else 0L)
          res(w) = unzigzag(u)
          w += 1; i += 1
        }
      }
      p += 1
    }
    Some(res)
  }
}
