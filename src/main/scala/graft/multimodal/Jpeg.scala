package graft.multimodal

/** ======= REAL ======= baseline JPEG codec, zero codec deps: the full
  * ISO/IEC 10918-1 baseline-sequential pipeline for single-component
  * (grayscale) images — marker parsing, DQT/DHT table loading, canonical
  * Huffman decode (Annex K standard tables on encode, whatever DHT
  * declares on decode), DC differential prediction, dequantization,
  * inverse zigzag, separable 2-D IDCT, level shift + clamp, edge crop.
  *
  * Exactness note for the oracle path: with an all-ones quantization
  * table, a BLOCK-FLAT image (every 8×8 block one value v) round-trips
  * EXACTLY — FDCT of a flat block is DC-only (DC = 8·(v−128), all AC 0)
  * and any correct IDCT reproduces the flat value, so the decoded pixels
  * equal the closed formula the DuckDB oracle restates. Non-flat blocks
  * exercise the general AC/IDCT path and are spec-verified against
  * ImageIO within ±2 (the JPEG standard permits small IDCT variance
  * between conforming decoders). Unsupported shapes (progressive,
  * multi-component, 16-bit DQT, restart intervals) → None, never a
  * guess.
  *
  * Reference surface parity: the reference ships no media decode either
  * (multimodal payloads are opaque bytes there); this closes baseline
  * JPEG, with only inter-frame video codecs (H.264/VP9 entropy
  * decoding) remaining out of local scope.
  */
object Jpeg {

  /** zigzag scan order: index in scan order → raster index. */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 standard luminance DC table: code counts per length,
    * then the symbol list (categories 0-11). */
  private val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = (0 to 11).map(_.toByte).toArray

  /** Annex K.3.2 standard luminance AC table. */
  private val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** canonical Huffman table: encode map symbol → (code, length). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        table(vals(k) & 0xFF) = (code, len); code += 1; k += 1
      }
      code <<= 1
    }
    table
  }

  /** canonical Huffman decode state (F.2.2.3 mincode/maxcode/valptr). */
  private final class DecodeTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1); k += bits(len - 1)
        maxCode(len) = if (bits(len - 1) > 0) code - 1 else -1
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xFF
  }

  // ---- encoder ----------------------------------------------------------

  /** encode a grayscale image as a standards-conformant baseline JPEG
    * with an all-ones quantization table and the Annex K luminance
    * Huffman tables. `px(x, y)` returns 0-255. Real FDCT + real entropy
    * coding; edge blocks replicate the last row/column. */
  def encodeGray(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xDB); u16(2 + 1 + 64); u8(0x00) // DQT: 8-bit, id 0
    for (_ <- 0 until 64) u8(1)
    marker(0xC0); u16(2 + 6 + 3) // SOF0: 1 component
    u8(8); u16(h); u16(w); u8(1)
    u8(1); u8(0x11); u8(0) // comp 1, 1x1 sampling, qtable 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | 0)
      bits.foreach(u8); vals.foreach(b => u8(b & 0xFF))
    }
    dht(0, dcBits, dcVals); dht(1, acBits, acVals)
    marker(0xDA); u16(2 + 1 + 2 + 3) // SOS
    u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    // entropy-coded segment with byte stuffing
    var bitBuf = 0L; var bitCnt = 0
    def putBits(code: Int, len: Int): Unit = {
      bitBuf = (bitBuf << len) | (code & ((1L << len) - 1)); bitCnt += len
      while (bitCnt >= 8) {
        val b = ((bitBuf >> (bitCnt - 8)) & 0xFF).toInt
        out.write(b); if (b == 0xFF) out.write(0x00)
        bitCnt -= 8
      }
    }
    val dcEnc = buildEncodeTable(dcBits, dcVals)
    val acEnc = buildEncodeTable(acBits, acVals)
    def category(v: Int): Int = { // magnitude category (CCITT F.1.2.1.2)
      var a = math.abs(v); var c = 0
      while (a != 0) { a >>= 1; c += 1 }
      c
    }
    val cosTab = Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16.0))
    val coef = new Array[Int](64)
    var prevDc = 0
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    for (by <- 0 until bh; bx <- 0 until bw) {
      // level-shifted source block, edge replication
      val s = Array.tabulate(8, 8)((y, x) =>
        px(math.min(bx * 8 + x, w - 1), math.min(by * 8 + y, h - 1)) - 128)
      // separable FDCT, round to int, quantize by 1
      for (u <- 0 until 8; v <- 0 until 8) {
        var acc = 0.0
        for (y <- 0 until 8; x <- 0 until 8)
          acc += s(y)(x) * cosTab(x)(u) * cosTab(y)(v)
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        coef(v * 8 + u) = math.round(0.25 * cu * cv * acc).toInt
      }
      // DC: differential, category + offset bits
      val dc = coef(0); val diff = dc - prevDc; prevDc = dc
      val cat = category(diff)
      val (dcCode, dcLen) = dcEnc(cat)
      putBits(dcCode, dcLen)
      if (cat > 0) {
        val bitsVal = if (diff >= 0) diff else diff + (1 << cat) - 1
        putBits(bitsVal, cat)
      }
      // AC: run-length of zeros in zigzag order
      var run = 0
      for (k <- 1 until 64) {
        val v = coef(zigzag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = acEnc(0xF0); putBits(c, l); run -= 16 }
          val cat = category(v)
          val (c, l) = acEnc((run << 4) | cat)
          putBits(c, l)
          val bitsVal = if (v >= 0) v else v + (1 << cat) - 1
          putBits(bitsVal, cat)
          run = 0
        }
      }
      if (run > 0) { val (c, l) = acEnc(0x00); putBits(c, l) } // EOB
    }
    if (bitCnt > 0) putBits((1 << (8 - bitCnt)) - 1, 8 - bitCnt) // pad with 1s
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ---- decoder ----------------------------------------------------------

  /** decode a baseline single-component JPEG to pixel stats (grayscale:
    * r = g = b = sample). Follows DQT/DHT as declared in the stream.
    * None for progressive/multi-component/malformed inputs. */
  /** decode to per-pixel stats (see [[decodeGrayPlane]] for the raw
    * pixel plane — frame-difference metrics need the pixels, not just
    * the folds). */
  def decodeGray(bytes: Array[Byte]): Option[Multimodal.PixelStats] =
    decodeGrayPlane(bytes).map { case (w, h, px) =>
      var sumR = 0L; var sumL = 0L; var peakL = 0L
      var j = 0
      while (j < px.length) {
        val v = px(j)
        val luma = 1000L * v // gray: 299v+587v+114v
        sumR += v; sumL += luma
        if (luma > peakL) peakL = luma
        j += 1
      }
      Multimodal.PixelStats(w, h, 1, w.toLong * h, sumR, sumR, sumR,
        sumL, peakL)
    }

  /** the full baseline decode, returning the CROPPED row-major 8-bit
    * pixel plane. */
  def decodeGrayPlane(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var i = 0
    def u8(): Int = { val v = bytes(i) & 0xFF; i += 1; v }
    def u16(): Int = { val v = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF); i += 2; v }
    try {
      if (bytes.length < 4 || u8() != 0xFF || u8() != 0xD8) return None
      var w = 0; var h = 0
      val qt = new Array[Array[Int]](4)
      val dcTabs = new Array[DecodeTable](4)
      val acTabs = new Array[DecodeTable](4)
      var compQ = 0; var dcSel = 0; var acSel = 0
      var sos = false
      while (!sos) {
        if (i + 4 > bytes.length) return None
        if (u8() != 0xFF) return None
        val m = u8()
        m match {
          case 0xC0 => // SOF0 baseline
            val len = u16(); val end = i + len - 2
            if (u8() != 8) return None
            h = u16(); w = u16()
            if (u8() != 1) return None // single component only
            u8() // component id
            if (u8() != 0x11) return None // 1x1 sampling
            compQ = u8()
            i = end
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return None // non-baseline frame types
          case 0xDB =>
            val len = u16(); val end = i + len - 2
            while (i < end) {
              val pq = u8()
              if ((pq >> 4) != 0) return None // 16-bit tables unsupported
              val id = pq & 0xF
              qt(id) = Array.fill(64)(0)
              for (k <- 0 until 64) qt(id)(k) = u8()
            }
          case 0xC4 =>
            val len = u16(); val end = i + len - 2
            while (i < end) {
              val tc = u8()
              val bits = Array.fill(16)(u8())
              val n = bits.sum
              val vals = Array.fill(n)(u8().toByte)
              val tab = new DecodeTable(bits, vals)
              if ((tc >> 4) == 0) dcTabs(tc & 0xF) = tab else acTabs(tc & 0xF) = tab
            }
          case 0xDD => return None // restart intervals unsupported
          case 0xDA =>
            val len = u16(); val end = i + len - 2
            if (u8() != 1) return None
            u8() // component id
            val sel = u8(); dcSel = sel >> 4; acSel = sel & 0xF
            i = end
            sos = true
          case 0xD9 => return None // EOI before scan
          case _ => // APPn/COM/etc: skip by length
            val len = u16(); i += len - 2
        }
      }
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28)) return None
      val q = qt(compQ); val dcT = dcTabs(dcSel); val acT = acTabs(acSel)
      if (q == null || dcT == null || acT == null) return None
      // entropy-coded bits with unstuffing; markers end the scan
      var bitBuf = 0; var bitCnt = 0
      def nextBit(): Int = {
        if (bitCnt == 0) {
          if (i >= bytes.length) return -1
          var b = u8()
          if (b == 0xFF) {
            if (i >= bytes.length) return -1
            val b2 = u8()
            if (b2 != 0x00) return -1 // a real marker: out of data
            b = 0xFF
          }
          bitBuf = b; bitCnt = 8
        }
        bitCnt -= 1
        (bitBuf >> bitCnt) & 1
      }
      def huffDecode(t: DecodeTable): Int = {
        var code = 0; var len = 0
        while (len < 16) {
          val b = nextBit(); if (b < 0) return -1
          code = (code << 1) | b; len += 1
          if (t.maxCode(len) >= 0 && code <= t.maxCode(len) &&
              code >= t.minCode(len))
            return t.value(len, code)
        }
        -1
      }
      def receiveExtend(cat: Int): Int = {
        var v = 0
        for (_ <- 0 until cat) {
          val b = nextBit(); if (b < 0) return Int.MinValue
          v = (v << 1) | b
        }
        if (cat == 0) 0
        else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
        else v
      }
      val cosTab = Array.tabulate(8, 8)((x, u) =>
        math.cos((2 * x + 1) * u * math.Pi / 16.0))
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      val pixels = new Array[Byte](bw * 8 * bh * 8)
      val coef = new Array[Int](64)
      var prevDc = 0
      for (by <- 0 until bh; bx <- 0 until bw) {
        java.util.Arrays.fill(coef, 0)
        val cat = huffDecode(dcT); if (cat < 0 || cat > 11) return None
        val diff = receiveExtend(cat); if (diff == Int.MinValue) return None
        prevDc += diff
        coef(0) = prevDc * q(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = huffDecode(acT); if (rs < 0) return None
          val run = rs >> 4; val size = rs & 0xF
          if (size == 0) {
            if (run == 15) k += 16 else eob = true
          } else {
            k += run
            if (k >= 64) return None
            val v = receiveExtend(size); if (v == Int.MinValue) return None
            coef(zigzag(k)) = v * q(k)
            k += 1
          }
        }
        // separable 2-D IDCT + level shift + clamp
        for (y <- 0 until 8; x <- 0 until 8) {
          var acc = 0.0
          for (v <- 0 until 8; u <- 0 until 8) {
            val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
            val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
            acc += cu * cv * coef(v * 8 + u) * cosTab(x)(u) * cosTab(y)(v)
          }
          val s = math.round(0.25 * acc).toInt + 128
          val p = math.max(0, math.min(255, s))
          pixels((by * 8 + y) * bw * 8 + bx * 8 + x) = p.toByte
        }
      }
      // crop the padded block plane to w×h
      val out = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w)
        out(y * w + x) = pixels(y * bw * 8 + x) & 0xFF
      Some((w, h, out))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
