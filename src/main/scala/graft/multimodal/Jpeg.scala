package graft.multimodal

/** ======= REAL ======= baseline JPEG codec, zero codec deps: the full
  * ISO/IEC 10918-1 baseline-sequential pipeline — marker parsing,
  * DQT/DHT table loading, canonical Huffman decode (Annex K standard
  * tables on encode, whatever DHT declares on decode), DC differential
  * prediction per component, dequantization, inverse zigzag, separable
  * 2-D IDCT, level shift + clamp, chroma upsampling (box/replication),
  * YCbCr→RGB, edge crop. Supports single-component (grayscale) and
  * 3-component YCbCr frames with 4:4:4 and 4:2:0 sampling (any
  * h,v ∈ {1,2} layout whose factors divide the frame maxima).
  *
  * Exactness note for the oracle path: with an all-ones quantization
  * table, a BLOCK-FLAT image (every 8×8 block one value v — for 4:2:0
  * color, every 16×16 MCU one RGB) round-trips EXACTLY — FDCT of a flat
  * block is DC-only (DC = 8·(v−128), all AC 0) and any correct IDCT
  * reproduces the flat value; the color transforms are fixed-point
  * INTEGER arithmetic on both sides (`rgbToYcbcr`/`ycbcrToRgb`,
  * per-mille coefficients, non-negative numerators so truncating and
  * flooring division agree), so the decoded pixels equal a closed
  * formula the DuckDB oracle restates. Non-flat blocks exercise the
  * general AC/IDCT path and are spec-verified against ImageIO within ±2
  * (the JPEG standard permits small IDCT variance between conforming
  * decoders). PROGRESSIVE (SOF2) streams decode through the dedicated
  * scan accumulator (`decodeProgressivePlanes`): DC first + refinement,
  * AC spectral-selection first + refinement per T.81 §G, then the same
  * dequant + IDCT + color pipeline. RESTART INTERVALS (DRI + RST0-7
  * resync, §E.2.4) decode in the baseline path: byte-align, verify the
  * cycling marker, reset DC predictors per interval. ARITHMETIC-CODED
  * frames decode for BOTH orders: sequential SOF9 (DAC conditioning,
  * Annex D QM-coder + §F.2.4 statistical models, `decodeArithScan`)
  * and progressive SOF10 (§G.2 scan models through the progressive
  * accumulator) — see [[JpegArith]]. Unsupported shapes (16-bit DQT,
  * 2- or 4-component frames, hierarchical/lossless frames, restarts
  * inside progressive or arithmetic scans) → None, never a guess.
  *
  * Reference surface parity: the reference ships no media decode either
  * (multimodal payloads are opaque bytes there); this closes baseline
  * AND progressive JPEG — grayscale and color — with only inter-frame
  * video codecs (H.264/VP9 entropy decoding) remaining out of local
  * scope.
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

  // ---- fixed-point color transforms (shared with the SQL oracles) -------

  /** JFIF RGB→YCbCr in per-mille INTEGER arithmetic with half-up
    * rounding; every numerator is non-negative, so truncating (Spark
    * `div`, Java `/`) and flooring (DuckDB `//`) division agree — the
    * DuckDB twin restates these formulas verbatim. */
  def rgbToYcbcr(r: Int, g: Int, b: Int): (Int, Int, Int) = (
    (299 * r + 587 * g + 114 * b + 500) / 1000,
    (128000 + 500 * b - 169 * r - 331 * g + 500) / 1000,
    (128000 + 500 * r - 419 * g - 81 * b + 500) / 1000)

  /** JFIF YCbCr→RGB, same fixed-point discipline: the +10⁶ offset keeps
    * the numerator non-negative for all 8-bit inputs (min ≈ −180k), so
    * the truncating division is a floor on both engines. */
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Int) = math.max(0, math.min(255, v))
    def fx(num: Int) = ((num + 500 + 1000000) / 1000) - 1000
    (cl(fx(1000 * y + 1402 * (cr - 128))),
     cl(fx(1000 * y - 344 * (cb - 128) - 714 * (cr - 128))),
     cl(fx(1000 * y + 1772 * (cb - 128))))
  }

  // ---- shared encoder machinery -----------------------------------------

  private lazy val cosTab = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))

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

  /** entropy-coded-segment writer: bit buffer with 0xFF byte stuffing
    * and the FDCT + run-length + Huffman coding of one 8×8 block. */
  private final class BlockWriter(out: java.io.ByteArrayOutputStream) {
    private var bitBuf = 0L
    private var bitCnt = 0
    private val dcEnc = buildEncodeTable(dcBits, dcVals)
    private val acEnc = buildEncodeTable(acBits, acVals)
    private val coef = new Array[Int](64)

    private def putBits(code: Int, len: Int): Unit = {
      bitBuf = (bitBuf << len) | (code & ((1L << len) - 1)); bitCnt += len
      while (bitCnt >= 8) {
        val b = ((bitBuf >> (bitCnt - 8)) & 0xFF).toInt
        out.write(b); if (b == 0xFF) out.write(0x00)
        bitCnt -= 8
      }
    }

    private def category(v: Int): Int = { // magnitude category (F.1.2.1.2)
      var a = math.abs(v); var c = 0
      while (a != 0) { a >>= 1; c += 1 }
      c
    }

    /** FDCT (quantizer all-ones) + entropy-code one level-shifted 8×8
      * block; returns the new DC predictor. */
    def encodeBlock(s: Array[Array[Int]], prevDc: Int): Int = {
      fdctInto(s, coef)
      val dc = encodeDcDiff(coef(0), prevDc)
      encodeAcRuns(coef)
      dc
    }

    /** DC magnitude-category + sign bits for `dc - prevDc`; returns dc. */
    def encodeDcDiff(dc: Int, prevDc: Int): Int = {
      encodeRawDiff(dc - prevDc)
      dc
    }

    /** magnitude-category + extend bits of one difference — the DC
      * coding primitive, also the per-sample code of LOSSLESS mode. */
    def encodeRawDiff(diff: Int): Unit = {
      val cat = category(diff)
      val (dcCode, dcLen) = dcEnc(cat)
      putBits(dcCode, dcLen)
      if (cat > 0) {
        val bitsVal = if (diff >= 0) diff else diff + (1 << cat) - 1
        putBits(bitsVal, cat)
      }
    }

    /** AC run-length coding of coefficients 1..63 (zigzag) with ZRL and
      * a trailing EOB — the sequential coding, which is also a valid
      * Ss=1..63, Ah=Al=0 progressive AC scan (EOB ≡ EOBRUN of 1). */
    def encodeAcRuns(coef: Array[Int]): Unit = {
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

    def flush(): Unit =
      if (bitCnt > 0) putBits((1 << (8 - bitCnt)) - 1, 8 - bitCnt) // pad 1s
  }

  /** FDCT of one level-shifted 8×8 block (all-ones quantizer) into
    * `coef` (raster order) — shared by the sequential and progressive
    * encoders, arithmetic unchanged. */
  private def fdctInto(s: Array[Array[Int]], coef: Array[Int]): Unit =
    for (u <- 0 until 8; v <- 0 until 8) {
      var acc = 0.0
      for (y <- 0 until 8; x <- 0 until 8)
        acc += s(y)(x) * cosTab(x)(u) * cosTab(y)(v)
      val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
      val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
      coef(v * 8 + u) = math.round(0.25 * cu * cv * acc).toInt
    }

  private def writeHeaders(out: java.io.ByteArrayOutputStream, w: Int,
      h: Int, comps: Seq[(Int, Int, Int)], sofMarker: Int = 0xC0,
      sos: Boolean = true, huff: Boolean = true): Unit = {
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xDB); u16(2 + 1 + 64); u8(0x00) // DQT: 8-bit, id 0, all ones
    for (_ <- 0 until 64) u8(1)
    marker(sofMarker); u16(2 + 6 + 3 * comps.size) // SOF0 / SOF2 / SOF9
    u8(8); u16(h); u16(w); u8(comps.size)
    for ((id, hs, vs) <- comps) { u8(id); u8((hs << 4) | vs); u8(0) }
    def dht(cls: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | 0)
      bits.foreach(u8); vals.foreach(b => u8(b & 0xFF))
    }
    if (huff) { dht(0, dcBits, dcVals); dht(1, acBits, acVals) }
    else {
      // DAC (T.81 §B.2.4.3): arithmetic conditioning — DC table 0 gets
      // Cs = 16·U + L (defaults U=1, L=0), AC table 0 gets Cs = Kx = 5
      marker(0xCC); u16(2 + 4)
      u8(0x00); u8(0x10) // Tc=0 Tb=0, U=1 L=0
      u8(0x10); u8(5)    // Tc=1 Tb=0, Kx=5
    }
    if (sos) {
      marker(0xDA); u16(2 + 1 + 2 * comps.size + 3) // SOS
      u8(comps.size)
      for ((id, _, _) <- comps) { u8(id); u8(0x00) } // dc table 0, ac table 0
      u8(0); u8(63); u8(0)
    }
  }

  /** a progressive SOS header: component (id, table-selector byte)
    * pairs + the spectral band Ss..Se and approximation nibbles AhAl. */
  private def writeSos(out: java.io.ByteArrayOutputStream,
      comps: Seq[(Int, Int)], ss: Int, se: Int, ahal: Int): Unit = {
    def u8(v: Int): Unit = out.write(v & 0xFF)
    u8(0xFF); u8(0xDA); u8(0); u8(2 + 1 + 2 * comps.size + 3)
    u8(comps.size)
    for ((id, sel) <- comps) { u8(id); u8(sel) }
    u8(ss); u8(se); u8(ahal)
  }

  /** sample an 8×8 level-shifted block from a plane with edge
    * replication. */
  private def sampleBlock(plane: Array[Int], pw: Int, ph: Int,
      x0: Int, y0: Int): Array[Array[Int]] =
    Array.tabulate(8, 8)((y, x) =>
      plane(math.min(y0 + y, ph - 1) * pw + math.min(x0 + x, pw - 1)) - 128)

  // ---- encoders ---------------------------------------------------------

  /** encode a grayscale image as a standards-conformant baseline JPEG
    * with an all-ones quantization table and the Annex K luminance
    * Huffman tables. `px(x, y)` returns 0-255. Real FDCT + real entropy
    * coding; edge blocks replicate the last row/column. */
  def encodeGray(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 1, 1)))
    val bwr = new BlockWriter(out)
    val plane = Array.tabulate(w * h)(i => px(i % w, i / w) & 0xFF)
    var prevDc = 0
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    for (by <- 0 until bh; bx <- 0 until bw)
      prevDc = bwr.encodeBlock(sampleBlock(plane, w, h, bx * 8, by * 8), prevDc)
    bwr.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** encode a grayscale image as a baseline JPEG WITH RESTART
    * INTERVALS (T.81 §B.2.4.4/§E.2.4): a DRI segment declares `ri` MCUs
    * per interval, and at each boundary the entropy stream byte-aligns
    * (1-padded), emits the cycling RST0-7 marker, and resets the DC
    * predictor — the resync structure real encoders emit so a corrupted
    * scan only loses one interval. Same quantizer/tables/FDCT as
    * [[encodeGray]], so both encodings of one image decode to IDENTICAL
    * pixels (the q348 parity law). */
  def encodeGrayRestart(w: Int, h: Int, px: (Int, Int) => Int,
      ri: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF && ri > 0)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 1, 1)), sos = false)
    out.write(0xFF); out.write(0xDD); out.write(0); out.write(4) // DRI
    out.write((ri >>> 8) & 0xFF); out.write(ri & 0xFF)
    writeSos(out, Seq((1, 0x00)), ss = 0, se = 63, ahal = 0)
    val bwr = new BlockWriter(out)
    val plane = Array.tabulate(w * h)(i => px(i % w, i / w) & 0xFF)
    var prevDc = 0
    var mcu = 0
    var rst = 0
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    for (by <- 0 until bh; bx <- 0 until bw) {
      if (mcu > 0 && mcu % ri == 0) {
        bwr.flush()
        out.write(0xFF); out.write(0xD0 + rst)
        rst = (rst + 1) % 8
        prevDc = 0
      }
      prevDc = bwr.encodeBlock(sampleBlock(plane, w, h, bx * 8, by * 8), prevDc)
      mcu += 1
    }
    bwr.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** encode a grayscale image as a standards-conformant PROGRESSIVE
    * (SOF2) JPEG in two spectral-selection scans — scan 1: all DC
    * coefficients (Ss=Se=0, Ah=Al=0), scan 2: the full AC band
    * (Ss=1, Se=63, Ah=Al=0; per-block EOB ≡ EOBRUN of 1) — with the same
    * all-ones quantizer, Annex K tables, and FDCT as [[encodeGray]], so
    * the progressive and sequential encodings of one image decode to
    * IDENTICAL pixels and block-flat images round-trip exactly (the
    * oracle shape for q324). */
  def encodeGrayProgressive(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val plane = Array.tabulate(w * h)(i => px(i % w, i / w) & 0xFF)
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val coefs = Array.tabulate(bh * bw) { bi =>
      val c = new Array[Int](64)
      fdctInto(sampleBlock(plane, w, h, (bi % bw) * 8, (bi / bw) * 8), c)
      c
    }
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 1, 1)), sofMarker = 0xC2, sos = false)
    writeSos(out, Seq((1, 0x00)), ss = 0, se = 0, ahal = 0) // DC scan
    val dcW = new BlockWriter(out)
    var prevDc = 0
    coefs.foreach(c => prevDc = dcW.encodeDcDiff(c(0), prevDc))
    dcW.flush()
    writeSos(out, Seq((1, 0x00)), ss = 1, se = 63, ahal = 0) // AC scan
    val acW = new BlockWriter(out)
    coefs.foreach(acW.encodeAcRuns)
    acW.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** encode a grayscale image as an ARITHMETIC-CODED extended
    * sequential JPEG (SOF9, T.81 Annex D + §F.1.4): same all-ones
    * quantizer and FDCT as [[encodeGray]], but the entropy layer is the
    * adaptive QM-coder — a DAC segment declares the default
    * conditioning (L=0, U=1, Kx=5), no Huffman tables exist, and the
    * scan is one arithmetic-coded segment terminated per §D.1.8. Since
    * only the entropy layer differs, both encodings of one image decode
    * to IDENTICAL pixels (the q350 parity law). */
  def encodeGrayArith(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 1, 1)), sofMarker = 0xC9, sos = false,
      huff = false)
    writeSos(out, Seq((1, 0x00)), ss = 0, se = 63, ahal = 0)
    val plane = Array.tabulate(w * h)(i => px(i % w, i / w) & 0xFF)
    val enc = new JpegArith.Encoder
    val dcStats = JpegArith.freshStats(JpegArith.DcStatsSize)
    val acStats = JpegArith.freshStats(JpegArith.AcStatsSize)
    val coef = new Array[Int](64)
    val zz = new Array[Int](64)
    var prevDc = 0
    var dcCtx = 0
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    for (by <- 0 until bh; bx <- 0 until bw) {
      fdctInto(sampleBlock(plane, w, h, bx * 8, by * 8), coef)
      var k = 0
      while (k < 64) { zz(k) = coef(zigzag(k)); k += 1 }
      dcCtx = JpegArith.encodeDc(enc, dcStats, dcCtx, zz(0) - prevDc,
        condL = 0, condU = 1)
      prevDc = zz(0)
      JpegArith.encodeAc(enc, acStats, zz, kx = 5)
    }
    out.write(enc.flush())
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** encode a grayscale image as a PROGRESSIVE ARITHMETIC-CODED JPEG
    * (SOF10, T.81 §G.1.3): four scans exercising every §G arithmetic
    * model — DC first at Al=1 (conditioned diff coding of the shifted
    * values), AC first over the full 1..63 band at Al=1, DC refinement
    * (one fixed-bin correction bit per block), AC refinement (§G.1.3.3
    * correction/newly-significant coding). Statistics reset per scan;
    * same FDCT/quantizer as every other encoder, so all four encodings
    * of one image decode to IDENTICAL pixels. */
  def encodeGrayProgressiveArith(w: Int, h: Int,
      px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val plane = Array.tabulate(w * h)(i => px(i % w, i / w) & 0xFF)
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val coefs = Array.tabulate(bh * bw) { bi =>
      val c = new Array[Int](64)
      fdctInto(sampleBlock(plane, w, h, (bi % bw) * 8, (bi / bw) * 8), c)
      c
    }
    val zz = new Array[Int](64)
    def toZz(c: Array[Int]): Array[Int] = {
      var k = 0
      while (k < 64) { zz(k) = c(zigzag(k)); k += 1 }
      zz
    }
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 1, 1)), sofMarker = 0xCA, sos = false,
      huff = false)
    // scan 1: DC first, Al=1 — diffs of the point-transformed values
    writeSos(out, Seq((1, 0x00)), ss = 0, se = 0, ahal = 0x01)
    val e1 = new JpegArith.Encoder
    val ds1 = JpegArith.freshStats(JpegArith.DcStatsSize)
    var prev = 0; var ctx = 0
    coefs.foreach { c =>
      val v = c(0) >> 1
      ctx = JpegArith.encodeDc(e1, ds1, ctx, v - prev, condL = 0, condU = 1)
      prev = v
    }
    out.write(e1.flush())
    // scan 2: AC first, band 1..63, Al=1
    writeSos(out, Seq((1, 0x00)), ss = 1, se = 63, ahal = 0x01)
    val e2 = new JpegArith.Encoder
    val as2 = JpegArith.freshStats(JpegArith.AcStatsSize)
    coefs.foreach(c => JpegArith.encodeAc(e2, as2, toZz(c), kx = 5,
      bandLo = 1, bandHi = 63, al = 1))
    out.write(e2.flush())
    // scan 3: DC refinement, Ah=1 Al=0 — the last DC bit, fixed bin
    writeSos(out, Seq((1, 0x00)), ss = 0, se = 0, ahal = 0x10)
    val e3 = new JpegArith.Encoder
    val ds3 = JpegArith.freshStats(JpegArith.DcStatsSize)
    coefs.foreach(c => e3.encode(ds3, JpegArith.FixedBin, c(0) & 1))
    out.write(e3.flush())
    // scan 4: AC refinement, Ah=1 Al=0
    writeSos(out, Seq((1, 0x00)), ss = 1, se = 63, ahal = 0x10)
    val e4 = new JpegArith.Encoder
    val as4 = JpegArith.freshStats(JpegArith.AcStatsSize)
    coefs.foreach(c => JpegArith.encodeAcRefine(e4, as4, toZz(c),
      bandLo = 1, bandHi = 63, al = 0))
    out.write(e4.flush())
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** encode an RGB image as a standards-conformant baseline COLOR JPEG:
    * 3-component YCbCr, 4:4:4 (`chroma420 = false`) or 4:2:0 (Y sampled
    * 2×2 per MCU, chroma box-averaged over each 2×2 pixel group). The
    * color transform is the fixed-point `rgbToYcbcr`; quantization is
    * all-ones, so MCU-flat images round-trip exactly through
    * [[decodeRgb]]. */
  def encodeColor(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
      chroma420: Boolean, restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF &&
      restartInterval >= 0)
    val yP = new Array[Int](w * h)
    val cbF = new Array[Int](w * h) // full-res chroma before subsampling
    val crF = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val (yy, cb, cr) = rgbToYcbcr(r & 0xFF, g & 0xFF, b & 0xFF)
      yP(y * w + x) = yy; cbF(y * w + x) = cb; crF(y * w + x) = cr
    }
    val (cw, ch) =
      if (chroma420) ((w + 1) / 2, (h + 1) / 2) else (w, h)
    def subsample(full: Array[Int]): Array[Int] =
      if (!chroma420) full
      else Array.tabulate(cw * ch) { i =>
        val cx = i % cw; val cy = i / cw
        var sum = 0; var n = 0
        for (dy <- 0 until 2; dx <- 0 until 2) {
          val x = cx * 2 + dx; val y = cy * 2 + dy
          if (x < w && y < h) { sum += full(y * w + x); n += 1 }
        }
        (sum + n / 2) / n
      }
    val cbP = subsample(cbF); val crP = subsample(crF)
    val out = new java.io.ByteArrayOutputStream()
    val (yh, yv) = if (chroma420) (2, 2) else (1, 1)
    if (restartInterval == 0)
      writeHeaders(out, w, h, Seq((1, yh, yv), (2, 1, 1), (3, 1, 1)))
    else { // DRI between the tables and the scan, as for the gray path
      writeHeaders(out, w, h, Seq((1, yh, yv), (2, 1, 1), (3, 1, 1)),
        sos = false)
      out.write(0xFF); out.write(0xDD); out.write(0); out.write(4)
      out.write((restartInterval >>> 8) & 0xFF)
      out.write(restartInterval & 0xFF)
      writeSos(out, Seq((1, 0x00), (2, 0x00), (3, 0x00)),
        ss = 0, se = 63, ahal = 0)
    }
    val bwr = new BlockWriter(out)
    val mcusX = (w + yh * 8 - 1) / (yh * 8)
    val mcusY = (h + yv * 8 - 1) / (yv * 8)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var mcu = 0
    var rst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bwr.flush()
        out.write(0xFF); out.write(0xD0 + rst)
        rst = (rst + 1) % 8
        dcY = 0; dcCb = 0; dcCr = 0
      }
      for (bv <- 0 until yv; bh0 <- 0 until yh)
        dcY = bwr.encodeBlock(
          sampleBlock(yP, w, h, (mx * yh + bh0) * 8, (my * yv + bv) * 8), dcY)
      dcCb = bwr.encodeBlock(sampleBlock(cbP, cw, ch, mx * 8, my * 8), dcCb)
      dcCr = bwr.encodeBlock(sampleBlock(crP, cw, ch, mx * 8, my * 8), dcCr)
      mcu += 1
    }
    bwr.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ---- decoder ----------------------------------------------------------

  /** one decoded component: sampling factors, sub-resolution dims, and
    * the padded (block-aligned) plane. */
  private final case class Comp(hs: Int, vs: Int, subW: Int, subH: Int,
      padW: Int, plane: Array[Byte])

  /** the full baseline decode to per-component planes: 1 component
    * (grayscale) or 3 (YCbCr), h,v sampling ∈ {1,2} with factors
    * dividing the frame maxima (covers 4:4:4, 4:2:2, 4:2:0). Follows
    * DQT/DHT as declared in the stream. None for progressive /
    * malformed inputs; restart intervals (DRI) decode here. */
  private def decodePlanes(bytes: Array[Byte]): Option[(Int, Int, Array[Comp])] = {
    var i = 0
    def u8(): Int = { val v = bytes(i) & 0xFF; i += 1; v }
    def u16(): Int = { val v = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF); i += 2; v }
    try {
      if (bytes.length < 4 || u8() != 0xFF || u8() != 0xD8) return None
      var w = 0; var h = 0
      val qt = new Array[Array[Int]](4)
      val dcTabs = new Array[DecodeTable](4)
      val acTabs = new Array[DecodeTable](4)
      var nComp = 0
      val compHs = new Array[Int](4); val compVs = new Array[Int](4)
      val compQ = new Array[Int](4); val compIds = new Array[Int](4)
      val dcSel = new Array[Int](4); val acSel = new Array[Int](4)
      var restartInterval = 0 // DRI: MCUs between RSTm markers, 0 = off
      var arith = false // SOF9: arithmetic entropy coding (T.81 Annex D)
      // DAC conditioning per table id — defaults L=0, U=1, Kx=5 (§B.2.4.3)
      val dcCondL = Array.fill(4)(0); val dcCondU = Array.fill(4)(1)
      val acCondKx = Array.fill(4)(5)
      var sos = false
      while (!sos) {
        if (i + 4 > bytes.length) return None
        if (u8() != 0xFF) return None
        val m = u8()
        m match {
          case 0xC0 | 0xC9 => // SOF0 baseline / SOF9 arithmetic sequential
            arith = m == 0xC9
            val len = u16(); val end = i + len - 2
            if (u8() != 8) return None
            h = u16(); w = u16()
            nComp = u8()
            if (nComp != 1 && nComp != 3) return None
            for (c <- 0 until nComp) {
              compIds(c) = u8()
              val hv = u8(); compHs(c) = hv >> 4; compVs(c) = hv & 0xF
              compQ(c) = u8()
              if (compHs(c) < 1 || compHs(c) > 2 ||
                  compVs(c) < 1 || compVs(c) > 2) return None
            }
            i = end
          case 0xC2 | 0xCA => // SOF2/SOF10 progressive: scan accumulator
            return decodeProgressivePlanes(bytes)
          case 0xC3 => // SOF3 lossless: predictive decode (Annex H)
            return decodeLosslessPlanes(bytes)
          case 0xC1 | 0xC5 | 0xC6 | 0xC7 | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return None // hierarchical / lossless-arithmetic frames
          case 0xCC => // DAC: arithmetic conditioning values
            val len = u16(); val end = i + len - 2
            while (i < end) {
              val tcb = u8(); val cs = u8()
              val tb = tcb & 0xF
              if (tb > 3) return None
              if ((tcb >> 4) == 0) {
                dcCondL(tb) = cs & 0xF; dcCondU(tb) = cs >> 4
                if (dcCondL(tb) > dcCondU(tb)) return None
              } else {
                if (cs < 1 || cs > 63) return None
                acCondKx(tb) = cs
              }
            }
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
          case 0xDD => // DRI (T.81 §B.2.4.4): restart interval in MCUs
            val len = u16(); if (len != 4) return None
            restartInterval = u16()
          case 0xDA =>
            val len = u16(); val end = i + len - 2
            val ns = u8()
            if (ns != nComp) return None // only the interleaved single scan
            for (_ <- 0 until ns) {
              val id = u8()
              val c = compIds.indexOf(id)
              if (c < 0 || c >= nComp) return None
              val sel = u8(); dcSel(c) = sel >> 4; acSel(c) = sel & 0xF
            }
            i = end
            sos = true
          case 0xD9 => return None // EOI before scan
          case _ => // APPn/COM/etc: skip by length
            val len = u16(); i += len - 2
        }
      }
      if (w <= 0 || h <= 0 || nComp <= 0 || w.toLong * h > (1L << 28)) return None
      val maxH = (0 until nComp).map(compHs).max
      val maxV = (0 until nComp).map(compVs).max
      // every component's upsample factor must be integral
      for (c <- 0 until nComp)
        if (maxH % compHs(c) != 0 || maxV % compVs(c) != 0) return None
      val comps = Array.tabulate(nComp) { c =>
        val subW = (w * compHs(c) + maxH - 1) / maxH
        val subH = (h * compVs(c) + maxV - 1) / maxV
        val mcusX = (w + maxH * 8 - 1) / (maxH * 8)
        val mcusY = (h + maxV * 8 - 1) / (maxV * 8)
        val padW = mcusX * compHs(c) * 8
        val padH = mcusY * compVs(c) * 8
        Comp(compHs(c), compVs(c), subW, subH, padW,
          new Array[Byte](padW * padH))
      }
      for (c <- 0 until nComp)
        if (qt(compQ(c)) == null ||
            (!arith && (dcTabs(dcSel(c)) == null ||
                        acTabs(acSel(c)) == null))) return None
      if (arith) {
        // arithmetic scans don't mix with restart resync here (the
        // coder would need re-init mid-stream) — honest rejection
        if (restartInterval > 0) return None
        val maxH2 = (0 until nComp).map(compHs).max
        val maxV2 = (0 until nComp).map(compVs).max
        val ok = decodeArithScan(bytes, i, comps, nComp, qt, compQ,
          dcSel, acSel, dcCondL, dcCondU, acCondKx,
          (w + maxH2 * 8 - 1) / (maxH2 * 8), (h + maxV2 * 8 - 1) / (maxV2 * 8))
        return if (ok) Some((w, h, comps)) else None
      }
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
      val mcusX = (w + maxH * 8 - 1) / (maxH * 8)
      val mcusY = (h + maxV * 8 - 1) / (maxV * 8)
      val coef = new Array[Int](64)
      val prevDc = new Array[Int](nComp)
      // sparse IDCT scratch: typical blocks carry a handful of nonzero
      // coefficients, so the pixel loop folds only those — gathered in
      // index order with the SAME left-associated multiply chain as the
      // dense sum, and since a zero coefficient's term is an exact ±0.0
      // (cos factors are never 0, no underflow at these magnitudes),
      // skipping it leaves every acc bit-identical to the dense loop
      val nzIdx = new Array[Int](64)
      val nzT = new Array[Double](64)
      var mcuCount = 0
      var expectedRst = 0
      for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until nComp) {
        // restart boundary (T.81 §E.2.4): before each interval after the
        // first, the entropy stream byte-aligns, an RSTm marker (m
        // cycling 0-7) appears, and DC predictors reset — checked here
        // at the first component of the MCU
        if (c == 0 && restartInterval > 0 && mcuCount > 0 &&
            mcuCount % restartInterval == 0) {
          bitCnt = 0 // discard pad bits to the byte boundary
          if (i + 2 > bytes.length) return None
          if ((bytes(i) & 0xFF) != 0xFF ||
              (bytes(i + 1) & 0xFF) != (0xD0 + expectedRst)) return None
          i += 2
          expectedRst = (expectedRst + 1) % 8
          java.util.Arrays.fill(prevDc, 0)
        }
        if (c == nComp - 1) mcuCount += 1
        val comp = comps(c)
        val q = qt(compQ(c)); val dcT = dcTabs(dcSel(c)); val acT = acTabs(acSel(c))
        for (bv <- 0 until comp.vs; bh0 <- 0 until comp.hs) {
          java.util.Arrays.fill(coef, 0)
          val cat = huffDecode(dcT); if (cat < 0 || cat > 11) return None
          val diff = receiveExtend(cat); if (diff == Int.MinValue) return None
          prevDc(c) += diff
          coef(0) = prevDc(c) * q(0)
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
          // 2-D IDCT + level shift + clamp into the comp plane, folding
          // nonzero coefficients only (bit-identical to the dense sum)
          idctInto(coef, comp.plane, comp.padW,
            (mx * comp.hs + bh0) * 8, (my * comp.vs + bv) * 8, nzIdx, nzT)
        }
      }
      Some((w, h, comps))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** the seven lossless predictors (T.81 H.1.2.1): a = left, b = above,
    * c = above-left. Shifts are arithmetic — both sides use the same. */
  private def losslessPredict(sel: Int, a: Int, b: Int, c: Int): Int =
    sel match {
      case 1 => a
      case 2 => b
      case 3 => c
      case 4 => a + b - c
      case 5 => a + ((b - c) >> 1)
      case 6 => b + ((a - c) >> 1)
      case _ => (a + b) >> 1
    }

  /** prediction for sample (x, y) with the Annex H edge rules: (0,0)
    * predicts 2^(P−1) = 128, the rest of the first line uses predictor
    * 1 (a), the first sample of later lines predictor 2 (b). */
  private def losslessPx(sel: Int, plane: Array[Int], w: Int,
      x: Int, y: Int): Int =
    if (x == 0 && y == 0) 128
    else if (y == 0) plane(y * w + x - 1)
    else if (x == 0) plane((y - 1) * w + x)
    else losslessPredict(sel, plane(y * w + x - 1),
      plane((y - 1) * w + x), plane((y - 1) * w + x - 1))

  /** encode a grayscale image as a LOSSLESS JPEG (SOF3, T.81 Annex H):
    * per-sample prediction (selector `sel` ∈ 1..7 in the scan header's
    * Ss field) + Huffman coding of the differences with the DC-style
    * magnitude-category code. Bit-EXACT reconstruction — arbitrary
    * images round-trip perfectly, no block/IDCT machinery at all. */
  def encodeGrayLossless(w: Int, h: Int, px: (Int, Int) => Int,
      sel: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF &&
      sel >= 1 && sel <= 7)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 1, 1)), sofMarker = 0xC3, sos = false)
    writeSos(out, Seq((1, 0x00)), ss = sel, se = 0, ahal = 0)
    val bwr = new BlockWriter(out)
    val plane = Array.tabulate(w * h)(i => px(i % w, i / w) & 0xFF)
    for (y <- 0 until h; x <- 0 until w)
      bwr.encodeRawDiff(plane(y * w + x) - losslessPx(sel, plane, w, x, y))
    bwr.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** LOSSLESS (SOF3) decode: marker walk (no DQT required), DC-class
    * Huffman table, then one predicted sample per code. Out-of-range
    * reconstructions, bad predictors (Ss ∉ 1..7), point transforms and
    * restart intervals reject. Returns the shared Comp shape so the
    * gray entries dispatch transparently. */
  private def decodeLosslessPlanes(bytes: Array[Byte]): Option[(Int, Int, Array[Comp])] = {
    var i = 0
    def u8(): Int = { val v = bytes(i) & 0xFF; i += 1; v }
    def u16(): Int = { val v = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF); i += 2; v }
    try {
      if (bytes.length < 4 || u8() != 0xFF || u8() != 0xD8) return None
      var w = 0; var h = 0
      val dcTabs = new Array[DecodeTable](4)
      var sofSeen = false
      var dcSel0 = 0
      var sel = 0
      var sos = false
      while (!sos) {
        if (i + 4 > bytes.length) return None
        if (u8() != 0xFF) return None
        val m = u8()
        m match {
          case 0xC3 =>
            if (sofSeen) return None
            sofSeen = true
            val len = u16(); val end = i + len - 2
            if (u8() != 8) return None // 8-bit precision only
            h = u16(); w = u16()
            if (u8() != 1) return None // single component
            u8() // component id
            if (u8() != 0x11) return None // 1x1 sampling
            u8() // quant selector: unused in lossless
            i = end
          case 0xC4 =>
            val len = u16(); val end = i + len - 2
            while (i < end) {
              val tc = u8()
              val bits = Array.fill(16)(u8())
              val n = bits.sum
              val vals = Array.fill(n)(u8().toByte)
              val tab = new DecodeTable(bits, vals)
              if ((tc >> 4) == 0) dcTabs(tc & 0xF) = tab
            }
          case 0xDD => return None // restarts out of scope for lossless
          case 0xDA =>
            if (!sofSeen) return None
            val len = u16(); val end = i + len - 2
            if (u8() != 1) return None
            u8() // component id
            dcSel0 = u8() >> 4
            sel = u8() // Ss = predictor selector
            val se = u8(); val ahal = u8()
            if (sel < 1 || sel > 7 || se != 0 || (ahal & 0xF) != 0)
              return None
            i = end
            sos = true
          case 0xD9 => return None
          case _ =>
            val len = u16(); i += len - 2
        }
      }
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28)) return None
      if (dcTabs(dcSel0) == null) return None
      var bitBuf = 0; var bitCnt = 0
      def nextBit(): Int = {
        if (bitCnt == 0) {
          if (i >= bytes.length) return -1
          var b = u8()
          if (b == 0xFF) {
            if (i >= bytes.length) return -1
            val b2 = u8()
            if (b2 != 0x00) return -1
            b = 0xFF
          }
          bitBuf = b; bitCnt = 8
        }
        bitCnt -= 1
        (bitBuf >> bitCnt) & 1
      }
      val t = dcTabs(dcSel0)
      def huffDecode(): Int = {
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
      val plane = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val cat = huffDecode(); if (cat < 0 || cat > 15) return None
        var v = 0
        var k = 0
        while (k < cat) {
          val b = nextBit(); if (b < 0) return None
          v = (v << 1) | b
          k += 1
        }
        val diff =
          if (cat == 0) 0
          else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
          else v
        val s = losslessPx(sel, plane, w, x, y) + diff
        if (s < 0 || s > 255) return None // corrupt: an honest encoder can't
        plane(y * w + x) = s
      }
      val comp = Comp(1, 1, w, h, w, plane.map(_.toByte))
      Some((w, h, Array(comp)))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** the arithmetic-coded (SOF9) interleaved scan: one QM decoder over
    * the entropy segment, per-table DC/AC statistics areas, per-
    * component DC context + predictor, then the shared dequant + sparse
    * IDCT. Fills the component planes in place; false = corrupt. */
  private def decodeArithScan(bytes: Array[Byte], scanStart: Int,
      comps: Array[Comp], nComp: Int, qt: Array[Array[Int]],
      compQ: Array[Int], dcSel: Array[Int], acSel: Array[Int],
      dcCondL: Array[Int], dcCondU: Array[Int], acCondKx: Array[Int],
      mcusX: Int, mcusY: Int): Boolean = {
    val dec = new JpegArith.Decoder(bytes, scanStart, bytes.length)
    val dcStats = new Array[Array[Int]](4)
    val acStats = new Array[Array[Int]](4)
    for (c <- 0 until nComp) {
      if (dcStats(dcSel(c)) == null)
        dcStats(dcSel(c)) = JpegArith.freshStats(JpegArith.DcStatsSize)
      if (acStats(acSel(c)) == null)
        acStats(acSel(c)) = JpegArith.freshStats(JpegArith.AcStatsSize)
    }
    val dcCtx = new Array[Int](nComp)
    val lastDc = new Array[Int](nComp)
    val zz = new Array[Int](64)
    val coef = new Array[Int](64)
    val nzIdx = new Array[Int](64)
    val nzT = new Array[Double](64)
    for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until nComp) {
      val comp = comps(c)
      val q = qt(compQ(c))
      val ds = dcStats(dcSel(c)); val as = acStats(acSel(c))
      for (bv <- 0 until comp.vs; bh0 <- 0 until comp.hs) {
        java.util.Arrays.fill(zz, 0)
        val (diff, nctx) = JpegArith.decodeDc(dec, ds, dcCtx(c),
          dcCondL(dcSel(c)), dcCondU(dcSel(c)))
        if (diff == Int.MinValue) return false
        dcCtx(c) = nctx
        lastDc(c) += diff
        if (!JpegArith.decodeAc(dec, as, zz, acCondKx(acSel(c))))
          return false
        java.util.Arrays.fill(coef, 0)
        coef(0) = lastDc(c) * q(0)
        var k = 1
        while (k < 64) {
          if (zz(k) != 0) coef(zigzag(k)) = zz(k) * q(k)
          k += 1
        }
        idctInto(coef, comp.plane, comp.padW,
          (mx * comp.hs + bh0) * 8, (my * comp.vs + bv) * 8, nzIdx, nzT)
      }
    }
    true
  }

  /** PROGRESSIVE (SOF2) decode by scan accumulation, ITU-T T.81 §G:
    * every scan refines per-component COEFFICIENT stores — DC first
    * (diff coding, values scaled by 2^Al) and DC refinement (one raw
    * correction bit), AC first (spectral band Ss..Se with EOB runs) and
    * AC refinement (correction bits over the band's history, §G.1.2.3)
    * — and the dequantized blocks run through the shared sparse IDCT
    * after EOI. Interleaved DC scans walk the MCU-padded grids;
    * single-component scans walk the component's own ceil(dim/8) grid.
    * ARITHMETIC-CODED progressive frames (SOF10, §G.2) decode through
    * the same scan walk with the per-scan QM decoder + §G statistical
    * models (DC first/refine, AC first/refine — [[JpegArith]]).
    * Restart intervals stay rejected. */
  private def decodeProgressivePlanes(bytes: Array[Byte]): Option[(Int, Int, Array[Comp])] = {
    var i = 0
    def u8(): Int = { val v = bytes(i) & 0xFF; i += 1; v }
    def u16(): Int = { val v = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF); i += 2; v }
    try {
      if (bytes.length < 4 || u8() != 0xFF || u8() != 0xD8) return None
      var w = 0; var h = 0
      val qt = new Array[Array[Int]](4)
      val dcTabs = new Array[DecodeTable](4)
      val acTabs = new Array[DecodeTable](4)
      var nComp = 0
      val compHs = new Array[Int](4); val compVs = new Array[Int](4)
      val compQ = new Array[Int](4); val compIds = new Array[Int](4)
      var sofSeen = false
      var arith = false // SOF10: arithmetic-coded progressive (§G.1.3)
      val dcCondL = Array.fill(4)(0); val dcCondU = Array.fill(4)(1)
      val acCondKx = Array.fill(4)(5)
      var coefs: Array[Array[Int]] = null
      var blocksWpad: Array[Int] = null; var blocksHpad: Array[Int] = null
      var bW: Array[Int] = null; var bH: Array[Int] = null
      var mcusX = 0; var mcusY = 0; var maxH = 1; var maxV = 1
      def blockOff(c: Int, br: Int, bc: Int): Int = (br * blocksWpad(c) + bc) * 64
      var done = false
      while (!done) {
        if (i + 2 > bytes.length) return None
        if (u8() != 0xFF) return None
        var m = u8()
        while (m == 0xFF) m = u8() // fill bytes before a marker
        m match {
          case 0xD9 => done = true // EOI: scans complete
          case 0xC2 | 0xCA =>
            if (sofSeen) return None
            sofSeen = true
            arith = m == 0xCA
            val len = u16(); val end = i + len - 2
            if (u8() != 8) return None
            h = u16(); w = u16()
            nComp = u8()
            if (nComp != 1 && nComp != 3) return None
            for (c <- 0 until nComp) {
              compIds(c) = u8()
              val hv = u8(); compHs(c) = hv >> 4; compVs(c) = hv & 0xF
              compQ(c) = u8()
              if (compHs(c) < 1 || compHs(c) > 2 ||
                  compVs(c) < 1 || compVs(c) > 2) return None
            }
            i = end
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28)) return None
            maxH = (0 until nComp).map(compHs).max
            maxV = (0 until nComp).map(compVs).max
            for (c <- 0 until nComp)
              if (maxH % compHs(c) != 0 || maxV % compVs(c) != 0) return None
            mcusX = (w + maxH * 8 - 1) / (maxH * 8)
            mcusY = (h + maxV * 8 - 1) / (maxV * 8)
            blocksWpad = Array.tabulate(nComp)(c => mcusX * compHs(c))
            blocksHpad = Array.tabulate(nComp)(c => mcusY * compVs(c))
            bW = Array.tabulate(nComp)(c =>
              ((w * compHs(c) + maxH - 1) / maxH + 7) / 8)
            bH = Array.tabulate(nComp)(c =>
              ((h * compVs(c) + maxV - 1) / maxV + 7) / 8)
            coefs = Array.tabulate(nComp)(c =>
              new Array[Int](blocksWpad(c) * blocksHpad(c) * 64))
          case 0xC0 | 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 |
               0xCB | 0xCD | 0xCE | 0xCF =>
            return None // a second frame type inside a progressive stream
          case 0xCC => // DAC: arithmetic conditioning values
            val len = u16(); val end = i + len - 2
            while (i < end) {
              val tcb = u8(); val cs = u8()
              val tb = tcb & 0xF
              if (tb > 3) return None
              if ((tcb >> 4) == 0) {
                dcCondL(tb) = cs & 0xF; dcCondU(tb) = cs >> 4
                if (dcCondL(tb) > dcCondU(tb)) return None
              } else {
                if (cs < 1 || cs > 63) return None
                acCondKx(tb) = cs
              }
            }
          case 0xDB =>
            val len = u16(); val end = i + len - 2
            while (i < end) {
              val pq = u8()
              if ((pq >> 4) != 0) return None
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
            if (!sofSeen) return None
            val slen = u16()
            if (slen < 6) return None
            val ns = u8()
            if (ns < 1 || ns > nComp) return None
            val scanComp = new Array[Int](ns)
            val dcSel = new Array[Int](ns); val acSel = new Array[Int](ns)
            for (j <- 0 until ns) {
              val id = u8()
              val c = compIds.indexOf(id)
              if (c < 0 || c >= nComp) return None
              scanComp(j) = c
              val sel = u8(); dcSel(j) = sel >> 4; acSel(j) = sel & 0xF
            }
            val ss = u8(); val se = u8()
            val ahal = u8(); val ah = ahal >> 4; val al = ahal & 0xF
            if (ss > 63 || se > 63 || se < ss || al > 13 || ah > 13) return None
            val isDc = ss == 0
            if (isDc && se != 0) return None
            if (!isDc && ns != 1) return None // AC scans are single-component
            if (ah != 0 && ah != al + 1) return None // successive approx steps by 1
            // entropy reader for THIS scan (bit state never crosses scans)
            var bitBuf = 0; var bitCnt = 0
            def nextBit(): Int = {
              if (bitCnt == 0) {
                if (i >= bytes.length) return -1
                val b = bytes(i) & 0xFF
                if (b == 0xFF) {
                  if (i + 1 >= bytes.length || (bytes(i + 1) & 0xFF) != 0x00)
                    return -1 // a real marker: scan data exhausted
                  i += 2
                } else i += 1
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
            def receive(n: Int): Int = {
              var v = 0
              for (_ <- 0 until n) {
                val b = nextBit(); if (b < 0) return Int.MinValue
                v = (v << 1) | b
              }
              v
            }
            def extend(v: Int, cat: Int): Int =
              if (cat == 0) 0
              else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
              else v
            val pred = new Array[Int](nComp)
            var eobrun = 0
            def doDcBlock(c: Int, dcT: DecodeTable, off: Int): Boolean = {
              if (ah == 0) {
                val cat = huffDecode(dcT); if (cat < 0 || cat > 11) return false
                var diff = 0
                if (cat > 0) {
                  val v = receive(cat); if (v == Int.MinValue) return false
                  diff = extend(v, cat)
                }
                pred(c) += diff
                coefs(c)(off) = pred(c) << al
              } else {
                val b = nextBit(); if (b < 0) return false
                if (b == 1) coefs(c)(off) |= (1 << al)
              }
              true
            }
            def doAcFirstBlock(c: Int, acT: DecodeTable, off: Int): Boolean = {
              if (eobrun > 0) { eobrun -= 1; return true }
              var k = ss
              while (k <= se) {
                val rs = huffDecode(acT); if (rs < 0) return false
                val r = rs >> 4; val s0 = rs & 0xF
                if (s0 == 0) {
                  if (r < 15) {
                    eobrun = (1 << r) - 1
                    if (r > 0) {
                      val v = receive(r); if (v == Int.MinValue) return false
                      eobrun += v
                    }
                    return true // this block ends here
                  }
                  k += 16 // ZRL
                } else {
                  k += r
                  if (k > se) return false
                  val v = receive(s0); if (v == Int.MinValue) return false
                  coefs(c)(off + zigzag(k)) = extend(v, s0) << al
                  k += 1
                }
              }
              true
            }
            def doAcRefineBlock(c: Int, acT: DecodeTable, off: Int): Boolean = {
              val p1 = 1 << al
              def refine(z: Int): Boolean = {
                val b = nextBit(); if (b < 0) return false
                if (b == 1 && (coefs(c)(z) & p1) == 0)
                  coefs(c)(z) += (if (coefs(c)(z) >= 0) p1 else -p1)
                true
              }
              var k = ss
              if (eobrun == 0) {
                var ended = false
                while (k <= se && !ended) {
                  val rs = huffDecode(acT); if (rs < 0) return false
                  var r = rs >> 4; val s0 = rs & 0xF
                  var newVal = 0
                  if (s0 == 0) {
                    if (r < 15) { // EOB run INCLUDING this block
                      eobrun = 1 << r
                      if (r > 0) {
                        val v = receive(r); if (v == Int.MinValue) return false
                        eobrun += v
                      }
                      ended = true
                    } // r == 15: ZRL — pass over 16 zero-history coefs
                  } else {
                    if (s0 != 1) return false // refinement codes magnitude 1
                    val sb = nextBit(); if (sb < 0) return false
                    newVal = if (sb == 1) p1 else -p1
                  }
                  if (!ended) {
                    var placed = false
                    while (k <= se && !placed) {
                      val z = off + zigzag(k)
                      if (coefs(c)(z) != 0) {
                        if (!refine(z)) return false
                      } else if (r == 0) {
                        if (s0 != 0) coefs(c)(z) = newVal
                        placed = true
                      } else r -= 1
                      k += 1
                    }
                  }
                }
              }
              if (eobrun > 0) {
                while (k <= se) { // correction bits ride through EOB runs
                  val z = off + zigzag(k)
                  if (coefs(c)(z) != 0 && !refine(z)) return false
                  k += 1
                }
                eobrun -= 1
              }
              true
            }
            // arithmetic scan state (§G.2): one QM decoder per scan,
            // statistics reset at every scan start
            val aDec = if (arith) new JpegArith.Decoder(bytes, i, bytes.length)
                       else null
            val aDcStats = new Array[Array[Int]](4)
            val aAcStats = new Array[Array[Int]](4)
            if (arith) for (j <- 0 until ns) {
              if (isDc && aDcStats(dcSel(j)) == null)
                aDcStats(dcSel(j)) = JpegArith.freshStats(JpegArith.DcStatsSize)
              if (!isDc && aAcStats(acSel(j)) == null)
                aAcStats(acSel(j)) = JpegArith.freshStats(JpegArith.AcStatsSize)
            }
            val aDcCtx = new Array[Int](nComp)
            val aZz = new Array[Int](64)
            def dcBlockA(c: Int, j: Int, off: Int): Boolean = {
              val ds = aDcStats(dcSel(j))
              if (ah == 0) { // DC first: sequential model + point transform
                val (diff, nctx) = JpegArith.decodeDc(aDec, ds, aDcCtx(c),
                  dcCondL(dcSel(j)), dcCondU(dcSel(j)))
                if (diff == Int.MinValue) return false
                aDcCtx(c) = nctx
                pred(c) += diff
                coefs(c)(off) = pred(c) << al
              } else { // DC refinement: one fixed-bin correction bit
                if (aDec.decode(ds, JpegArith.FixedBin) != 0)
                  coefs(c)(off) |= (1 << al)
              }
              true
            }
            def acFirstBlockA(c: Int, j: Int, off: Int): Boolean = {
              java.util.Arrays.fill(aZz, 0)
              if (!JpegArith.decodeAc(aDec, aAcStats(acSel(j)), aZz,
                acCondKx(acSel(j)), ss, se)) return false
              var k = ss
              while (k <= se) {
                if (aZz(k) != 0) coefs(c)(off + zigzag(k)) = aZz(k) << al
                k += 1
              }
              true
            }
            def acRefineBlockA(c: Int, j: Int, off: Int): Boolean =
              JpegArith.decodeAcRefine(aDec, aAcStats(acSel(j)), coefs(c),
                off, zigzag, ss, se, al)
            // table presence (DC refinement reads raw bits — no table)
            if (!arith) for (j <- 0 until ns) {
              if (isDc && ah == 0 && dcTabs(dcSel(j)) == null) return None
              if (!isDc && acTabs(acSel(j)) == null) return None
            }
            var ok = true
            if (isDc && ns > 1) { // interleaved DC over the padded grids
              var my = 0
              while (my < mcusY && ok) {
                var mx = 0
                while (mx < mcusX && ok) {
                  var j = 0
                  while (j < ns && ok) {
                    val c = scanComp(j)
                    var bv = 0
                    while (bv < compVs(c) && ok) {
                      var bh0 = 0
                      while (bh0 < compHs(c) && ok) {
                        val off = blockOff(c, my * compVs(c) + bv,
                          mx * compHs(c) + bh0)
                        ok = if (arith) dcBlockA(c, j, off)
                             else doDcBlock(c, dcTabs(dcSel(j)), off)
                        bh0 += 1
                      }
                      bv += 1
                    }
                    j += 1
                  }
                  mx += 1
                }
                my += 1
              }
            } else { // single component: its own ceil(dim/8) grid
              val c = scanComp(0)
              var br = 0
              while (br < bH(c) && ok) {
                var bc = 0
                while (bc < bW(c) && ok) {
                  val off = blockOff(c, br, bc)
                  ok =
                    if (arith) {
                      if (isDc) dcBlockA(c, 0, off)
                      else if (ah == 0) acFirstBlockA(c, 0, off)
                      else acRefineBlockA(c, 0, off)
                    }
                    else if (isDc) doDcBlock(c, dcTabs(dcSel(0)), off)
                    else if (ah == 0) doAcFirstBlock(c, acTabs(acSel(0)), off)
                    else doAcRefineBlock(c, acTabs(acSel(0)), off)
                  bc += 1
                }
                br += 1
              }
            }
            if (!ok) return None
            // resync to the next marker (skip padding bits / stuffing)
            while (i + 1 < bytes.length &&
              !((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) != 0x00))
              i += 1
            if (i + 1 >= bytes.length) return None
          case _ => // APPn/COM/DNL: skip by length
            val len = u16(); i += len - 2
        }
      }
      if (!sofSeen || coefs == null) return None
      for (c <- 0 until nComp) if (qt(compQ(c)) == null) return None
      val comps = Array.tabulate(nComp) { c =>
        val subW = (w * compHs(c) + maxH - 1) / maxH
        val subH = (h * compVs(c) + maxV - 1) / maxV
        val padW = blocksWpad(c) * 8
        Comp(compHs(c), compVs(c), subW, subH, padW,
          new Array[Byte](padW * blocksHpad(c) * 8))
      }
      val deq = new Array[Int](64)
      val nzIdx = new Array[Int](64); val nzT = new Array[Double](64)
      for (c <- 0 until nComp) {
        val q = qt(compQ(c))
        for (br <- 0 until blocksHpad(c); bc <- 0 until blocksWpad(c)) {
          val off = blockOff(c, br, bc)
          var k = 0
          while (k < 64) { deq(zigzag(k)) = coefs(c)(off + zigzag(k)) * q(k); k += 1 }
          idctInto(deq, comps(c).plane, comps(c).padW, bc * 8, br * 8, nzIdx, nzT)
        }
      }
      Some((w, h, comps))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** sparse 2-D IDCT of one block of DEQUANTIZED raster-order
    * coefficients + level shift + clamp into a component plane at
    * (x0, y0) — folds nonzero coefficients only, bit-identical to the
    * dense sum (zero terms were exact ±0.0 adds). Shared by the
    * sequential and progressive decode paths; `nzIdx`/`nzT` are
    * caller-provided 64-slot scratch. */
  private def idctInto(coef: Array[Int], plane: Array[Byte], padW: Int,
      x0: Int, y0: Int, nzIdx: Array[Int], nzT: Array[Double]): Unit = {
    val invSqrt2 = 1.0 / math.sqrt(2)
    var nz = 0
    var idx = 0
    while (idx < 64) {
      if (coef(idx) != 0) {
        val cu = if ((idx & 7) == 0) invSqrt2 else 1.0
        val cv = if ((idx >> 3) == 0) invSqrt2 else 1.0
        nzIdx(nz) = idx
        nzT(nz) = cu * cv * coef(idx)
        nz += 1
      }
      idx += 1
    }
    var y = 0
    while (y < 8) {
      val cy = cosTab(y)
      var x = 0
      while (x < 8) {
        val cx = cosTab(x)
        var acc = 0.0
        var j = 0
        while (j < nz) {
          val id = nzIdx(j)
          acc += nzT(j) * cx(id & 7) * cy(id >> 3)
          j += 1
        }
        val s = math.round(0.25 * acc).toInt + 128
        val p = math.max(0, math.min(255, s))
        plane((y0 + y) * padW + x0 + x) = p.toByte
        x += 1
      }
      y += 1
    }
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

  /** the full baseline GRAYSCALE decode, returning the CROPPED row-major
    * 8-bit pixel plane; 3-component streams → None (use [[decodeRgb]]). */
  def decodeGrayPlane(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodePlanes(bytes).flatMap { case (w, h, comps) =>
      if (comps.length != 1) None
      else {
        val c = comps(0)
        val out = new Array[Int](w * h)
        for (y <- 0 until h; x <- 0 until w)
          out(y * w + x) = c.plane(y * c.padW + x) & 0xFF
        Some((w, h, out))
      }
    }

  /** decode a baseline single-component JPEG to pixel stats (grayscale:
    * r = g = b = sample). */
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

  /** decode a baseline JPEG (grayscale OR 3-component YCbCr) to cropped
    * row-major RGB planes: chroma upsampled by box replication (each
    * chroma sample covers its maxH/hs × maxV/vs pixel group), then the
    * fixed-point `ycbcrToRgb`. */
  def decodeRgb(bytes: Array[Byte]): Option[(Int, Int, Array[Int], Array[Int], Array[Int])] =
    decodePlanes(bytes).flatMap { case (w, h, comps) => rgbFromComps(w, h, comps) }

  private def rgbFromComps(w: Int, h: Int, comps: Array[Comp])
      : Option[(Int, Int, Array[Int], Array[Int], Array[Int])] = {
      val r = new Array[Int](w * h)
      val g = new Array[Int](w * h)
      val b = new Array[Int](w * h)
      if (comps.length == 1) {
        val c = comps(0)
        for (y <- 0 until h; x <- 0 until w) {
          val v = c.plane(y * c.padW + x) & 0xFF
          r(y * w + x) = v; g(y * w + x) = v; b(y * w + x) = v
        }
        Some((w, h, r, g, b))
      } else if (comps.length == 3) {
        val maxH = comps.map(_.hs).max; val maxV = comps.map(_.vs).max
        def at(c: Comp, x: Int, y: Int): Int = {
          // replication upsample: pixel (x,y) → chroma sample
          val sx = math.min(x * c.hs / maxH, c.subW - 1)
          val sy = math.min(y * c.vs / maxV, c.subH - 1)
          c.plane(sy * c.padW + sx) & 0xFF
        }
        for (y <- 0 until h; x <- 0 until w) {
          val (rr, gg, bb) = ycbcrToRgb(
            at(comps(0), x, y), at(comps(1), x, y), at(comps(2), x, y))
          r(y * w + x) = rr; g(y * w + x) = gg; b(y * w + x) = bb
        }
        Some((w, h, r, g, b))
      } else None
  }

  /** decode any supported baseline JPEG (gray or color) to the shared
    * exact-integer [[Multimodal.PixelStats]] fold (gray: r = g = b, so
    * the fold degenerates to the 1000·v luma of [[decodeGray]]). */
  def decodeStats(bytes: Array[Byte]): Option[Multimodal.PixelStats] =
    decodePlanes(bytes).flatMap { case (w, h, comps) =>
      rgbFromComps(w, h, comps).map { case (_, _, r, g, b) =>
        var sumR = 0L; var sumG = 0L; var sumB = 0L
        var sumL = 0L; var peakL = 0L
        var j = 0
        while (j < r.length) {
          val luma = 299L * r(j) + 587L * g(j) + 114L * b(j)
          sumR += r(j); sumG += g(j); sumB += b(j); sumL += luma
          if (luma > peakL) peakL = luma
          j += 1
        }
        Multimodal.PixelStats(w, h, comps.length, w.toLong * h,
          sumR, sumG, sumB, sumL, peakL)
      }
    }
}
