package graft.multimodal

/** MPEG-1 video (ISO/IEC 11172-2) — the INTER-FRAME class the
  * multimodal family previously rejected honestly: real motion
  * compensation (forward-predicted P pictures, differential motion
  * vectors with f-code residual bits and the modular wrap), the full
  * layer stack (sequence / GOP / picture / slice / macroblock / block
  * start codes), intra DC prediction with the spec's reset rules, the
  * default intra quantiser matrix, zigzag + mismatch-controlled
  * ("oddification") dequantisation and an IEEE-1180-accurate IDCT.
  *
  * Public format only, transcribed from the spec. SUBSET, stated
  * plainly (the arithmetic-JPEG conformance pattern — no MPEG decoder
  * exists in this container, so parity laws carry correctness and the
  * grammar below carries conformance):
  *
  *  - pictures: I and P (no B/D);
  *  - P macroblocks: ALL of table B.2b — intra (± quant), MC-not-coded,
  *    SKIPPED, and the CODED-residual types ('1' MC+coded, '01' coded,
  *    '00010'/'00001' their quant forms) with the full
  *    coded_block_pattern VLC (table B.3, all 63 values; the two
  *    codespace points outside the table reject), non-intra
  *    dequantisation against the loadable non-intra matrix, and
  *    residual-add reconstruction with saturation;
  *  - dct coefficients: intra DC via the full size tables (B.5a/B.5b),
  *    AC via END-OF-BLOCK, the (0,±1) code and the spec's ESCAPE form
  *    (6-bit run + 8/16-bit level — every run/level pair is expressible
  *    this way, and the encoder uses it exclusively); dct_coeff_first
  *    accepts '1s' and the escape form; the remaining B.5 VLC tail
  *    rejects loudly;
  *  - macroblock_address_increment: codes 1..15 + macroblock_stuffing +
  *    macroblock_escape; the 16..33 tail rejects loudly;
  *  - motion codes 0 and ±1 — with forward_f up to 16 every
  *    displacement in ±16 full pels per axis is reachable (the encoder
  *    pairs code ±1 with f-code residuals); the longer-code tail
  *    rejects loudly. Both full-pel and half-pel vector modes decode
  *    (half-pel averaging with the spec's truncating division).
  *
  * Strictness contract (DecoderFuzzSpec law): unknown start codes,
  * VLC prefixes outside the grammar, vector/geometry violations and
  * truncation reject the whole stream with None — never a crash,
  * never a partial guess.
  */
object Mpeg1 {

  // ---- encoder plans -------------------------------------------------------

  sealed trait MbPlan
  /** flat 16x16 intra macroblock (DC-only blocks → exact reconstruction). */
  final case class MbIntra(yVal: Int, cb: Int = 128, cr: Int = 128) extends MbPlan
  /** forward MC, full-pel displacement in ±16, no residual. */
  final case class MbMc(dxPel: Int, dyPel: Int) extends MbPlan
  /** skipped macroblock (P only): zero vector, copy co-located. */
  case object MbSkip extends MbPlan
  /** forward MC + CODED residual (P only, macroblock_type '1', or
    * '00010' with `requant`): a DC-only non-intra residual on all four
    * luma blocks (coded_block_pattern 60) adds `addY` to every luma pel
    * of the prediction. Oddification (mismatch control) quantises the
    * reachable exact offsets: with the slice's qscale 8, `addY` must be
    * odd with |addY| ≥ 3; with `requant` (the type carries its own
    * quantiser_scale, 16), `addY` ≡ ±2 (mod 4) with |addY| ≥ 6 — the
    * reconstruction 8·|addY|−1 rounds to |addY| exactly. */
  final case class MbMcCoded(dxPel: Int, dyPel: Int, addY: Int,
      requant: Boolean = false) extends MbPlan
  /** CODED residual without a forward vector (P only, macroblock_type
    * '01', or '00001' with `requant`): the prediction is the co-located
    * macroblock (zero vector, motion predictors reset), plus the same
    * DC-only luma residual as [[MbMcCoded]]. */
  final case class MbCoded(addY: Int, requant: Boolean = false) extends MbPlan

  final case class FramePlan(intra: Boolean, mb: (Int, Int) => MbPlan)

  final case class Frame(y: Array[Int], cb: Array[Int], cr: Array[Int])
  final case class Decoded(width: Int, height: Int, frames: Vector[Frame])

  /** default intra quantiser matrix (ISO 11172-2 §2.4.2.3), zigzag
    * order applied at use time — stored in raster order here. */
  private val DefaultIntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** zigzag scan order: zz(k) = raster index of the k-th coefficient. */
  private val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    for (s <- 0 until 15; i <- 0 to s; if s - i < 8 && i < 8) {
      val (x, y) = if (s % 2 == 0) (i, s - i) else (s - i, i)
      out(k) = y * 8 + x; k += 1
    }
    out
  }

  // ---- bit I/O -------------------------------------------------------------

  private final class BW {
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
    def startCode(code: Int): Unit = {
      align(); out.write(0); out.write(0); out.write(1); out.write(code)
    }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BR(val b: Array[Byte], var pos: Int) {
    var bit = 0
    def eof: Boolean = pos >= b.length
    def readBit(): Int = {
      if (pos >= b.length) throw Trunc
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def read(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    /** true when the aligned stream sits on a 000001 start-code prefix. */
    def atStartCode: Boolean = bit == 0 && pos + 4 <= b.length &&
      b(pos) == 0 && b(pos + 1) == 0 && b(pos + 2) == 1
    def nextStartCode(): Int = {
      align()
      if (!atStartCode) throw Trunc
      val v = b(pos + 3) & 0xFF
      pos += 4
      v
    }
  }
  private object Trunc extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  // ---- encoder -------------------------------------------------------------

  /** intra DC differential: size class + offset bits (like JPEG's DC). */
  private def putDcDiff(bw: BW, diff: Int, luma: Boolean): Unit = {
    require(diff >= -255 && diff <= 255)
    val a = math.abs(diff)
    var size = 0
    while ((1 << size) <= a) size += 1
    if (luma) {
      // table B.5a: dct_dc_size_luminance
      val codes = Array((3, 4), (2, 0), (2, 1), (3, 5), (3, 6), (4, 14),
        (5, 30), (6, 62), (7, 126))
      val (len, code) = codes(size)
      bw.put(code.toLong, len)
    } else {
      // table B.5b: dct_dc_size_chrominance
      val codes = Array((2, 0), (2, 1), (2, 2), (3, 6), (4, 14), (5, 30),
        (6, 62), (7, 126), (8, 254))
      val (len, code) = codes(size)
      bw.put(code.toLong, len)
    }
    if (size > 0) {
      val bits = if (diff >= 0) diff else diff + (1 << size) - 1
      bw.put(bits.toLong, size)
    }
  }

  /** coded_block_pattern VLC (ISO 11172-2 table B.3): cbp →
    * (code, length). cbp = 32·Y0 + 16·Y1 + 8·Y2 + 4·Y3 + 2·Cb + Cr;
    * value 0 has no code (a macroblock with no coded blocks uses a
    * not-coded type), and the two 9-bit points '000000000'/'000000001'
    * are outside the table — they reject. */
  private[multimodal] val CbpCodes: Map[Int, (Int, Int)] = Map(
    60 -> ((0x7, 3)),
    4 -> ((0xD, 4)), 8 -> ((0xC, 4)), 16 -> ((0xB, 4)), 32 -> ((0xA, 4)),
    12 -> ((0x13, 5)), 48 -> ((0x12, 5)), 20 -> ((0x11, 5)),
    40 -> ((0x10, 5)), 28 -> ((0xF, 5)), 44 -> ((0xE, 5)),
    52 -> ((0xD, 5)), 56 -> ((0xC, 5)), 1 -> ((0xB, 5)),
    61 -> ((0xA, 5)), 2 -> ((0x9, 5)), 62 -> ((0x8, 5)),
    24 -> ((0xF, 6)), 36 -> ((0xE, 6)), 3 -> ((0xD, 6)), 63 -> ((0xC, 6)),
    5 -> ((0x17, 7)), 9 -> ((0x16, 7)), 17 -> ((0x15, 7)),
    33 -> ((0x14, 7)), 6 -> ((0x13, 7)), 10 -> ((0x12, 7)),
    18 -> ((0x11, 7)), 34 -> ((0x10, 7)),
    7 -> ((0x1F, 8)), 11 -> ((0x1E, 8)), 19 -> ((0x1D, 8)),
    35 -> ((0x1C, 8)), 13 -> ((0x1B, 8)), 49 -> ((0x1A, 8)),
    21 -> ((0x19, 8)), 41 -> ((0x18, 8)), 14 -> ((0x17, 8)),
    50 -> ((0x16, 8)), 22 -> ((0x15, 8)), 42 -> ((0x14, 8)),
    15 -> ((0x13, 8)), 51 -> ((0x12, 8)), 23 -> ((0x11, 8)),
    43 -> ((0x10, 8)), 25 -> ((0xF, 8)), 37 -> ((0xE, 8)),
    26 -> ((0xD, 8)), 38 -> ((0xC, 8)), 29 -> ((0xB, 8)),
    45 -> ((0xA, 8)), 53 -> ((0x9, 8)), 57 -> ((0x8, 8)),
    30 -> ((0x7, 8)), 46 -> ((0x6, 8)), 54 -> ((0x5, 8)),
    58 -> ((0x4, 8)),
    31 -> ((0x7, 9)), 47 -> ((0x6, 9)), 55 -> ((0x5, 9)),
    59 -> ((0x4, 9)), 27 -> ((0x3, 9)), 39 -> ((0x2, 9)))

  private val CbpDecode: Map[(Int, Int), Int] =
    CbpCodes.map { case (v, (c, l)) => ((l, c), v) }

  private def putCbp(bw: BW, cbp: Int): Unit = {
    val (code, len) = CbpCodes(cbp)
    bw.put(code.toLong, len)
  }

  private def readCbp(br: BR): Int = {
    var code = 0; var len = 0
    while (len < 9) {
      code = (code << 1) | br.readBit(); len += 1
      CbpDecode.get((len, code)) match {
        case Some(v) => return v
        case None => ()
      }
    }
    throw Trunc // '000000000'/'000000001': outside table B.3
  }

  /** the level a DC-only non-intra residual must carry so the
    * reconstruction adds exactly `addY` to every pel (see [[MbMcCoded]]
    * for the reachable sets): rec = 8·|addY|−1, which the IDCT's
    * round(rec/8) maps to |addY|. */
  private def residualLevel(addY: Int, q: Int): Int = {
    val a = math.abs(addY)
    val lvl = q match {
      case 8 =>
        require(a >= 3 && a % 2 == 1,
          s"qscale 8 reaches odd offsets >= 3, not $addY")
        (a - 1) / 2
      case 16 =>
        require(a >= 6 && a % 4 == 2,
          s"qscale 16 reaches offsets === 2 (mod 4) >= 6, not $addY")
        (a - 2) / 4
      case _ => throw new IllegalArgumentException(s"unsupported qscale $q")
    }
    require(lvl >= 1 && lvl <= 127, s"residual level $lvl out of 8-bit escape range")
    if (addY > 0) lvl else -lvl
  }

  /** DC-only non-intra residual block: dct_coeff_first as the spec's
    * ESCAPE form (run 0, 8-bit level), then EOB. */
  private def putResidualBlock(bw: BW, level: Int): Unit = {
    bw.put(1, 6)                        // '000001' escape
    bw.put(0, 6)                        // run 0
    bw.put((level & 0xFF).toLong, 8)    // level in -127..127, never 0/-128
    bw.put(2, 2)                        // EOB
  }

  /** differential motion component with forward_f = 16: any delta in
    * ±16 is code ±1 + 4 residual bits; zero is '1'. */
  private def putMotion(bw: BW, delta: Int): Unit = {
    require(delta >= -16 && delta <= 16)
    if (delta == 0) bw.put(1, 1) // motion_code 0
    else {
      if (delta > 0) bw.put(2, 3)  // '010' = +1
      else bw.put(3, 3)            // '011' = -1
      bw.put((math.abs(delta) - 1).toLong, 4) // motion_r, f_code 5
    }
  }

  /** encode a planned sequence; w and h must be multiples of 16 and the
    * first frame must be intra. */
  def encode(w: Int, h: Int, frames: Seq[FramePlan]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0)
    require(w <= 4095 && h <= 4095 && frames.nonEmpty && frames.head.intra)
    val mbW = w / 16; val mbH = h / 16
    val bw = new BW
    bw.startCode(0xB3) // sequence header
    bw.put(w.toLong, 12); bw.put(h.toLong, 12)
    bw.put(1, 4)        // pel aspect 1:1
    bw.put(3, 4)        // 25 fps
    bw.put(0x3FFFF, 18) // variable bit rate
    bw.put(1, 1)        // marker
    bw.put(0, 10)       // vbv buffer size
    bw.put(0, 1)        // constrained flag
    bw.put(0, 1); bw.put(0, 1) // no custom quant matrices
    bw.startCode(0xB8) // GOP
    bw.put(0, 1); bw.put(0, 5); bw.put(0, 6) // drop, hours, minutes
    bw.put(1, 1)                             // marker
    bw.put(0, 6); bw.put(0, 6)               // seconds, pictures
    bw.put(1, 1); bw.put(0, 1)               // closed_gop, broken_link
    frames.zipWithIndex.foreach { case (fp, fi) =>
      bw.startCode(0x00) // picture
      bw.put((fi % 1024).toLong, 10)
      bw.put(if (fp.intra) 1 else 2, 3)
      bw.put(0xFFFF, 16) // vbv_delay
      if (!fp.intra) {
        bw.put(1, 1) // full_pel_forward_vector
        bw.put(5, 3) // forward_f_code 5 -> f = 16
      }
      bw.put(0, 1) // extra_bit_picture
      for (row <- 0 until mbH) {
        bw.startCode(row + 1) // slice per macroblock row
        bw.put(8, 5)          // quantizer_scale
        bw.put(0, 1)          // extra_bit_slice
        var dcPredY = 1024; var dcPredCb = 1024; var dcPredCr = 1024
        var mvPredX = 0; var mvPredY = 0
        var pendingInc = 1
        var curQ = 8 // quantizer_scale persists across macroblocks
        for (bx <- 0 until mbW) {
          fp.mb(bx, row) match {
            case MbSkip =>
              require(!fp.intra && bx > 0 && bx < mbW - 1,
                "skips are interior P macroblocks")
              pendingInc += 1
              dcPredY = 1024; dcPredCb = 1024; dcPredCr = 1024
              mvPredX = 0; mvPredY = 0
            case MbIntra(yv, cbv, crv) =>
              require(pendingInc == 1 || !fp.intra)
              require(pendingInc <= 15, "encoder keeps increments <= 15")
              // address increment codes 1..15 (table B.1 head)
              putAddrInc(bw, pendingInc); pendingInc = 1
              if (fp.intra) bw.put(1, 1) // I: '1' intra
              else bw.put(3, 5)          // P: '00011' intra
              for (blk <- 0 until 6) {
                val (flat, luma) = blk match {
                  case 0 | 1 | 2 | 3 => (yv, true)
                  case 4 => (cbv, false)
                  case _ => (crv, false)
                }
                val dc = flat * 8
                val pred = if (luma) dcPredY else if (blk == 4) dcPredCb else dcPredCr
                putDcDiff(bw, (dc - pred) / 8, luma)
                if (luma) dcPredY = dc
                else if (blk == 4) dcPredCb = dc else dcPredCr = dc
                bw.put(2, 2) // EOB '10' — DC-only block
              }
              mvPredX = 0; mvPredY = 0
            case MbMc(dx, dy) =>
              require(!fp.intra, "MC macroblocks only in P pictures")
              require(pendingInc <= 15)
              putAddrInc(bw, pendingInc); pendingInc = 1
              bw.put(1, 3) // '001' = MC, not coded
              putMotion(bw, dx - mvPredX)
              putMotion(bw, dy - mvPredY)
              mvPredX = dx; mvPredY = dy
              dcPredY = 1024; dcPredCb = 1024; dcPredCr = 1024
            case MbMcCoded(dx, dy, addY, requant) =>
              require(!fp.intra, "coded P macroblocks only in P pictures")
              require(pendingInc <= 15)
              putAddrInc(bw, pendingInc); pendingInc = 1
              if (requant) { bw.put(2, 5); bw.put(16, 5); curQ = 16 } // '00010' + qscale
              else bw.put(1, 1)                                       // '1'
              val lvl = residualLevel(addY, curQ)
              putMotion(bw, dx - mvPredX)
              putMotion(bw, dy - mvPredY)
              mvPredX = dx; mvPredY = dy
              putCbp(bw, 60) // all four luma blocks coded, chroma not
              for (_ <- 0 until 4) putResidualBlock(bw, lvl)
              dcPredY = 1024; dcPredCb = 1024; dcPredCr = 1024
            case MbCoded(addY, requant) =>
              require(!fp.intra, "coded P macroblocks only in P pictures")
              require(pendingInc <= 15)
              putAddrInc(bw, pendingInc); pendingInc = 1
              if (requant) { bw.put(1, 5); bw.put(16, 5); curQ = 16 } // '00001' + qscale
              else bw.put(1, 2)                                       // '01'
              val lvl = residualLevel(addY, curQ)
              putCbp(bw, 60)
              for (_ <- 0 until 4) putResidualBlock(bw, lvl)
              // no forward vector: zero-vector prediction, predictors reset
              mvPredX = 0; mvPredY = 0
              dcPredY = 1024; dcPredCb = 1024; dcPredCr = 1024
          }
        }
      }
    }
    bw.startCode(0xB7) // sequence end
    bw.bytes
  }

  private def putAddrInc(bw: BW, inc: Int): Unit = inc match {
    case 1 => bw.put(1, 1)
    case 2 => bw.put(3, 3)
    case 3 => bw.put(2, 3)
    case 4 => bw.put(3, 4)
    case 5 => bw.put(2, 4)
    case 6 => bw.put(3, 5)
    case 7 => bw.put(2, 5)
    case 8 => bw.put(7, 7)
    case 9 => bw.put(6, 7)
    case 10 => bw.put(11, 8)
    case 11 => bw.put(10, 8)
    case 12 => bw.put(9, 8)
    case 13 => bw.put(8, 8)
    case 14 => bw.put(7, 8)
    case _ => bw.put(6, 8) // 15
  }

  // ---- decoder -------------------------------------------------------------

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decodeImpl(bytes)
    catch {
      case Trunc => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def decodeImpl(bytes: Array[Byte]): Option[Decoded] = {
    val br = new BR(bytes, 0)
    if (br.nextStartCode() != 0xB3) return None
    val w = br.read(12); val h = br.read(12)
    if (w <= 0 || h <= 0 || w % 16 != 0 || h % 16 != 0) return None
    if (w.toLong * h > (1L << 24)) return None
    br.read(4); br.read(4) // aspect, rate
    br.read(18)
    if (br.read(1) != 1) return None // marker
    br.read(10); br.read(1)
    val intraQ = DefaultIntraQ.clone()
    if (br.read(1) == 1) { // load_intra_quantiser_matrix (zigzag order)
      var k = 0
      while (k < 64) { intraQ(Zigzag(k)) = br.read(8); k += 1 }
      if (intraQ.exists(_ == 0)) return None
    }
    // load_non_intra_quantiser_matrix (zigzag order; default all 16) —
    // the coded-residual path dequantises with it, so it must be
    // captured, not skipped
    val nonIntraQ = Array.fill(64)(16)
    if (br.read(1) == 1) {
      var k = 0
      while (k < 64) { nonIntraQ(Zigzag(k)) = br.read(8); k += 1 }
      if (nonIntraQ.exists(_ == 0)) return None
    }
    val mbW = w / 16; val mbH = h / 16
    val frames = Vector.newBuilder[Frame]
    var prev: Frame = null
    var nFrames = 0
    var done = false
    while (!done) {
      br.align()
      val sc = br.nextStartCode()
      sc match {
        case 0xB7 => done = true
        case 0xB8 => // GOP header
          br.read(25); br.read(1); br.read(1)
        case 0x00 => // picture
          nFrames += 1
          if (nFrames > 4096) return None
          br.read(10) // temporal reference
          val ptype = br.read(3)
          if (ptype != 1 && ptype != 2) return None // I/P only
          if (ptype == 2 && prev == null) return None
          br.read(16) // vbv_delay
          var fullPel = false; var fwdF = 1; var fwdRBits = 0
          if (ptype == 2) {
            fullPel = br.read(1) == 1
            val fc = br.read(3)
            if (fc < 1 || fc > 7) return None
            fwdRBits = fc - 1
            fwdF = 1 << fwdRBits
          }
          while (br.read(1) == 1) br.read(8) // extra picture information
          val cur = Frame(new Array[Int](w * h),
            new Array[Int](w / 2 * (h / 2)), new Array[Int](w / 2 * (h / 2)))
          // ---- slices ----
          var sliceDone = false
          var anySlice = false
          val covered = new Array[Boolean](mbW * mbH)
          while (!sliceDone) {
            br.align()
            if (!br.atStartCode) throw Trunc
            val nsc = bytes(br.pos + 3) & 0xFF
            if (nsc >= 1 && nsc <= 0xAF) {
              br.nextStartCode()
              anySlice = true
              decodeSlice(br, nsc, cur, prev, mbW, mbH, w, h, ptype,
                fullPel, fwdF, fwdRBits, intraQ, nonIntraQ, covered)
                .getOrElse(return None)
            } else sliceDone = true
          }
          if (!anySlice) return None
          if (!covered.forall(identity)) return None // slices must tile
          frames += cur
          prev = cur
        case _ => return None
      }
    }
    if (nFrames == 0) return None
    // trailing garbage check: only zero stuffing may follow
    br.align()
    while (br.pos < bytes.length) { if (bytes(br.pos) != 0) return None; br.pos += 1 }
    Some(Decoded(w, h, frames.result()))
  }

  /** address-increment VLC: 1..15 + stuffing + escape; the 16..33 tail
    * rejects (subset, stated in the object doc). */
  private def readAddrInc(br: BR): Int = {
    var esc = 0
    while (true) {
      if (br.readBit() == 1) return esc + 1
      if (br.readBit() == 1)
        return esc + (if (br.readBit() == 1) 2 else 3)
      if (br.readBit() == 1)
        return esc + (if (br.readBit() == 1) 4 else 5)
      if (br.readBit() == 1)
        return esc + (if (br.readBit() == 1) 6 else 7)
      // prefix '0000'
      if (br.readBit() == 1) { // '00001'
        if (br.readBit() == 1)
          return esc + (if (br.readBit() == 1) 8 else 9)
        val t = br.read(2) // '000010tt'
        return esc + (t match {
          case 3 => 10; case 2 => 11; case 1 => 12; case _ => 13 })
      }
      // prefix '00000'
      if (br.readBit() == 1) { // '000001'
        if (br.readBit() == 1)
          return esc + (if (br.readBit() == 1) 14 else 15)
        throw Trunc // '0000010': B.1 codes 16..21 — subset reject
      }
      // prefix '000000'
      if (br.readBit() == 1) throw Trunc // '0000001': codes 22..33
      // prefix '0000000'
      if (br.readBit() != 1) throw Trunc // '00000000' is not a code
      // '00000001' + 3 bits: stuffing '111', escape '000'
      val t = br.read(3)
      if (t == 7) ()                                   // stuffing: loop
      else if (t == 0) { esc += 33; if (esc > 33 * 64) throw Trunc }
      else throw Trunc
    }
    0 // unreachable
  }

  private def readMotion(br: BR, rBits: Int, f: Int, pred: Int): Int = {
    // motion codes 0, +1 ('010'), -1 ('011'); longer codes reject
    val code =
      if (br.readBit() == 1) 0
      else if (br.readBit() == 1) { if (br.readBit() == 1) -1 else 1 }
      else throw Trunc
    var delta = 0
    if (code != 0) {
      val r = if (rBits > 0) br.read(rBits) else 0
      val mag = (math.abs(code) - 1) * f + r + 1
      delta = if (code > 0) mag else -mag
    }
    var v = pred + delta
    if (v > 16 * f - 1) v -= 32 * f
    if (v < -16 * f) v += 32 * f
    v
  }

  private def readDcDiff(br: BR, luma: Boolean): Int = {
    var size = -1
    if (luma) {
      // B.5a: '00'=1? No: '100'=0,'00'=1,'01'=2,'101'=3,'110'=4,'1110'=5,
      // '11110'=6,'111110'=7,'1111110'=8
      if (br.readBit() == 0) size = if (br.readBit() == 0) 1 else 2
      else {
        if (br.readBit() == 0) size = if (br.readBit() == 0) 0 else 3
        else {
          if (br.readBit() == 0) size = 4
          else if (br.readBit() == 0) size = 5
          else if (br.readBit() == 0) size = 6
          else if (br.readBit() == 0) size = 7
          else if (br.readBit() == 0) size = 8
          else throw Trunc
        }
      }
    } else {
      // B.5b: '00'=0,'01'=1,'10'=2,'110'=3,'1110'=4,...,'11111110'=8
      if (br.readBit() == 0) size = if (br.readBit() == 0) 0 else 1
      else {
        if (br.readBit() == 0) size = 2
        else if (br.readBit() == 0) size = 3
        else if (br.readBit() == 0) size = 4
        else if (br.readBit() == 0) size = 5
        else if (br.readBit() == 0) size = 6
        else if (br.readBit() == 0) size = 7
        else if (br.readBit() == 0) size = 8
        else throw Trunc
      }
    }
    if (size == 0) 0
    else {
      val bits = br.read(size)
      if (bits >= (1 << (size - 1))) bits else bits - (1 << size) + 1
    }
  }

  /** the ESCAPE form's run + level (6-bit run, 8/16-bit level). */
  private def readEscRunLevel(br: BR): (Int, Int) = {
    val run = br.read(6)
    var level = br.read(8)
    level = if (level >= 128) level - 256 else level
    if (level == 0) level = br.read(8)                    // 128..255
    else if (level == -128) level = br.read(8) - 256      // -256..-129
    if (level == 0) throw Trunc
    (run, level)
  }

  /** dct_coeff_next subset: EOB '10', (0,±1) '11s', escape '000001';
    * `k0` = index of the last written coefficient. */
  private def readAcInto(br: BR, zz: Array[Int], k0: Int = 0): Unit = {
    var k = k0
    var eob = false
    while (!eob) {
      if (br.readBit() == 1) {
        if (br.readBit() == 0) eob = true
        else { // (0, ±1)
          val level = if (br.readBit() == 1) -1 else 1
          k += 1
          if (k > 63) throw Trunc
          zz(k) = level
        }
      } else {
        // expect escape '000001' (we already consumed one 0)
        var zeros = 1
        var one = false
        while (!one) {
          if (br.readBit() == 1) one = true
          else { zeros += 1; if (zeros > 5) throw Trunc }
        }
        if (zeros != 5) throw Trunc // other B.5 codes: subset reject
        val (run, level) = readEscRunLevel(br)
        k += run + 1
        if (k > 63) throw Trunc
        zz(k) = level
      }
    }
  }

  /** one CODED non-intra block: dct_coeff_first ('1s' = (0,±1) — EOB
    * cannot be first — or the escape form), then dct_coeff_next to EOB,
    * dequantised with the non-intra reconstruction
    * rec = ((2·QFS + Sign(QFS)) · W · QS) / 16 (truncating toward
    * zero), mismatch-controlled and clamped to ±2048. Returns the
    * raster-order coefficient block. */
  private def readNonIntraBlock(br: BR, qScale: Int,
      nonIntraQ: Array[Int]): Array[Int] = {
    val zz = new Array[Int](64)
    var k0 = 0
    if (br.readBit() == 1) {
      zz(0) = if (br.readBit() == 1) -1 else 1 // '1s': run 0, level ±1
    } else {
      var zeros = 1
      var one = false
      while (!one) {
        if (br.readBit() == 1) one = true
        else { zeros += 1; if (zeros > 5) throw Trunc }
      }
      if (zeros != 5) throw Trunc // remaining B.5 first-codes: subset reject
      val (run, level) = readEscRunLevel(br)
      if (run > 63) throw Trunc
      zz(run) = level
      k0 = run
    }
    readAcInto(br, zz, k0)
    val coef = new Array[Int](64)
    var k = 0
    while (k < 64) {
      val lvl = zz(k)
      if (lvl != 0) {
        val s = if (lvl > 0) 1 else -1
        var v = ((2 * lvl + s) * qScale * nonIntraQ(Zigzag(k))) / 16
        if (v != 0 && (v & 1) == 0) v -= (if (v > 0) 1 else -1)
        if (v > 2047) v = 2047
        if (v < -2048) v = -2048
        coef(Zigzag(k)) = v
      }
      k += 1
    }
    coef
  }

  private def copyMb(cur: Frame, prev: Frame, bx: Int, by: Int,
      dx: Int, dy: Int, w: Int, h: Int, fullPel: Boolean): Unit = {
    // luma: vector units are full pels (fullPel) or half pels
    val (ix, hx) = if (fullPel) (dx, 0) else (dx >> 1, dx & 1)
    val (iy, hy) = if (fullPel) (dy, 0) else (dy >> 1, dy & 1)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val sx = bx * 16 + x + ix
        val sy = by * 16 + y + iy
        if (sx < 0 || sy < 0 || sx + hx > w - 1 || sy + hy > h - 1) throw Trunc
        val p0 = prev.y(sy * w + sx)
        val v =
          if (hx == 0 && hy == 0) p0
          else if (hy == 0) (p0 + prev.y(sy * w + sx + 1)) / 2
          else if (hx == 0) (p0 + prev.y((sy + 1) * w + sx)) / 2
          else (p0 + prev.y(sy * w + sx + 1) + prev.y((sy + 1) * w + sx) +
            prev.y((sy + 1) * w + sx + 1)) / 4
        cur.y((by * 16 + y) * w + bx * 16 + x) = v
        x += 1
      }
      y += 1
    }
    // chroma: half the luma vector (toward zero), quarter resolution
    val cw = w / 2; val ch = h / 2
    val cdxU = (if (fullPel) dx * 2 else dx) / 2
    val cdyU = (if (fullPel) dy * 2 else dy) / 2
    val (cix, chx) = (cdxU >> 1, cdxU & 1)
    val (ciy, chy) = (cdyU >> 1, cdyU & 1)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val sx = bx * 8 + cx + cix
        val sy = by * 8 + cy + ciy
        if (sx < 0 || sy < 0 || sx + chx > cw - 1 || sy + chy > ch - 1)
          throw Trunc
        def samp(pl: Array[Int]): Int = {
          val p0 = pl(sy * cw + sx)
          if (chx == 0 && chy == 0) p0
          else if (chy == 0) (p0 + pl(sy * cw + sx + 1)) / 2
          else if (chx == 0) (p0 + pl((sy + 1) * cw + sx)) / 2
          else (p0 + pl(sy * cw + sx + 1) + pl((sy + 1) * cw + sx) +
            pl((sy + 1) * cw + sx + 1)) / 4
        }
        cur.cb((by * 8 + cy) * cw + bx * 8 + cx) = samp(prev.cb)
        cur.cr((by * 8 + cy) * cw + bx * 8 + cx) = samp(prev.cr)
        cx += 1
      }
      cy += 1
    }
  }

  private val cosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))

  /** true iff every AC coefficient is zero — the dominant block class
    * in I-picture-heavy streams; its IDCT is one constant. */
  private def dcOnly(coef: Array[Int]): Boolean = {
    var idx = 1
    while (idx < 64) { if (coef(idx) != 0) return false; idx += 1 }
    true
  }

  /** IDCT of one dequantised block into a plane (no level shift —
    * MPEG intra blocks carry the full 0..255 range). */
  private def idctInto(coef: Array[Int], plane: Array[Int], pw: Int,
      x0: Int, y0: Int): Unit = {
    if (dcOnly(coef)) {
      // exact fast path: every pel is round(DC/8). Equality with the
      // general fold (whose (1/√2)² is one ulp BELOW 0.5) needs DC/8 to
      // never sit on a rounding half-point — and it can't: reachable
      // DC-only coefficients are multiples of 8 (intra DC = pred +
      // 8·diff), odd (every nonzero dequantised coefficient is
      // mismatch-controlled odd), or the −2048 clamp — never ≡ 4
      // (mod 8), so both paths round identically on every legal stream.
      val s = math.max(0, math.min(255, math.round(0.25 * (coef(0) / 2.0)).toInt))
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { plane((y0 + y) * pw + x0 + x) = s; x += 1 }
        y += 1
      }
      return
    }
    val invSqrt2 = 1.0 / math.sqrt(2)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var idx = 0
        while (idx < 64) {
          val c = coef(idx)
          if (c != 0) {
            val u = idx & 7; val v = idx >> 3
            val cu = if (u == 0) invSqrt2 else 1.0
            val cv = if (v == 0) invSqrt2 else 1.0
            acc += cu * cv * c * cosTab(x)(u) * cosTab(y)(v)
          }
          idx += 1
        }
        val s = math.round(0.25 * acc).toInt
        plane((y0 + y) * pw + x0 + x) = math.max(0, math.min(255, s))
        x += 1
      }
      y += 1
    }
  }

  /** IDCT of a dequantised RESIDUAL block, ADDED to the prediction
    * already in the plane and clamped to 0..255 (the coded P-macroblock
    * reconstruction). */
  private def addIdctInto(coef: Array[Int], plane: Array[Int], pw: Int,
      x0: Int, y0: Int): Unit = {
    if (dcOnly(coef)) {
      // exact by the same reachability argument as idctInto's fast path
      val s = math.round(0.25 * (coef(0) / 2.0)).toInt
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val p = (y0 + y) * pw + x0 + x
          plane(p) = math.max(0, math.min(255, plane(p) + s))
          x += 1
        }
        y += 1
      }
      return
    }
    val invSqrt2 = 1.0 / math.sqrt(2)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var idx = 0
        while (idx < 64) {
          val c = coef(idx)
          if (c != 0) {
            val u = idx & 7; val v = idx >> 3
            val cu = if (u == 0) invSqrt2 else 1.0
            val cv = if (v == 0) invSqrt2 else 1.0
            acc += cu * cv * c * cosTab(x)(u) * cosTab(y)(v)
          }
          idx += 1
        }
        val s = math.round(0.25 * acc).toInt
        val p = (y0 + y) * pw + x0 + x
        plane(p) = math.max(0, math.min(255, plane(p) + s))
        x += 1
      }
      y += 1
    }
  }

  private def decodeSlice(br: BR, sliceRow: Int, cur: Frame, prev: Frame,
      mbW: Int, mbH: Int, w: Int, h: Int, ptype: Int, fullPel: Boolean,
      fwdF: Int, fwdRBits: Int, intraQ: Array[Int], nonIntraQ: Array[Int],
      covered: Array[Boolean]): Option[Unit] = {
    if (sliceRow > mbH) return None
    var qScale = br.read(5)
    if (qScale == 0) return None
    while (br.read(1) == 1) br.read(8) // extra slice information
    var mbAddr = (sliceRow - 1) * mbW - 1
    var dcPredY = 1024; var dcPredCb = 1024; var dcPredCr = 1024
    var mvX = 0; var mvY = 0
    var first = true
    var more = true
    while (more) {
      val inc = readAddrInc(br)
      if (ptype == 1 && inc != 1) return None // no skips in I pictures
      if (inc > 1) {
        // skipped macroblocks (P): co-located copy, predictors reset
        if (ptype != 2 || first) return None
        var s = 1
        while (s < inc) {
          val sk = mbAddr + s
          if (sk < 0 || sk >= mbW * mbH || covered(sk)) return None
          covered(sk) = true
          copyMb(cur, prev, sk % mbW, sk / mbW, 0, 0, w, h, fullPel = true)
          s += 1
        }
        dcPredY = 1024; dcPredCb = 1024; dcPredCr = 1024
        mvX = 0; mvY = 0
      }
      mbAddr += inc
      first = false
      if (mbAddr < 0 || mbAddr >= mbW * mbH || covered(mbAddr)) return None
      covered(mbAddr) = true
      val bx = mbAddr % mbW; val by = mbAddr / mbW
      // ---- macroblock type (table B.2a for I, B.2b for P) ----
      var intra = false; var mc = false; var quant = false; var coded = false
      if (ptype == 1) {
        if (br.readBit() == 1) intra = true
        else if (br.readBit() == 1) { intra = true; quant = true }
        else return None
      } else {
        if (br.readBit() == 1) { mc = true; coded = true } // '1' MC + coded
        else if (br.readBit() == 1) coded = true           // '01' coded, no MC
        else if (br.readBit() == 1) mc = true              // '001' MC, not coded
        else if (br.readBit() == 1) {
          if (br.readBit() == 1) intra = true              // '00011'
          else { mc = true; coded = true; quant = true }   // '00010'
        }
        else if (br.readBit() == 1) { coded = true; quant = true } // '00001'
        else if (br.readBit() == 1) { intra = true; quant = true } // '000001'
        else return None
      }
      if (quant) {
        qScale = br.read(5)
        if (qScale == 0) return None
      }
      if (!intra && ptype == 2) {
        // prediction: forward vectors when present, else the co-located
        // macroblock with a zero vector (types '01'/'00001' — their
        // motion predictors also reset, §2.4.4.2)
        if (mc) {
          mvX = readMotion(br, fwdRBits, fwdF, mvX)
          mvY = readMotion(br, fwdRBits, fwdF, mvY)
          copyMb(cur, prev, bx, by, mvX, mvY, w, h, fullPel)
        } else {
          mvX = 0; mvY = 0
          copyMb(cur, prev, bx, by, 0, 0, w, h, fullPel = true)
        }
        dcPredY = 1024; dcPredCb = 1024; dcPredCr = 1024
        if (coded) {
          val cbp = readCbp(br)
          var blk = 0
          while (blk < 6) {
            if ((cbp & (32 >> blk)) != 0) {
              val coef = readNonIntraBlock(br, qScale, nonIntraQ)
              if (blk < 4) {
                val x0 = bx * 16 + (blk & 1) * 8
                val y0 = by * 16 + (blk >> 1) * 8
                addIdctInto(coef, cur.y, w, x0, y0)
              } else {
                val pl = if (blk == 4) cur.cb else cur.cr
                addIdctInto(coef, pl, w / 2, bx * 8, by * 8)
              }
            }
            blk += 1
          }
        }
      } else {
        // intra macroblock: six DC(+escape-AC) blocks
        var blk = 0
        while (blk < 6) {
          val luma = blk < 4
          val diff = readDcDiff(br, luma)
          val pred = if (luma) dcPredY else if (blk == 4) dcPredCb else dcPredCr
          val dc = pred + diff * 8
          if (dc < 0 || dc > 2047) return None
          if (luma) dcPredY = dc
          else if (blk == 4) dcPredCb = dc else dcPredCr = dc
          val zz = new Array[Int](64)
          readAcInto(br, zz)
          val coef = new Array[Int](64)
          coef(0) = dc
          var k = 1
          while (k < 64) {
            val lvl = zz(k)
            if (lvl != 0) {
              var v = (2 * lvl * qScale * intraQ(Zigzag(k))) / 16
              if (v != 0 && (v & 1) == 0) v -= (if (v > 0) 1 else -1)
              if (v > 2047) v = 2047
              if (v < -2048) v = -2048
              coef(Zigzag(k)) = v
            }
            k += 1
          }
          if (luma) {
            val x0 = bx * 16 + (blk & 1) * 8
            val y0 = by * 16 + (blk >> 1) * 8
            idctInto(coef, cur.y, w, x0, y0)
          } else {
            val pl = if (blk == 4) cur.cb else cur.cr
            idctInto(coef, pl, w / 2, bx * 8, by * 8)
          }
          blk += 1
        }
        mvX = 0; mvY = 0
      }
      // the slice ends when only zero stuffing separates us from the
      // next start code (the spec's "next 23 bits are zero" test) —
      // macroblock data is NOT byte-aligned mid-slice
      val end = sliceEndPos(br)
      if (end >= 0) {
        br.bit = 0; br.pos = end
        more = false
        if (mbAddr % mbW != mbW - 1) return None // encoder scope: row slices
      }
    }
    Some(())
  }

  /** byte offset of the next start code if the stream sits at a slice
    * end (remaining bits of the byte zero, then zero bytes, then
    * 00 00 01); -1 when more macroblock data follows. */
  private def sliceEndPos(br: BR): Int = {
    val b = br.b
    if (br.pos >= b.length) return -1
    if (br.bit != 0 && (b(br.pos) & ((1 << (8 - br.bit)) - 1)) != 0)
      return -1
    var p = if (br.bit == 0) br.pos else br.pos + 1
    var zeros = 0
    while (p < b.length && b(p) == 0) { p += 1; zeros += 1 }
    if (p < b.length && b(p) == 1 && zeros >= 2) p - 2 else -1
  }
}
