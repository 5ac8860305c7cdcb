package graft.multimodal

/** H.264 / AVC (ITU-T H.264, ISO/IEC 14496-10) — INTRA-ONLY baseline:
  * the dominant real-crawl video codec's tractable core, transcribed
  * from the public spec the way [[Mpeg1]] transcribed ISO 11172-2. Real
  * NAL framing with emulation-prevention bytes, Exp-Golomb headers
  * (SPS/PPS/IDR slice), macroblock-layer CAVLC entropy coding, the
  * normative dequantisation (8.5.10/8.5.12 v-matrix), the 4x4 integer
  * inverse transform and luma-DC inverse Hadamard, and spatial intra
  * prediction with the spec's availability rules.
  *
  * SUBSET, stated plainly (no H.264 decoder exists in this container;
  * parity laws + table laws in H264Spec carry correctness):
  *
  *  - NAL: SPS(7) / PPS(8) / IDR slice(5); anything else rejects.
  *    Emulation prevention 00 00 03 is implemented on both sides
  *    (insert on encode, strip + validate on decode) — though H264Spec
  *    proves in-subset streams can never NEED it (the longest zero run
  *    this grammar can emit is the 16-zero level prefix, '1'-terminated,
  *    below the 22-zero-bit escape threshold), so the decode path is
  *    law-tested structurally and by fuzz.
  *  - SPS: profile 66 (Baseline), 4:2:0, 8-bit, frame_mbs_only,
  *    pic_order_cnt_type 2, no cropping, no VUI; dimensions must be
  *    multiples of 16. PPS: CAVLC only (entropy_coding_mode 0 — CABAC
  *    rejects), one slice group, deblocking-control present.
  *  - Slices: I (slice_type 7/2) and MOTION-COMPENSATED P (slice_type
  *    5/0): mb_skip_run-interleaved P_Skip macroblocks (motion = the
  *    normative 8.4.1.1 predictor over the real neighbor state) and
  *    P_L0_16x16 macroblocks with se(v) mvd against the 8.4.1.3 median
  *    predictor, single reference (the previous decoded picture),
  *    INTEGER-PEL vectors only (a resolved mv with a fractional
  *    component rejects — the 6-tap half-pel / quarter-pel
  *    interpolation is the stated cut), edge-clamped reference fetch
  *    per 8.4.2.2.1, and CBP 0 or luma-15 TC≤1 residuals (other inter
  *    codepoints, 16x8/8x16/8x8 partitions, ref_idx > 0 and intra-in-P
  *    macroblock types reject). One slice per picture,
  *    disable_deblocking_filter_idc MUST be 1 (in-loop deblocking is
  *    out of subset; streams that enable it reject — reconstruction
  *    here is bit-exact, never approximated). Slice data must end in
  *    valid rbsp_trailing_bits: payload past the last macroblock
  *    rejects.
  *  - Macroblocks: I_NxN (Intra_4x4, modes V/H/DC; modes 3..8 reject)
  *    and I_16x16 with CBP luma 0, CBP chroma 0 (mb_type 1..3 — V/H/DC;
  *    plane mode, AC-coded and chroma-coded I_16x16 types, and I_PCM
  *    reject). coded_block_pattern me(v) accepts the two in-subset
  *    intra codepoints (15 and 0, both chroma 0); others reject.
  *  - CAVLC residuals: TotalCoeff ≤ 1 per block (coeff_token '1',
  *    '01', '000101' of the 0 ≤ nC < 2 table — nC is COMPUTED by the
  *    normative neighbor rule and is provably < 2 when every block
  *    carries ≤ 1 coefficient; nC ≥ 2 rejects), level_prefix with the
  *    suffixLength-0 escapes (prefix 14 → 4-bit suffix, prefix 15 →
  *    12-bit suffix, prefix 16 → 13-bit extended escape — levels to
  *    ±6159, which covers EVERY flat residual of the 4x4 luma chain
  *    (|residual| ≤ 255 needs |z| ≤ 1632) but bounds the I_16x16 DC
  *    chain at |residual| ≤ 241 at QP 24 (z ≈ 25.6·r); a larger
  *    I_16x16 residual has no in-range level and encode() rejects
  *    with a clear message),
  *    the full 16-entry total_zeros table for TotalCoeff = 1
  *    (prefix-free, Kraft 511/512 — the spec table is deliberately
  *    incomplete by one 9-bit point; H264Spec pins both), run_before
  *    never occurs at TotalCoeff 1. The coefficient may sit at ANY
  *    scan position: reconstruction runs the REAL integer transforms
  *    (dequant v-matrix → 4x4 inverse, DC Hadamard → 8.5.10 scaling),
  *    which H264Spec proves equal to the encoder's closed-form DC
  *    solvers on DC-only blocks over the whole level range.
  *
  * Strictness contract (H264FuzzSpec law): unknown NAL types, VLC
  * prefixes outside the grammar, out-of-subset syntax values and
  * truncation reject the whole stream with None — never a crash, never
  * a partial guess. */
object H264 {

  // ---- encoder plans -------------------------------------------------------

  sealed trait MbPlan
  /** flat Intra_16x16 macroblock at luma `yVal`; `mode` 0=V (needs a top
    * neighbor), 1=H (needs left), 2=DC. Chroma stays flat 128. */
  final case class MbI16(yVal: Int, mode: Int = 2) extends MbPlan
  /** flat Intra_4x4 macroblock at luma `yVal` (all 16 blocks DC-mode,
    * CBP luma 15 when any residual is nonzero). */
  final case class MbI4(yVal: Int) extends MbPlan

  sealed trait PMbPlan
  /** P_Skip: motion = the 8.4.1.1 predictor over the neighbor state,
    * no residual — reconstruction copies the reference at that vector. */
  case object PSkip extends PMbPlan
  /** P_L0_16x16 with INTEGER-PEL motion (dx, dy) in pels into the
    * reference — pred(x, y) = ref(x + dx, y + dy), edge-clamped per
    * 8.4.2.2.1 — plus an optional flat luma residual `dLuma` added
    * after motion compensation (CBP luma 15, one DC level per 4x4). */
  final case class PMove(dx: Int, dy: Int, dLuma: Int = 0) extends PMbPlan

  /** a frame: intra MBs from `mb`; or a P slice — `skipAll` puts one
    * mb_skip_run over the whole picture (the static-scene inter class:
    * every predictor collapses to (0,0), reconstruction = the
    * reference verbatim), `pmb` plans each macroblock as [[PSkip]] or
    * [[PMove]] (the moving-scene class: real vectors, real skip-run
    * interleaving, residuals on top of motion). */
  final case class FramePlan(mb: (Int, Int) => MbPlan,
      skipAll: Boolean = false,
      pmb: Option[(Int, Int) => PMbPlan] = None)

  final case class Frame(y: Array[Int], cb: Array[Int], cr: Array[Int])
  final case class Decoded(width: Int, height: Int, frames: Vector[Frame])

  /** the one QP this subset's encoder uses: at QP 24 both dequant
    * chains step finely enough that EVERY integer flat residual is
    * exactly representable (encode asserts it found an exact level). */
  val EncQp = 24

  // normAdjust4x4 v-matrix (Table: LevelScale classes per qP%6; column
  // 0 = positions (0,0),(0,2),(2,0),(2,2); column 1 = (1,1),(1,3),
  // (3,1),(3,3); column 2 = the rest)
  private val V = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
  private def vClass(i: Int, j: Int): Int =
    if ((i % 2 == 0) && (j % 2 == 0)) 0
    else if ((i % 2 == 1) && (j % 2 == 1)) 1
    else 2
  private[multimodal] def levelScale(qpMod6: Int, i: Int, j: Int): Int =
    V(qpMod6)(vClass(i, j))

  /** 4x4 zigzag: zz(k) = raster index of the k-th scanned coefficient. */
  private[multimodal] val Zig4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** luma 4x4 block Z-scan: blkIdx → (x4, y4) in 4x4-block units. */
  private val BlkX = Array(0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
  private val BlkY = Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)

  // ---- motion prediction (8.4.1) ------------------------------------------

  private def med3(a: Int, b: Int, c: Int): Int =
    math.max(math.min(a, b), math.min(math.max(a, b), c))

  /** per-picture 16x16 motion state in QUARTER-PEL units, shared by
    * encoder and decoder so both resolve identical vectors. Specialized
    * to this subset's P pictures: every macroblock is inter with
    * ref_idx 0 and a 16x16 partition, so neighbor availability (raster
    * order + picture bounds) IS the 8.4.1.3 refIdx-match test. */
  private final class MvGrid(mbw: Int, mbh: Int) {
    private val mx = new Array[Int](mbw * mbh)
    private val my = new Array[Int](mbw * mbh)
    def set(x: Int, y: Int, vx: Int, vy: Int): Unit = {
      mx(y * mbw + x) = vx; my(y * mbw + x) = vy
    }
    private def vx(x: Int, y: Int) = mx(y * mbw + x)
    private def vy(x: Int, y: Int) = my(y * mbw + x)

    /** 8.4.1.3: the P_L0_16x16 median predictor at MB (x, y) — C is
      * the above-right neighbor, replaced by above-left D when outside
      * the picture. */
    def pred(x: Int, y: Int): (Int, Int) = {
      val hasA = x > 0
      val hasB = y > 0
      val hasC = y > 0 && x + 1 < mbw
      val hasD = y > 0 && x > 0
      val cSrc: Option[(Int, Int)] =
        if (hasC) Some((x + 1, y - 1))
        else if (hasD) Some((x - 1, y - 1)) else None
      val (ax, ay) = if (hasA) (vx(x - 1, y), vy(x - 1, y)) else (0, 0)
      val (bx, by) = if (hasB) (vx(x, y - 1), vy(x, y - 1)) else (0, 0)
      val (cx, cy) = cSrc.map { case (nx, ny) => (vx(nx, ny), vy(nx, ny)) }
        .getOrElse((0, 0))
      val mA = hasA; val mB = hasB; val mC = cSrc.isDefined
      // clause 1: B and C (after D substitution) unavailable, A not
      if (!mB && !mC && mA) (ax, ay)
      else if ((if (mA) 1 else 0) + (if (mB) 1 else 0) +
        (if (mC) 1 else 0) == 1) {
        // clause 2: exactly one neighbor matches the reference
        if (mA) (ax, ay) else if (mB) (bx, by) else (cx, cy)
      } else (med3(ax, bx, cx), med3(ay, by, cy))
    }

    /** 8.4.1.1: the P_Skip vector at MB (x, y) — (0,0) when the left
      * or top neighbor is unavailable or carries a zero vector, else
      * the 16x16 predictor. */
    def skipMv(x: Int, y: Int): (Int, Int) = {
      if (x == 0 || y == 0) (0, 0)
      else if ((vx(x - 1, y) == 0 && vy(x - 1, y) == 0) ||
        (vx(x, y - 1) == 0 && vy(x, y - 1) == 0)) (0, 0)
      else pred(x, y)
    }
  }

  // ---- total_zeros, TotalCoeff = 1 (Table 9-7 column 1) ------------------
  // value → (code, bits); prefix-free, Kraft 511/512 (H264Spec law)
  private[multimodal] val TotalZeros1: Array[(Int, Int)] = Array(
    (0x1, 1), (0x3, 3), (0x2, 3), (0x3, 4), (0x2, 4), (0x3, 5), (0x2, 5),
    (0x3, 6), (0x2, 6), (0x3, 7), (0x2, 7), (0x3, 8), (0x2, 8), (0x3, 9),
    (0x2, 9), (0x1, 9))

  // ---- bit I/O (RBSP level; EBSP escaping happens at NAL assembly) --------

  private[multimodal] final class BW {
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
    def ue(v: Int): Unit = {
      val c = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(c)
      put(0, len - 1); put(c.toLong, len)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits: stop bit + alignment zeros. */
    def stop(): Unit = { put(1, 1); if (n > 0) put(0, 8 - n) }
    def bytes: Array[Byte] = out.toByteArray
  }

  private[multimodal] final class BR(val b: Array[Byte]) {
    var pos = 0; var bit = 0
    def eof: Boolean = pos >= b.length
    def bit1(): Int = {
      if (eof) throw Reject
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1; if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def bits(n: Int): Int = { var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit1(); i += 1 }; v }
    def ue(): Int = {
      var zeros = 0
      while (bit1() == 0) { zeros += 1; if (zeros > 31) throw Reject }
      if (zeros == 0) 0 else ((1 << zeros) | bits(zeros)) - 1
    }
    def se(): Int = { val k = ue(); if (k % 2 == 1) (k + 1) / 2 else -(k / 2) }
  }

  /** decode rejection — one throwable, caught once at [[decode]]. */
  private object Reject extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  private def rej(cond: Boolean): Unit = if (cond) throw Reject

  // ---- EBSP <-> RBSP -------------------------------------------------------

  /** insert emulation-prevention 0x03 before a third byte ≤ 3 that
    * follows two zero bytes (7.4.1). */
  private[multimodal] def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    for (x <- rbsp) {
      if (zeros >= 2 && (x & 0xff) <= 3) { out.write(3); zeros = 0 }
      out.write(x)
      zeros = if (x == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  private def unescape(ebsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ebsp.length)
    var zeros = 0; var i = 0
    while (i < ebsp.length) {
      val x = ebsp(i) & 0xff
      if (zeros >= 2 && x == 3) {
        // emulation prevention: must be followed by 0..3
        rej(i + 1 >= ebsp.length || (ebsp(i + 1) & 0xff) > 3)
        zeros = 0
      } else {
        out.write(x)
        zeros = if (x == 0) zeros + 1 else 0
        rej(zeros >= 3) // 00 00 00..02 inside a NAL is a framing violation
      }
      i += 1
    }
    out.toByteArray
  }

  // ---- exact flat-residual levels -----------------------------------------

  /** reconstructed flat residual from one Intra_16x16 DC level `z` at
    * QP 24: inverse Hadamard of a DC-only matrix is flat z, 8.5.10
    * scales it to (10z+2)>>2, the DC-only 4x4 inverse adds
    * (dc+32)>>6 to every pel. */
  private def recI16(z: Int): Int = ((((10 * z + 2) >> 2) + 32) >> 6)
  /** reconstructed flat residual from one Luma4x4 DC level `z` at QP 24:
    * d00 = z·10 << (24/6 − 4) = 10z, then (d00+32)>>6. */
  private def recI4(z: Int): Int = ((10 * z + 32) >> 6)

  /** smallest-|z| level whose reconstruction chain hits `r` exactly;
    * `slope` ≈ dz/dr of the chain (25.6 for the I16 DC path — two
    * rounding stages — 6.4 for the I4 path), used only to seed the
    * scan window. `rec` is monotone in z, so the window is sound. */
  // ---- normative inverse transforms (8.5.10 / 8.5.12) ---------------------
  // The decoder reconstructs through the REAL integer transforms, so a
  // conforming TC≤1 stream with its coefficient at ANY scan position
  // decodes per spec; the closed forms above are the encoder's level
  // solvers for the DC-only case and must agree with this path on it
  // (H264Spec pins the equivalence over the full level range).

  /** dequantise a scan-ordered 4x4 luma residual block into the raster
    * d-matrix at QP 24: d = c · levelScale(24%6, i, j) << (24/6 − 4). */
  private def dequant4x4(coeffs: Array[Int]): Array[Int] = {
    val d = new Array[Int](16)
    var k = 0
    while (k < 16) {
      val r = Zig4(k)
      d(r) = coeffs(k) * levelScale(EncQp % 6, r / 4, r % 4)
      k += 1
    }
    d
  }

  /** the 4x4 integer inverse transform incl. the final (x+32)>>6. */
  private def invTransform4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16); val f = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val p0 = d(i * 4); val p1 = d(i * 4 + 1)
      val p2 = d(i * 4 + 2); val p3 = d(i * 4 + 3)
      val a = p0 + p2; val b = p0 - p2
      val c = (p1 >> 1) - p3; val t = p1 + (p3 >> 1)
      e(i * 4) = a + t; e(i * 4 + 1) = b + c
      e(i * 4 + 2) = b - c; e(i * 4 + 3) = a - t
      i += 1
    }
    var j = 0
    while (j < 4) {
      val p0 = e(j); val p1 = e(4 + j); val p2 = e(8 + j); val p3 = e(12 + j)
      val a = p0 + p2; val b = p0 - p2
      val c = (p1 >> 1) - p3; val t = p1 + (p3 >> 1)
      f(j) = a + t; f(4 + j) = b + c; f(8 + j) = b - c; f(12 + j) = a - t
      j += 1
    }
    var k = 0
    while (k < 16) { f(k) = (f(k) + 32) >> 6; k += 1 }
    f
  }

  /** the luma-DC 4x4 inverse Hadamard (±1 butterfly, no rounding). */
  private def invHadamard4x4(c: Array[Int]): Array[Int] = {
    val e = new Array[Int](16); val f = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val p0 = c(i * 4); val p1 = c(i * 4 + 1)
      val p2 = c(i * 4 + 2); val p3 = c(i * 4 + 3)
      val a = p0 + p2; val b = p0 - p2; val cc = p1 - p3; val t = p1 + p3
      e(i * 4) = a + t; e(i * 4 + 1) = b + cc
      e(i * 4 + 2) = b - cc; e(i * 4 + 3) = a - t
      i += 1
    }
    var j = 0
    while (j < 4) {
      val p0 = e(j); val p1 = e(4 + j); val p2 = e(8 + j); val p3 = e(12 + j)
      val a = p0 + p2; val b = p0 - p2; val cc = p1 - p3; val t = p1 + p3
      f(j) = a + t; f(4 + j) = b + cc; f(8 + j) = b - cc; f(12 + j) = a - t
      j += 1
    }
    f
  }

  /** 8.5.10 luma-DC scaling at QP 24 (< 36 branch). */
  private def dcScaleY(f: Int): Int =
    (f * levelScale(EncQp % 6, 0, 0) + (1 << (5 - EncQp / 6))) >>
      (6 - EncQp / 6)

  /** equivalence hooks for H264Spec: the general transform path on a
    * DC-only block must equal the encoder's closed-form solvers. */
  private[multimodal] def generalI4(z: Int): Array[Int] = {
    val c = new Array[Int](16); c(0) = z
    invTransform4x4(dequant4x4(c))
  }
  private[multimodal] def generalI16(z: Int): Array[Int] = {
    val c = new Array[Int](16); c(0) = z
    invHadamard4x4(Array.tabulate(16)(k => c.apply(Zig4.indexOf(k))))
      .map(f => invTransform4x4(
        { val d = new Array[Int](16); d(0) = dcScaleY(f); d })(0))
  }
  private[multimodal] def closedI4(z: Int): Int = recI4(z)
  private[multimodal] def closedI16(z: Int): Int = recI16(z)

  private def solveLevel(r: Int, rec: Int => Int, slope: Double): Int = {
    if (r == 0) return 0
    val guess = math.round(r * slope).toInt
    var z = guess - 32
    while (z <= guess + 32) { if (rec(z) == r) return z; z += 1 }
    throw new IllegalArgumentException(s"no exact level for residual $r")
  }

  // ---- encoder -------------------------------------------------------------

  /** one CAVLC residual block holding a single DC-position level `z`
    * (or nothing when z == 0): coeff_token, T1 sign / level, total_zeros. */
  private def writeBlock(w: BW, z: Int): Unit = {
    if (z == 0) { w.put(1, 1); return } // coeff_token (0,0)
    val az = math.abs(z)
    if (az == 1) { // (T1=1, TC=1) '01' + trailing-one sign
      w.put(1, 2); w.put(if (z < 0) 1 else 0, 1)
    } else { // (T1=0, TC=1) '000101' + level, suffixLength 0
      w.put(5, 6)
      val lc = 2 * (az - 1) + (if (z < 0) 1 else 0) - 2 // first level, T1<3
      if (lc < 14) w.put(1, lc + 1)
      else if (lc < 30) { w.put(1, 15); w.put((lc - 14).toLong, 4) }
      else if (lc < 4126) { w.put(1, 16); w.put((lc - 30).toLong, 12) }
      else { // prefix 16: the extended escape, 13-bit suffix
        require(lc < 4126 + 8192, s"level $z out of the prefix-16 range")
        w.put(1, 17); w.put((lc - 4126).toLong, 13)
      }
    }
    val (c, n) = TotalZeros1(0) // single coeff at scan position 0
    w.put(c.toLong, n)
  }

  def encode(width: Int, height: Int, frames: Seq[FramePlan]): Array[Byte] = {
    require(width % 16 == 0 && height % 16 == 0 && frames.nonEmpty,
      "subset: dimensions multiples of 16")
    val mbw = width / 16; val mbh = height / 16
    val out = new java.io.ByteArrayOutputStream()
    def nal(refIdc: Int, typ: Int, rbsp: Array[Byte]): Unit = {
      out.write(0); out.write(0); out.write(0); out.write(1)
      out.write((refIdc << 5) | typ)
      val esc = escape(rbsp); out.write(esc, 0, esc.length)
    }
    // SPS
    val sps = new BW
    sps.put(66, 8); sps.put(0xc0, 8); sps.put(20, 8) // profile/constraints/level
    sps.ue(0) // sps id
    sps.ue(0) // log2_max_frame_num_minus4
    sps.ue(2) // pic_order_cnt_type
    sps.ue(1) // max_num_ref_frames
    sps.put(0, 1) // gaps_in_frame_num
    sps.ue(mbw - 1); sps.ue(mbh - 1)
    sps.put(1, 1) // frame_mbs_only
    sps.put(0, 1) // direct_8x8_inference
    sps.put(0, 1) // frame_cropping
    sps.put(0, 1) // vui
    sps.stop(); nal(3, 7, sps.bytes)
    // PPS
    val pps = new BW
    pps.ue(0); pps.ue(0) // pps id, sps id
    pps.put(0, 1) // entropy_coding_mode = CAVLC
    pps.put(0, 1) // bottom_field_pic_order_in_frame_present
    pps.ue(0) // num_slice_groups_minus1
    pps.ue(0); pps.ue(0) // num_ref_idx defaults
    pps.put(0, 1); pps.put(0, 2) // weighted_pred, weighted_bipred
    pps.se(EncQp - 26); pps.se(0) // pic_init_qp, pic_init_qs
    pps.se(0) // chroma_qp_index_offset
    pps.put(1, 1) // deblocking_filter_control_present
    pps.put(0, 1); pps.put(0, 1) // constrained_intra, redundant_pic_cnt
    pps.stop(); nal(3, 8, pps.bytes)

    var prevRec: Array[Int] = null
    var frameNum = 0
    for ((fp, fi) <- frames.zipWithIndex) {
      // skipAll is the all-PSkip special case of the general P plan
      // (one trailing mb_skip_run over the picture — identical bits)
      val pPlan: Option[(Int, Int) => PMbPlan] =
        if (fp.skipAll) Some((_, _) => PSkip) else fp.pmb
      if (pPlan.isDefined) {
        require(prevRec != null, "a P frame needs a reference")
        val plan = pPlan.get
        val w = new BW
        w.ue(0) // first_mb_in_slice
        w.ue(5) // slice_type P (all)
        w.ue(0) // pps id
        w.put(frameNum.toLong, 4) // frame_num
        w.put(0, 1) // num_ref_idx_active_override_flag
        w.put(0, 1) // ref_pic_list_modification_flag_l0
        w.put(0, 1) // adaptive_ref_pic_marking_mode_flag
        w.se(0) // slice_qp_delta
        w.ue(1) // disable_deblocking_filter_idc = 1 (subset)
        val rec = new Array[Int](width * height)
        val grid = new MvGrid(mbw, mbh)
        def clip(v: Int) = math.max(0, math.min(255, v))
        // motion-compensated copy, edge-clamped fetch (8.4.2.2.1), with
        // the flat residual added after — EXACTLY the decoder's chain
        def mc(mbx: Int, mby: Int, dx: Int, dy: Int, dl: Int): Unit = {
          var yy = 0
          while (yy < 16) {
            var xx = 0
            while (xx < 16) {
              val sy = math.max(0, math.min(height - 1, mby * 16 + yy + dy))
              val sx = math.max(0, math.min(width - 1, mbx * 16 + xx + dx))
              rec((mby * 16 + yy) * width + mbx * 16 + xx) =
                clip(prevRec(sy * width + sx) + dl)
              xx += 1
            }
            yy += 1
          }
        }
        var run = 0
        for (mby <- 0 until mbh; mbx <- 0 until mbw) plan(mbx, mby) match {
          case PSkip =>
            val (mvx, mvy) = grid.skipMv(mbx, mby)
            mc(mbx, mby, mvx / 4, mvy / 4, 0) // int-pel by induction
            grid.set(mbx, mby, mvx, mvy)
            run += 1
          case PMove(dx, dy, dl) =>
            w.ue(run); run = 0
            w.ue(0) // mb_type P_L0_16x16 (one ref → no ref_idx_l0 bits)
            val (px, py) = grid.pred(mbx, mby)
            w.se(dx * 4 - px) // mvd_l0 x (quarter-pel units)
            w.se(dy * 4 - py) // mvd_l0 y
            if (dl == 0) w.ue(0) // coded_block_pattern 0, inter column
            else {
              w.ue(11) // coded_block_pattern 15, inter column
              w.se(0) // mb_qp_delta
              val z = solveLevel(dl, recI4, 6.4) // throws if inexact
              for (_ <- 0 until 16) writeBlock(w, z)
            }
            mc(mbx, mby, dx, dy, dl)
            grid.set(mbx, mby, dx * 4, dy * 4)
        }
        if (run > 0) w.ue(run) // the trailing skip run
        w.stop(); nal(2, 1, w.bytes)
        frameNum = (frameNum + 1) % 16
        prevRec = rec
      } else {
      val w = new BW
      w.ue(0) // first_mb_in_slice
      w.ue(7) // slice_type I (all)
      w.ue(0) // pps id
      w.put(0, 4) // frame_num (log2=4; IDR resets to 0)
      w.ue(fi % 2) // idr_pic_id
      w.put(0, 1); w.put(0, 1) // dec_ref_pic_marking (IDR)
      w.se(0) // slice_qp_delta
      w.ue(1) // disable_deblocking_filter_idc = 1 (subset)
      val rec = Array.fill(width * height)(0)
      def flat16(mbx: Int, mby: Int, v: Int): Unit = {
        var y = mby * 16
        while (y < mby * 16 + 16) {
          var x = mbx * 16
          while (x < mbx * 16 + 16) { rec(y * width + x) = v; x += 1 }
          y += 1
        }
      }
      def clip(v: Int) = math.max(0, math.min(255, v))
      for (mby <- 0 until mbh; mbx <- 0 until mbw) fp.mb(mbx, mby) match {
        case MbI16(g0, mode) =>
          val g = clip(g0)
          val pred = mode match {
            case 0 => require(mby > 0, "V needs a top neighbor")
              rec((mby * 16 - 1) * width + mbx * 16) // flat top row
            case 1 => require(mbx > 0, "H needs a left neighbor")
              rec(mby * 16 * width + mbx * 16 - 1)
            case 2 =>
              val hasL = mbx > 0; val hasT = mby > 0
              def sumT = (0 until 16).map(i =>
                rec((mby * 16 - 1) * width + mbx * 16 + i)).sum
              def sumL = (0 until 16).map(i =>
                rec((mby * 16 + i) * width + mbx * 16 - 1)).sum
              if (hasL && hasT) (sumT + sumL + 16) >> 5
              else if (hasL) (sumL + 8) >> 4
              else if (hasT) (sumT + 8) >> 4
              else 128
          }
          val z = solveLevel(g - pred, recI16, 25.6)
          require(clip(pred + recI16(z)) == g, "inexact I16 reconstruction")
          w.ue(1 + mode) // I_16x16_<mode>_0_0
          w.ue(0) // intra_chroma_pred_mode DC
          w.se(0) // mb_qp_delta
          writeBlock(w, z) // Intra16x16DCLevel; CBP 0 → no AC, no chroma
          flat16(mbx, mby, g)
        case MbI4(g0) =>
          val g = clip(g0)
          // per-4x4 DC predictions walk the Z-scan with running recon
          val zs = new Array[Int](16)
          for (b <- 0 until 16) {
            val x0 = mbx * 16 + BlkX(b) * 4; val y0 = mby * 16 + BlkY(b) * 4
            val hasL = x0 > 0; val hasT = y0 > 0
            def sT = (0 until 4).map(i => rec((y0 - 1) * width + x0 + i)).sum
            def sL = (0 until 4).map(i => rec((y0 + i) * width + x0 - 1)).sum
            val pred =
              if (hasL && hasT) (sT + sL + 4) >> 3
              else if (hasL) (sL + 2) >> 2
              else if (hasT) (sT + 2) >> 2
              else 128
            zs(b) = solveLevel(g - pred, recI4, 6.4)
            require(clip(pred + recI4(zs(b))) == g, "inexact I4 reconstruction")
            // write this block's recon so later blocks predict from it
            var yy = y0
            while (yy < y0 + 4) { var xx = x0
              while (xx < x0 + 4) { rec(yy * width + xx) = g; xx += 1 }
              yy += 1 }
          }
          w.ue(0) // I_NxN
          for (_ <- 0 until 16) w.put(1, 1) // prev_intra4x4_pred_mode (DC)
          w.ue(0) // intra_chroma_pred_mode DC
          val cbp = if (zs.exists(_ != 0)) 15 else 0
          w.ue(if (cbp == 15) 2 else 3) // me(v), Table 9-4 intra column
          if (cbp == 15) {
            w.se(0) // mb_qp_delta
            for (b <- 0 until 16) writeBlock(w, zs(b))
          }
      }
      w.stop(); nal(3, 5, w.bytes)
      prevRec = rec
      frameNum = 1 // the IDR reset: the next P counts from 1
      }
    }
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------------

  private final case class Sps(mbw: Int, mbh: Int)

  private def parseSps(r: BR): Sps = {
    val profile = r.bits(8); r.bits(8); r.bits(8)
    rej(profile != 66)
    rej(r.ue() != 0) // sps id
    rej(r.ue() != 0) // log2_max_frame_num_minus4 (subset: 4-bit frame_num)
    val poc = r.ue(); rej(poc != 2)
    r.ue() // max_num_ref_frames
    r.bit1() // gaps flag
    val mbw = r.ue() + 1; val mbh = r.ue() + 1
    rej(mbw <= 0 || mbh <= 0 || mbw > 1024 || mbh > 1024)
    rej(r.bit1() != 1) // frame_mbs_only
    r.bit1() // direct_8x8_inference
    rej(r.bit1() != 0) // cropping out of subset
    rej(r.bit1() != 0) // vui out of subset
    Sps(mbw, mbh)
  }

  private final case class Pps(qp: Int)

  private def parsePps(r: BR): Pps = {
    rej(r.ue() != 0); rej(r.ue() != 0)
    rej(r.bit1() != 0) // CABAC out of subset
    r.bit1()
    rej(r.ue() != 0) // slice groups out of subset
    r.ue(); r.ue(); r.bit1(); r.bits(2)
    val qp = 26 + r.se(); r.se(); r.se()
    rej(r.bit1() != 1) // deblocking control must be present…
    r.bit1(); r.bit1()
    rej(qp != EncQp) // …and the subset quantises at exactly QP 24
    Pps(qp)
  }

  /** CAVLC residual block, TotalCoeff ≤ 1 (subset): returns (level,
    * scanPos, totalCoeff) with scanPos = total_zeros. */
  private def readBlock(r: BR, nC: Int): (Int, Int, Int) = {
    rej(nC >= 2) // subset guarantees the 0 ≤ nC < 2 coeff_token table
    if (r.bit1() == 1) return (0, 0, 0) // (0,0) '1'
    val (t1, tc) =
      if (r.bit1() == 1) (1, 1) // '01'
      else { rej(r.bits(4) != 5); (0, 1) } // '000101' (0,1); rest rejects
    val level =
      if (t1 == 1) { if (r.bit1() == 1) -1 else 1 }
      else {
        var prefix = 0
        while (r.bit1() == 0) { prefix += 1; rej(prefix > 16) }
        var lc =
          if (prefix < 14) prefix
          else if (prefix == 14) 14 + r.bits(4)
          else if (prefix == 15) 30 + r.bits(12)
          else 4126 + r.bits(13) // prefix 16: extended escape
        lc += 2 // first level with TrailingOnes < 3
        if (lc % 2 == 0) (lc + 2) >> 1 else -((lc + 1) >> 1)
      }
    // total_zeros (TotalCoeff = 1, maxNumCoeff 16)
    var code = 0; var len = 0; var tz = -1
    while (tz < 0) {
      code = (code << 1) | r.bit1(); len += 1; rej(len > 9)
      var v = 0
      while (v < 16 && tz < 0) {
        val (c, n) = TotalZeros1(v)
        if (n == len && c == code) tz = v
        v += 1
      }
      // 9-bit exhaustion: the one unused 9-bit point rejects
      rej(len == 9 && tz < 0)
    }
    (level, tz, 1)
  }

  /** rbsp_trailing_bits (7.3.2.11): the stop bit, zero padding to the
    * byte boundary, then nothing but zero bytes (trailing zero_words
    * are legal padding). Anything else — e.g. slice payload appended
    * past the last macroblock — rejects the stream: acceptance must
    * prove the WHOLE slice was consumed, not a prefix. */
  private def rbspStop(r: BR): Unit = {
    rej(r.bit1() != 1)
    while (r.bit != 0) rej(r.bit1() != 0)
    while (!r.eof) rej(r.bits(8) != 0)
  }

  /** non-IDR P slice: mb_skip_run-interleaved P_Skip macroblocks
    * (motion = the 8.4.1.1 predictor over the real neighbor state —
    * the all-skip picture degenerates to a verbatim reference copy,
    * because edges and zero-vector neighbors force (0,0) everywhere)
    * and P_L0_16x16 macroblocks: mvd against the 8.4.1.3 median
    * predictor, single reference (the previous decoded picture),
    * integer-pel vectors only (fractional rejects — interpolation is
    * the stated cut), edge-clamped fetch per 8.4.2.2.1, CBP 0 or
    * luma-15 TC≤1 residuals. Other partitions, intra-in-P types, list
    * modification and marking ops reject. */
  private def decodePSlice(r: BR, sps: Sps, prev: Option[Frame],
      tc: Array[Int]): Frame = {
    val mbw = sps.mbw; val mbh = sps.mbh
    val width = mbw * 16; val height = mbh * 16
    rej(r.ue() != 0) // first_mb_in_slice: one slice per picture
    val st = r.ue(); rej(st != 5 && st != 0) // P slices only
    rej(r.ue() != 0) // pps id
    r.bits(4) // frame_num
    rej(r.bit1() != 0) // num_ref_idx_active_override_flag
    rej(r.bit1() != 0) // ref_pic_list_modification_flag_l0
    rej(r.bit1() != 0) // adaptive_ref_pic_marking_mode_flag
    rej(r.se() != 0) // slice_qp_delta (subset: QP stays 24)
    rej(r.ue() != 1) // deblocking MUST be disabled (subset)
    rej(prev.isEmpty) // a P frame needs a decoded reference
    val ref = prev.get.y
    java.util.Arrays.fill(tc, 0)
    val rec = new Array[Int](width * height)
    val grid = new MvGrid(mbw, mbh)
    def clip(v: Int) = math.max(0, math.min(255, v))
    def nCof(bx: Int, by: Int): Int = {
      val hasL = bx > 0; val hasT = by > 0
      val nA = if (hasL) tc(by * (mbw * 4) + bx - 1) else 0
      val nB = if (hasT) tc((by - 1) * (mbw * 4) + bx) else 0
      if (hasL && hasT) (nA + nB + 1) >> 1
      else if (hasL) nA else if (hasT) nB else 0
    }
    // motion-compensated 16x16 copy, reference fetch edge-clamped
    def mcMb(mbx: Int, mby: Int, dx: Int, dy: Int): Unit = {
      var yy = 0
      while (yy < 16) {
        var xx = 0
        while (xx < 16) {
          val sy = math.max(0, math.min(height - 1, mby * 16 + yy + dy))
          val sx = math.max(0, math.min(width - 1, mbx * 16 + xx + dx))
          rec((mby * 16 + yy) * width + mbx * 16 + xx) = ref(sy * width + sx)
          xx += 1
        }
        yy += 1
      }
    }
    var mb = 0; val total = mbw * mbh
    while (mb < total) {
      val run = r.ue() // mb_skip_run
      rej(run > total - mb)
      var k = 0
      while (k < run) {
        val mbx = mb % mbw; val mby = mb / mbw
        val (mvx, mvy) = grid.skipMv(mbx, mby)
        mcMb(mbx, mby, mvx / 4, mvy / 4) // int-pel by induction
        grid.set(mbx, mby, mvx, mvy)
        mb += 1; k += 1
      }
      if (mb < total) {
        val mbx = mb % mbw; val mby = mb / mbw
        rej(r.ue() != 0) // mb_type: P_L0_16x16 only (single ref → no
        //                  ref_idx_l0 bits; splits / intra-in-P reject)
        val (px, py) = grid.pred(mbx, mby)
        val mvx = px + r.se() // mvd_l0, quarter-pel units
        val mvy = py + r.se()
        rej((mvx & 3) != 0 || (mvy & 3) != 0) // integer-pel subset
        mcMb(mbx, mby, mvx / 4, mvy / 4)
        val cbp = r.ue() match {
          case 0 => 0; case 11 => 15 // Table 9-4 inter column, in-subset
          case _ => throw Reject
        }
        if (cbp == 15) {
          rej(r.se() != 0) // mb_qp_delta
          for (b <- 0 until 16) {
            val bx = mbx * 4 + BlkX(b); val by = mby * 4 + BlkY(b)
            val (level, pos, n) = readBlock(r, nCof(bx, by))
            tc(by * (mbw * 4) + bx) = n
            val coeffs = new Array[Int](16); coeffs(pos) = level
            val res = invTransform4x4(dequant4x4(coeffs))
            val x0 = bx * 4; val y0 = by * 4
            var yy = 0
            while (yy < 4) {
              var xx = 0
              while (xx < 4) {
                val i = (y0 + yy) * width + x0 + xx
                rec(i) = clip(rec(i) + res(yy * 4 + xx))
                xx += 1
              }
              yy += 1
            }
          }
        }
        grid.set(mbx, mby, mvx, mvy)
        mb += 1
      }
    }
    rbspStop(r)
    val cw = width / 2; val ch = height / 2
    Frame(rec, Array.fill(cw * ch)(128), Array.fill(cw * ch)(128))
  }

  private def decodeSlice(r: BR, sps: Sps, tc: Array[Int]): Frame = {
    val mbw = sps.mbw; val mbh = sps.mbh
    val width = mbw * 16; val height = mbh * 16
    // per-4x4 Intra4x4PredMode grid for the most-probable-mode rule
    // (8.3.1.1): neighbors outside the picture or in non-I_4x4 MBs
    // predict as DC (2)
    val pm = Array.fill(mbw * 4 * mbh * 4)(2)
    rej(r.ue() != 0) // first_mb_in_slice: one slice per picture
    val st = r.ue(); rej(st != 7 && st != 2) // I slices only
    rej(r.ue() != 0) // pps id
    r.bits(4) // frame_num
    r.ue() // idr_pic_id
    r.bit1(); r.bit1() // dec_ref_pic_marking
    rej(r.se() != 0) // slice_qp_delta (subset: QP stays 24)
    rej(r.ue() != 1) // deblocking MUST be disabled (subset)
    java.util.Arrays.fill(tc, 0)
    val rec = new Array[Int](width * height)
    def clip(v: Int) = math.max(0, math.min(255, v))
    // nC per 9.2.1: average of available neighbor 4x4 TotalCoeffs
    def nCof(bx: Int, by: Int): Int = {
      val hasL = bx > 0; val hasT = by > 0
      val nA = if (hasL) tc(by * (mbw * 4) + bx - 1) else 0
      val nB = if (hasT) tc((by - 1) * (mbw * 4) + bx) else 0
      if (hasL && hasT) (nA + nB + 1) >> 1
      else if (hasL) nA else if (hasT) nB else 0
    }
    for (mby <- 0 until mbh; mbx <- 0 until mbw) {
      val mbType = r.ue()
      if (mbType == 0) { // I_NxN, Intra_4x4
        val modes = (0 until 16).map { _ =>
          if (r.bit1() == 1) -1 // most probable
          else r.bits(3)
        }
        rej(r.ue() != 0) // intra_chroma_pred_mode: DC only (subset)
        val cbpCode = r.ue()
        val cbp = cbpCode match {
          case 2 => 15; case 3 => 0 // Table 9-4 intra column, in-subset
          case _ => throw Reject
        }
        if (cbp == 15) rej(r.se() != 0) // mb_qp_delta
        for (b <- 0 until 16) {
          val bx = mbx * 4 + BlkX(b); val by = mby * 4 + BlkY(b)
          val x0 = bx * 4; val y0 = by * 4
          // most-probable mode = min of the tracked neighbor modes
          // (8.3.1.1); subset accepts only V/H/DC after resolution
          val mp = math.min(
            if (bx > 0) pm(by * (mbw * 4) + bx - 1) else 2,
            if (by > 0) pm((by - 1) * (mbw * 4) + bx) else 2)
          val mode = modes(b) match {
            case -1 => mp
            case m => val mm = if (m < mp) m else m + 1; rej(mm > 2); mm
          }
          pm(by * (mbw * 4) + bx) = mode
          val hasL = x0 > 0; val hasT = y0 > 0
          val (level, pos, n) =
            if (cbp == 15) readBlock(r, nCof(bx, by)) else (0, 0, 0)
          tc(by * (mbw * 4) + bx) = n
          // the REAL transform chain: scan-placed coefficient →
          // dequant → 4x4 integer inverse (any position, not just DC)
          val coeffs = new Array[Int](16); coeffs(pos) = level
          val res = invTransform4x4(dequant4x4(coeffs))
          var yy = 0
          while (yy < 4) { var xx = 0
            while (xx < 4) {
              val pred = mode match {
                case 0 => rej(!hasT); rec((y0 - 1) * width + x0 + xx)
                case 1 => rej(!hasL); rec((y0 + yy) * width + x0 - 1)
                case _ =>
                  def sT = (0 until 4).map(i => rec((y0 - 1) * width + x0 + i)).sum
                  def sL = (0 until 4).map(i => rec((y0 + i) * width + x0 - 1)).sum
                  if (hasL && hasT) (sT + sL + 4) >> 3
                  else if (hasL) (sL + 2) >> 2
                  else if (hasT) (sT + 2) >> 2
                  else 128
              }
              rec((y0 + yy) * width + x0 + xx) =
                clip(pred + res(yy * 4 + xx))
              xx += 1 }
            yy += 1 }
        }
      } else if (mbType >= 1 && mbType <= 3) { // I_16x16_<V|H|DC>_0_0
        val mode = mbType - 1
        rej(r.ue() != 0) // intra_chroma_pred_mode: DC only (subset)
        rej(r.se() != 0) // mb_qp_delta
        val (level, pos, _) = readBlock(r, nCof(mbx * 4, mby * 4))
        // the REAL chain: scan-placed DC coefficient → inverse Hadamard
        // → 8.5.10 scaling → per-4x4 DC-only inverse transform
        val dcScan = new Array[Int](16); dcScan(pos) = level
        val dcRaster = new Array[Int](16)
        for (k <- 0 until 16) dcRaster(Zig4(k)) = dcScan(k)
        val res4 = invHadamard4x4(dcRaster).map { f =>
          val d = new Array[Int](16); d(0) = dcScaleY(f)
          invTransform4x4(d)(0) // DC-only: uniform over the 4x4
        }
        val x0 = mbx * 16; val y0 = mby * 16
        val hasL = mbx > 0; val hasT = mby > 0
        var yy = 0
        while (yy < 16) { var xx = 0
          while (xx < 16) {
            val pred = mode match {
              case 0 => rej(!hasT); rec((y0 - 1) * width + x0 + xx)
              case 1 => rej(!hasL); rec((y0 + yy) * width + x0 - 1)
              case _ =>
                def sT = (0 until 16).map(i => rec((y0 - 1) * width + x0 + i)).sum
                def sL = (0 until 16).map(i => rec((y0 + i) * width + x0 - 1)).sum
                if (hasL && hasT) (sT + sL + 16) >> 5
                else if (hasL) (sL + 8) >> 4
                else if (hasT) (sT + 8) >> 4
                else 128
            }
            // block (x4, y4)'s DC sits at Hadamard raster y4*4 + x4
            rec((y0 + yy) * width + x0 + xx) =
              clip(pred + res4((yy / 4) * 4 + (xx / 4)))
            xx += 1 }
          yy += 1 }
        // AC blocks are uncoded (CBP luma 0): their TotalCoeff is 0
        for (b <- 0 until 16)
          tc((mby * 4 + BlkY(b)) * (mbw * 4) + mbx * 4 + BlkX(b)) = 0
      } else throw Reject // plane/AC/chroma-coded I_16x16, I_PCM, P/B types
    }
    rbspStop(r) // the slice must END here: appended payload rejects
    // subset chroma: never coded, DC-predicted from flat-128 recon = 128
    val cw = width / 2; val ch = height / 2
    Frame(rec, Array.fill(cw * ch)(128), Array.fill(cw * ch)(128))
  }

  def decode(bytes: Array[Byte]): Option[Decoded] =
    try {
      // split on start codes (3- or 4-byte)
      var i = 0; val nals = Vector.newBuilder[Array[Byte]]
      def isSc3(p: Int) = p + 2 < bytes.length &&
        bytes(p) == 0 && bytes(p + 1) == 0 && bytes(p + 2) == 1
      while (i < bytes.length && !isSc3(i)) i += 1
      rej(i == bytes.length)
      while (i < bytes.length) {
        i += 3
        val start = i
        while (i < bytes.length && !isSc3(i) &&
          !(i + 3 < bytes.length && bytes(i) == 0 && isSc3(i + 1))) i += 1
        var end = i
        if (i < bytes.length && bytes(i) == 0 && isSc3(i + 1)) { end = i; i += 1 }
        // strip trailing zero padding ahead of the next start code
        nals += bytes.slice(start, end)
      }
      var sps: Option[Sps] = None
      var havePps = false
      var frames = Vector.empty[Frame]
      var tcGrid: Array[Int] = null
      for (nal <- nals.result()) {
        rej(nal.length < 1)
        val hdr = nal(0) & 0xff
        rej((hdr & 0x80) != 0) // forbidden_zero_bit
        val typ = hdr & 0x1f
        val r = new BR(unescape(nal.drop(1)))
        typ match {
          case 7 =>
            val s = parseSps(r); sps = Some(s)
            tcGrid = new Array[Int](s.mbw * 4 * s.mbh * 4)
          case 8 => rej(sps.isEmpty); parsePps(r); havePps = true
          case 5 =>
            rej(sps.isEmpty || !havePps)
            frames :+= decodeSlice(r, sps.get, tcGrid)
          case 1 =>
            rej(sps.isEmpty || !havePps)
            rej((hdr >> 5) == 0) // subset: P slices are reference pictures
            frames :+= decodePSlice(r, sps.get, frames.lastOption, tcGrid)
          case _ => throw Reject // SEI, AUD, B slices… out of subset
        }
      }
      rej(frames.isEmpty)
      Some(Decoded(sps.get.mbw * 16, sps.get.mbh * 16, frames))
    } catch {
      case Reject => None
      case _: ArrayIndexOutOfBoundsException => None
    }
}
