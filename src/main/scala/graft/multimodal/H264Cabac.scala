package graft.multimodal

/** CABAC — the H.264 context-adaptive binary arithmetic coder (ITU-T
  * H.264 / ISO/IEC 14496-10 clause 9.3), the entropy layer real-crawl
  * H.264 overwhelmingly uses. This object is the ENGINE: the 9.3.3.2
  * decoding procedures (DecodeDecision / DecodeBypass /
  * DecodeTerminate with the Table 9-44 LPS quantization and Table 9-45
  * state transitions), their exact 9.3.4 encoder duals
  * (renormalization with outstanding-bit carry resolution, the
  * terminate flush), and the 9.3.1.1 context-variable state machine.
  * [[H264]] builds the I-slice macroblock-layer syntax on top.
  *
  * STATED CUT (the one untranscribed piece): the per-context INIT
  * CONSTANTS — the (m, n) pairs of Tables 9-12..9-24 that seed each
  * context from SliceQPY — are not reproducible in this offline
  * container with transcription fidelity, and half-remembered
  * constants silently break interop worse than a stated absence.
  * Contexts therefore initialize to the UNIFORM state (pStateIdx 0,
  * valMPS 1 — the (m, n) = (0, 64) profile under the normative
  * 9.3.1.1 derivation, stated in-code). Everything that ADAPTS is
  * normative, so streams from this encoder decode bit-exactly and the
  * engine's probability estimation behaves exactly as spec'd;
  * bit-interop with EXTERNAL CABAC encoders additionally requires the
  * init constants. A real-world CABAC stream decoded under uniform
  * init walks into out-of-subset syntax almost immediately and
  * rejects loudly (H264's strictness contract) — it is never silently
  * mis-served. */
object H264Cabac {

  /** Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx] — the LPS
    * subinterval width for each of 64 probability states at the four
    * range quartiles. Structural laws in H264CabacSpec: row 0 is
    * {128,176,208,240}, row 63 the {2,2,2,2} terminate floor, each row
    * non-increasing in pStateIdx and strictly increasing across the
    * quartiles, all values in [2, 240]. */
  val RangeTabLPS: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  /** Table 9-45: transIdxLPS — the state a context falls to after an
    * LPS; the MPS transition is min(pStateIdx + 1, 62). State 63 is
    * the terminate context's fixed point. */
  val TransIdxLPS: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63)

  /** context variables: pStateIdx (6 bits) and valMPS, packed. The
    * UNIFORM init (the stated cut): every context starts at
    * pStateIdx 0, valMPS 1 — under 9.3.1.1 that is preCtxState =
    * Clip3(1, 126, ((m·SliceQPY) >> 4) + n) = 64 for (m,n) = (0,64),
    * i.e. the equiprobable state. */
  final class Ctxs(n: Int) {
    val state = new Array[Int](n) // pStateIdx << 1 | valMPS
    reset()
    def reset(): Unit = java.util.Arrays.fill(state, 1) // (0, MPS=1)
  }

  // ---- decoder (9.3.3.2) ---------------------------------------------------

  /** arithmetic decoder over a bit source; `readBit` must return 0 past
    * the real payload only if trailing padding exists — a truncated
    * stream's read throws and surfaces as the caller's Reject. */
  final class Dec(readBit: () => Int) {
    private var codIRange = 510
    private var codIOffset = {
      var v = 0; var i = 0
      while (i < 9) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def decision(ctxs: Ctxs, idx: Int): Int = {
      val st = ctxs.state(idx)
      val pState = st >> 1; val valMps = st & 1
      val rLps = RangeTabLPS(pState)((codIRange >> 6) & 3)
      codIRange -= rLps
      val bin =
        if (codIOffset >= codIRange) {
          codIOffset -= codIRange
          codIRange = rLps
          // LPS path: state falls; at state 0 the MPS flips
          val mps2 = if (pState == 0) 1 - valMps else valMps
          ctxs.state(idx) = (TransIdxLPS(pState) << 1) | mps2
          1 - valMps
        } else {
          ctxs.state(idx) = (math.min(pState + 1, 62) << 1) | valMps
          valMps
        }
      while (codIRange < 256) {
        codIRange <<= 1
        codIOffset = (codIOffset << 1) | readBit()
      }
      bin
    }

    def bypass(): Int = {
      codIOffset = (codIOffset << 1) | readBit()
      if (codIOffset >= codIRange) { codIOffset -= codIRange; 1 } else 0
    }

    /** end_of_slice_flag / the I_PCM escape: bin 1 ends decoding with
      * no renormalization. */
    def terminate(): Int = {
      codIRange -= 2
      if (codIOffset >= codIRange) 1
      else {
        while (codIRange < 256) {
          codIRange <<= 1
          codIOffset = (codIOffset << 1) | readBit()
        }
        0
      }
    }
  }

  // ---- encoder (9.3.4) -----------------------------------------------------

  /** arithmetic encoder; bits land in an internal buffer read out by
    * [[Enc.bytes]] after [[Enc.flush]]. The outstanding-bits mechanism
    * resolves carries exactly as 9.3.4.3. */
  final class Enc {
    private var codILow = 0
    private var codIRange = 510
    private var firstBit = true
    private var outstanding = 0
    private val bits = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nAcc = 0

    private def emit(b: Int): Unit = {
      acc = (acc << 1) | b; nAcc += 1
      if (nAcc == 8) { bits.write(acc); acc = 0; nAcc = 0 }
    }
    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false else emit(b)
      while (outstanding > 0) { emit(1 - b); outstanding -= 1 }
    }
    private def renorm(): Unit =
      while (codIRange < 256) {
        if (codILow >= 512) { putBit(1); codILow -= 512 }
        else if (codILow < 256) putBit(0)
        else { codILow -= 256; outstanding += 1 }
        codILow <<= 1; codIRange <<= 1
      }

    def decision(ctxs: Ctxs, idx: Int, bin: Int): Unit = {
      val st = ctxs.state(idx)
      val pState = st >> 1; val valMps = st & 1
      val rLps = RangeTabLPS(pState)((codIRange >> 6) & 3)
      codIRange -= rLps
      if (bin != valMps) {
        codILow += codIRange
        codIRange = rLps
        val mps2 = if (pState == 0) 1 - valMps else valMps
        ctxs.state(idx) = (TransIdxLPS(pState) << 1) | mps2
      } else ctxs.state(idx) = (math.min(pState + 1, 62) << 1) | valMps
      renorm()
    }

    def bypass(bin: Int): Unit = {
      codILow <<= 1
      if (bin == 1) codILow += codIRange
      if (codILow >= 1024) { putBit(1); codILow -= 1024 }
      else if (codILow < 512) putBit(0)
      else { codILow -= 512; outstanding += 1 }
    }

    def terminate(bin: Int): Unit = {
      codIRange -= 2
      if (bin == 1) { codILow += codIRange; codIRange = 2 }
      renorm()
    }

    /** 9.3.4.5 EncodeFlush after the final terminate(1): drain the low
      * register (its last written bit is the binary stop), then pad the
      * byte. Returns the finished byte payload. */
    def flush(): Array[Byte] = {
      codIRange = 2
      renorm()
      putBit((codILow >> 9) & 1)
      emit((codILow >> 8) & 1); emit(1) // rbsp stop bit rides the flush
      while (nAcc != 0) emit(0)
      bits.toByteArray
    }
  }
}
