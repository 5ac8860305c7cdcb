package graft.storage

/** Gorilla time-series block compression (Pelkonen et al., "Gorilla: A
  * Fast, Scalable, In-Memory Time Series Database", VLDB 2015 §4.1) —
  * THE metrics-storage codec; the reference engine's domain is exactly
  * this data. Timestamps compress by delta-of-delta with the paper's
  * prefix classes ('0' for dod=0, '10'+7 bits for [-63,64], '110'+9
  * for [-255,256], '1110'+12 for [-2047,2048], '1111'+raw — widened
  * here from the paper's 32 to 64 bits because these are NANOSECOND
  * streams); values by XOR with the previous value and the
  * leading/trailing-zero window reuse rule ('0' same window, '1' +
  * 5-bit leading + 6-bit length-1 new window).
  *
  * Block layout: 32-bit count, then raw first timestamp (64) + first
  * value bits (64), then per-point codes. Strictness: truncation,
  * out-of-class codes, non-zero padding or count overflow reject with
  * None (DecoderFuzzSpec law).
  */
object Gorilla {

  val MaxPoints: Int = 1 << 26

  private final class BW {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L; private var n = 0
    def put(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1); n += 1
        if (n == 8) { out.write((acc & 0xFF).toInt); acc = 0; n = 0 }
        i -= 1
      }
    }
    def bytes: Array[Byte] = {
      if (n > 0) { out.write(((acc << (8 - n)) & 0xFF).toInt); n = 0 }
      out.toByteArray
    }
  }

  private final class BR(b: Array[Byte]) {
    var pos = 0; var bit = 0
    def readBit(): Int = {
      if (pos >= b.length) throw Trunc
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def read(nBits: Int): Long = {
      var v = 0L; var i = 0
      while (i < nBits) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }
  private object Trunc extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  /** the paper's timestamp class for one delta-of-delta: 0/1/2/3/4 →
    * bits 1/9/12/16/68. Public so the oracle-side arithmetic and the
    * encoder share one definition. */
  def dodClass(dod: Long): Int =
    if (dod == 0) 0
    else if (dod >= -63 && dod <= 64) 1
    else if (dod >= -255 && dod <= 256) 2
    else if (dod >= -2047 && dod <= 2048) 3
    else 4

  val ClassBits: Array[Int] = Array(1, 9, 12, 16, 68)

  def compress(ts: Array[Long], vs: Array[Double]): Array[Byte] = {
    require(ts.length == vs.length && ts.length <= MaxPoints)
    val bw = new BW
    bw.put(ts.length.toLong, 32)
    if (ts.isEmpty) return bw.bytes
    bw.put(ts(0), 64)
    bw.put(java.lang.Double.doubleToLongBits(vs(0)), 64)
    var prevDelta = 0L
    var prevLead = -1; var prevMean = -1
    var i = 1
    while (i < ts.length) {
      // ---- timestamp ----
      val delta = ts(i) - ts(i - 1)
      val dod = delta - prevDelta
      prevDelta = delta
      dodClass(dod) match {
        case 0 => bw.put(0, 1)
        case 1 => bw.put(2, 2); bw.put(dod + 63, 7)
        case 2 => bw.put(6, 3); bw.put(dod + 255, 9)
        case 3 => bw.put(14, 4); bw.put(dod + 2047, 12)
        case _ => bw.put(15, 4); bw.put(dod, 64)
      }
      // ---- value ----
      val x = java.lang.Double.doubleToLongBits(vs(i)) ^
        java.lang.Double.doubleToLongBits(vs(i - 1))
      if (x == 0) bw.put(0, 1)
      else {
        bw.put(1, 1)
        var lead = java.lang.Long.numberOfLeadingZeros(x)
        if (lead > 31) lead = 31 // 5-bit field
        val trail = java.lang.Long.numberOfTrailingZeros(x)
        val mean = 64 - lead - trail
        if (prevLead >= 0 && lead >= prevLead &&
            64 - prevLead - prevMean <= trail) {
          bw.put(0, 1) // window reuse
          bw.put(x >>> (64 - prevLead - prevMean), prevMean)
        } else {
          bw.put(1, 1)
          bw.put(lead.toLong, 5)
          bw.put((mean - 1).toLong, 6)
          bw.put(x >>> trail, mean)
          prevLead = lead; prevMean = mean
        }
      }
      i += 1
    }
    bw.bytes
  }

  def decompress(bytes: Array[Byte]): Option[(Array[Long], Array[Double])] = {
    try {
      val br = new BR(bytes)
      val n = br.read(32)
      if (n < 0 || n > MaxPoints) return None
      val ts = new Array[Long](n.toInt)
      val vs = new Array[Double](n.toInt)
      if (n > 0) {
        ts(0) = br.read(64)
        vs(0) = java.lang.Double.longBitsToDouble(br.read(64))
        var prevDelta = 0L
        var prevBits = java.lang.Double.doubleToLongBits(vs(0))
        var prevLead = -1; var prevMean = -1
        var i = 1
        while (i < n) {
          // ---- timestamp ----
          val dod =
            if (br.readBit() == 0) 0L
            else if (br.readBit() == 0) br.read(7) - 63
            else if (br.readBit() == 0) br.read(9) - 255
            else if (br.readBit() == 0) br.read(12) - 2047
            else br.read(64)
          prevDelta += dod
          ts(i) = ts(i - 1) + prevDelta
          // ---- value ----
          if (br.readBit() == 0) vs(i) = java.lang.Double.longBitsToDouble(prevBits)
          else {
            var lead = prevLead; var mean = prevMean
            if (br.readBit() == 1) {
              lead = br.read(5).toInt
              mean = br.read(6).toInt + 1
              prevLead = lead; prevMean = mean
            } else if (prevLead < 0) return None // reuse before any window
            val x = br.read(mean) << (64 - lead - mean)
            prevBits ^= x
            vs(i) = java.lang.Double.longBitsToDouble(prevBits)
          }
          i += 1
        }
      }
      // strict end: only zero padding of the final byte may remain
      if (br.bit > 0) {
        if ((bytes(br.pos) & ((1 << (8 - br.bit)) - 1)) != 0) return None
        br.pos += 1
      }
      if (br.pos != bytes.length) return None
      Some((ts, vs))
    } catch {
      case Trunc => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
