package graft.multimodal

/** TIFF 6.0 baseline (Adobe TIFF specification) — the container
  * document-scan corpora ship in (archival scans, OCR pipelines,
  * DICOM-adjacent exports). Completes the still-image family next to
  * PNG/GIF/JPEG: both byte orders ("II" little / "MM" big), the IFD
  * entry walk (tag/type/count/value-or-offset with the ≤4-byte
  * inlining rule), multi-strip layout, and the three baseline
  * compressions — none (1), LZW (5, §13: variable 9-12-bit MSB-first
  * codes, Clear=256/EOI=257, EARLY code-width change at 511/1023/2047)
  * and PackBits (32773, the Apple RLE).
  *
  * The JDK ships an independent TIFF ImageIO plugin (Java 9+); the
  * spec proves wire interop in both directions, so unlike the MPEG/
  * arithmetic-JPEG classes this codec is externally cross-checked.
  *
  * Strictness contract (DecoderFuzzSpec law): bad magic, IFD walks out
  * of bounds, missing required tags, strip geometry that does not tile
  * the image, LZW code overflow/underflow, or short strips reject the
  * whole file with None — honest rejection, never a crash.
  */
object Tiff {

  val MaxPixels: Long = 1L << 26

  final case class Image(width: Int, height: Int, samplesPerPixel: Int,
      compression: Int, nStrips: Int, pixels: Array[Int])

  // ---- byte-order plumbing ------------------------------------------------

  private final class Rd(b: Array[Byte], le: Boolean) {
    def u16(at: Int): Int =
      if (le) (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8)
      else ((b(at) & 0xFF) << 8) | (b(at + 1) & 0xFF)
    def u32(at: Int): Long =
      if (le) (b(at) & 0xFFL) | ((b(at + 1) & 0xFFL) << 8) |
        ((b(at + 2) & 0xFFL) << 16) | ((b(at + 3) & 0xFFL) << 24)
      else ((b(at) & 0xFFL) << 24) | ((b(at + 1) & 0xFFL) << 16) |
        ((b(at + 2) & 0xFFL) << 8) | (b(at + 3) & 0xFFL)
  }

  // ---- PackBits -----------------------------------------------------------

  private def unpackBits(src: Array[Byte], from: Int, until: Int,
      expect: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expect)
    var w = 0
    var i = from
    while (i < until && w < expect) {
      val n = src(i); i += 1
      if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > until || w + cnt > expect) return None
        System.arraycopy(src, i, out, w, cnt)
        i += cnt; w += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (i >= until || w + cnt > expect) return None
        java.util.Arrays.fill(out, w, w + cnt, src(i))
        i += 1; w += cnt
      }
    }
    if (w != expect || i != until) return None
    Some(out)
  }

  // ---- TIFF LZW (§13: MSB-first, early code-width change) ------------------

  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code
      nBits += width
      while (nBits >= 8) {
        out.write(((acc >>> (nBits - 8)) & 0xFF).toInt)
        nBits -= 8
      }
    }
    val dict = new java.util.HashMap[String, Integer]()
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    put(256) // Clear
    reset()
    var prefix = ""
    var i = 0
    while (i < data.length) {
      val c = (data(i) & 0xFF).toChar
      val cand = prefix + c
      if (prefix.isEmpty || dict.containsKey(cand)) prefix = cand
      else {
        val code = if (prefix.length == 1) prefix.charAt(0).toInt
          else dict.get(prefix).intValue()
        put(code)
        dict.put(cand, next)
        next += 1
        // §13 early change, pinned EMPIRICALLY against the JDK ImageIO
        // plugin (TiffSpec big-LZW interop both directions): the
        // decoder bumps its read width when its table reaches
        // 511/1023/2047; its dictionary insert lags the encoder's by
        // one code, so the matching ENCODER bump fires one entry later
        // in ITS own count — at 512/1024/2048
        if (next == 512) width = 10
        else if (next == 1024) width = 11
        else if (next == 2048) width = 12
        else if (next == 4094) { put(256); reset() }
        prefix = c.toString
      }
      i += 1
    }
    if (prefix.nonEmpty) {
      val code = if (prefix.length == 1) prefix.charAt(0).toInt
        else dict.get(prefix).intValue()
      put(code)
    }
    put(257) // EOI
    if (nBits > 0) out.write(((acc << (8 - nBits)) & 0xFF).toInt)
    out.toByteArray
  }

  private def lzwDecode(src: Array[Byte], from: Int, until: Int,
      expect: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expect)
    var w = 0
    var acc = 0L; var nBits = 0
    var width = 9
    var i = from
    def read(): Int = {
      while (nBits < width) {
        if (i >= until) return -1
        acc = (acc << 8) | (src(i) & 0xFF); i += 1; nBits += 8
      }
      val v = ((acc >>> (nBits - width)) & ((1 << width) - 1)).toInt
      nBits -= width
      v
    }
    // dictionary as (prefixCode, appendedByte); 0..255 literal, 256/257 ctl
    val prefixOf = new Array[Int](4096)
    val byteOf = new Array[Byte](4096)
    var next = 258
    def emit(code: Int): Option[Byte] = {
      // writes the string of `code` into out at w; returns first byte
      var stack = List.empty[Byte]
      var c = code
      var guard = 0
      while (c >= 258) {
        stack = byteOf(c) :: stack
        c = prefixOf(c)
        guard += 1
        if (guard > 4096) return None
      }
      if (c >= 256) return None
      val first = c.toByte
      if (w + 1 + stack.length > expect) return None
      out(w) = first; w += 1
      stack.foreach { b => out(w) = b; w += 1 }
      Some(first)
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None
      if (code == 256) { next = 258; width = 9; prev = -1 }
      else if (code == 257) done = true
      else if (prev < 0) {
        if (code >= 256) return None
        if (emit(code).isEmpty) return None
        prev = code
      } else {
        if (code > next) return None
        if (code == next) {
          // KwKwK: string(prev) + firstByte(string(prev))
          var c = prev
          while (c >= 258) c = prefixOf(c)
          if (c >= 256) return None
          prefixOf(next) = prev; byteOf(next) = c.toByte
          next += 1
          if (emit(code).isEmpty) return None
        } else {
          val first = emit(code).getOrElse(return None)
          if (next < 4096) {
            prefixOf(next) = prev; byteOf(next) = first
            next += 1
          }
        }
        prev = code
        if (next == 511) width = 10
        else if (next == 1023) width = 11
        else if (next == 2047) width = 12
      }
    }
    if (w != expect) return None
    Some(out)
  }

  // ---- encoder ------------------------------------------------------------

  /** write a baseline gray (spp 1) or RGB (spp 3) 8-bit TIFF;
    * compression 1 (none), 5 (LZW) or 32773 (PackBits); strips of
    * `rowsPerStrip` rows; either byte order. */
  def encode(w: Int, h: Int, spp: Int, px: (Int, Int, Int) => Int,
      compression: Int, rowsPerStrip: Int, littleEndian: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && (spp == 1 || spp == 3))
    require(compression == 1 || compression == 5 || compression == 32773)
    require(rowsPerStrip > 0)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (littleEndian) {
        out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
      } else {
        out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
      }
    // strips
    val strips = (0 until h by rowsPerStrip).map { y0 =>
      val rows = math.min(rowsPerStrip, h - y0)
      val raw = new Array[Byte](rows * w * spp)
      var k = 0
      for (y <- y0 until y0 + rows; x <- 0 until w; s <- 0 until spp) {
        raw(k) = px(x, y, s).toByte; k += 1
      }
      compression match {
        case 1 => raw
        case 5 => lzwEncode(raw)
        case _ =>
          val bos = new java.io.ByteArrayOutputStream()
          for (r <- 0 until rows) {
            val row = java.util.Arrays.copyOfRange(raw, r * w * spp,
              (r + 1) * w * spp)
            bos.write(packBitsRow(row))
          }
          bos.toByteArray
      }
    }
    val nStrips = strips.length
    // layout: header(8) | strip data | BitsPerSample array (spp=3) |
    //         StripOffsets/ByteCounts arrays (if nStrips > 2) | IFD
    out.write(if (littleEndian) 'I' else 'M')
    out.write(if (littleEndian) 'I' else 'M')
    w16(42)
    val dataStart = 8
    val stripOfs = strips.scanLeft(dataStart)((a, s) => a + s.length)
    var ifdOfs = stripOfs.last
    // auxiliary arrays (BitsPerSample triple, strip tables) follow the
    // strip data; the IFD comes last
    val bpsBytes = if (spp == 3) 6 else 0
    val soBytes = if (nStrips > 1) nStrips * 4 else 0
    val sbBytes = if (nStrips > 1) nStrips * 4 else 0
    val bpsAt = ifdOfs
    val soAt = bpsAt + bpsBytes
    val sbAt = soAt + soBytes
    ifdOfs = sbAt + sbBytes
    w32(ifdOfs.toLong) // header IFD offset
    strips.foreach(out.write)
    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (nStrips > 1) {
      stripOfs.init.foreach(o => w32(o.toLong))
      strips.foreach(s => w32(s.length.toLong))
    }
    // IFD
    val entries = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Long, Long)] // tag, type, count, value
    entries += ((256, 3, 1L, w.toLong))
    entries += ((257, 3, 1L, h.toLong))
    if (spp == 1) entries += ((258, 3, 1L, 8L))
    else entries += ((258, 3, 3L, bpsAt.toLong))
    entries += ((259, 3, 1L, compression.toLong))
    entries += ((262, 3, 1L, if (spp == 1) 1L else 2L))
    if (nStrips == 1) entries += ((273, 4, 1L, stripOfs.head.toLong))
    else entries += ((273, 4, nStrips.toLong, soAt.toLong))
    entries += ((277, 3, 1L, spp.toLong))
    entries += ((278, 3, 1L, rowsPerStrip.toLong))
    if (nStrips == 1) entries += ((279, 4, 1L, strips.head.length.toLong))
    else entries += ((279, 4, nStrips.toLong, sbAt.toLong))
    w16(entries.length)
    entries.sortBy(_._1).foreach { case (tag, ty, cnt, value) =>
      w16(tag); w16(ty); w32(cnt)
      // SHORT values inline in the low half per byte order
      if (ty == 3 && cnt == 1) {
        if (littleEndian) { w16(value.toInt); w16(0) }
        else { w16(value.toInt); w16(0) }
      } else w32(value)
    }
    w32(0L) // no next IFD
    out.toByteArray
  }

  /** PackBits one row (TIFF requires per-row packing). */
  private def packBitsRow(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < row.length) {
      var run = 1
      while (i + run < row.length && run < 128 && row(i + run) == row(i))
        run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(row(i)); i += run
      } else {
        var lit = 1
        var stop = false
        while (!stop && i + lit < row.length && lit < 128) {
          if (i + lit + 1 < row.length &&
              row(i + lit) == row(i + lit + 1)) stop = true
          else lit += 1
        }
        out.write(lit - 1); out.write(row, i, lit); i += lit
      }
    }
    out.toByteArray
  }

  // ---- decoder ------------------------------------------------------------

  def decode(bytes: Array[Byte]): Option[Image] = {
    try decodeImpl(bytes)
    catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeImpl(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return None
    val rd = new Rd(bytes, le)
    if (rd.u16(2) != 42) return None
    val ifd = rd.u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = rd.u16(ifd.toInt)
    if (ifd + 2 + n * 12 + 4 > bytes.length) return None
    var w = 0; var h = 0; var spp = 1; var comp = 1
    var photometric = -1
    var rowsPerStrip = Int.MaxValue
    var bits = Vector.empty[Int]
    var stripOfs = Vector.empty[Long]
    var stripCnt = Vector.empty[Long]
    val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8)
    var e = 0
    var prevTag = -1
    while (e < n) {
      val at = ifd.toInt + 2 + e * 12
      val tag = rd.u16(at)
      if (tag <= prevTag) return None // IFD entries must be ascending
      prevTag = tag
      val ty = rd.u16(at + 2)
      val cnt = rd.u32(at + 4)
      val sz = typeSize.getOrElse(ty, 0)
      if (sz == 0) { e += 1 } // unknown type: skip entry
      else {
        val total = sz * cnt
        val valAt: Long = if (total <= 4) (at + 8).toLong else rd.u32(at + 8)
        if (valAt + total > bytes.length) return None
        def valueAt(k: Int): Long = ty match {
          case 3 => rd.u16((valAt + 2L * k).toInt).toLong
          case 4 => rd.u32((valAt + 4L * k).toInt)
          case 1 => (bytes((valAt + k).toInt) & 0xFF).toLong
          case _ => 0L
        }
        tag match {
          case 256 => w = valueAt(0).toInt
          case 257 => h = valueAt(0).toInt
          case 258 => bits = (0 until cnt.toInt).map(valueAt).map(_.toInt).toVector
          case 259 => comp = valueAt(0).toInt
          case 262 => photometric = valueAt(0).toInt
          case 273 => stripOfs = (0 until cnt.toInt).map(valueAt).toVector
          case 277 => spp = valueAt(0).toInt
          case 278 => rowsPerStrip = valueAt(0).toInt
          case 279 => stripCnt = (0 until cnt.toInt).map(valueAt).toVector
          case _ => ()
        }
        e += 1
      }
    }
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    if (spp != 1 && spp != 3) return None
    if (bits.nonEmpty && (bits.length != spp || bits.exists(_ != 8)))
      return None
    if (comp != 1 && comp != 5 && comp != 32773) return None
    if (photometric < 0 || photometric > 2) return None
    if (rowsPerStrip <= 0) return None
    if (stripOfs.isEmpty || stripOfs.length != stripCnt.length) return None
    val expectStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    if (stripOfs.length != expectStrips) return None
    val out = new Array[Int](w * h * spp)
    var strip = 0
    while (strip < expectStrips) {
      val y0 = strip * rowsPerStrip
      val rows = math.min(rowsPerStrip, h - y0)
      val expect = rows * w * spp
      val so = stripOfs(strip); val sc = stripCnt(strip)
      if (so < 0 || sc < 0 || so + sc > bytes.length) return None
      val raw: Array[Byte] = comp match {
        case 1 =>
          if (sc != expect) return None
          java.util.Arrays.copyOfRange(bytes, so.toInt, (so + sc).toInt)
        case 5 =>
          lzwDecode(bytes, so.toInt, (so + sc).toInt, expect)
            .getOrElse(return None)
        case _ =>
          unpackBits(bytes, so.toInt, (so + sc).toInt, expect)
            .getOrElse(return None)
      }
      var k = 0
      while (k < expect) {
        out(y0 * w * spp + k) = raw(k) & 0xFF
        k += 1
      }
      strip += 1
    }
    Some(Image(w, h, spp, comp, expectStrips, out))
  }
}
