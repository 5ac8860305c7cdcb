package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater, Inflater}

/** ZIP container framing (PKWARE APPNOTE.TXT, the ISO/IEC 21320-1
  * subset) — the dominant distribution container for datasets and
  * document corpora (ODF/OOXML/EPUB are all ZIP). Completes the
  * container family next to [[Warc]] (crawls) and [[Tar]] (unix
  * archives): locate the End-Of-Central-Directory record by its
  * signature scan from the tail, walk the central directory, then for
  * each entry re-derive the payload position from its LOCAL header
  * (the two disagree in hostile files — both are validated), inflate
  * method-8 data with a raw `Inflater`, and verify CRC-32 and both
  * sizes.
  *
  * Scope: methods 0 (stored) and 8 (deflate); single-disk archives; no
  * encryption (flag bit 0), no data descriptors (flag bit 3), no
  * zip64 (any 0xFFFFFFFF sentinel rejects). Strictness contract
  * (DecoderFuzzSpec law): any signature/count/size/CRC mismatch,
  * overlap or truncation rejects the whole archive with None — honest
  * rejection, never a crash, never a partial guess.
  */
object ZipArc {

  final case class Entry(name: String, method: Int, compressedSize: Int,
      payload: Array[Byte])

  val MaxEntries = 1 << 16 // the format's own 2-byte count ceiling
  /** per-entry inflate cap — zip-bomb guard, same role as
    * [[Warc.MaxEntityBytes]]. */
  val MaxEntryBytes = 16 << 20

  // ---- encode ----------------------------------------------------------

  /** write a ZIP of `members`; `deflate = false` stores raw. DOS
    * time/date fields are fixed for deterministic fixtures. */
  def encode(members: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    val central = members.map { case (name, payload, doDeflate) =>
      val nameB = name.getBytes(US_ASCII)
      require(nameB.length > 0 && nameB.length < 0xFFFF, s"name: $name")
      val crc = new CRC32(); crc.update(payload)
      val data =
        if (!doDeflate) payload
        else {
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(payload); d.finish()
          val buf = new Array[Byte](payload.length + 64)
          val bos = new java.io.ByteArrayOutputStream()
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        }
      val method = if (doDeflate) 8 else 0
      val offset = out.size()
      u32(0x04034b50L); u16(20); u16(0); u16(method)
      u16(0x6020); u16(0x5821) // fixed DOS time/date (2024-01-01 12:01:00)
      u32(crc.getValue); u32(data.length.toLong); u32(payload.length.toLong)
      u16(nameB.length); u16(0)
      out.write(nameB); out.write(data)
      (nameB, method, crc.getValue, data.length, payload.length, offset)
    }
    val cdStart = out.size()
    central.foreach { case (nameB, method, crc, csize, usize, offset) =>
      u32(0x02014b50L); u16(20); u16(20); u16(0); u16(method)
      u16(0x6020); u16(0x5821)
      u32(crc); u32(csize.toLong); u32(usize.toLong)
      u16(nameB.length); u16(0); u16(0) // extra, comment
      u16(0); u16(0)                    // disk start, internal attrs
      u32(0L); u32(offset.toLong)       // external attrs, local offset
      out.write(nameB)
    }
    val cdSize = out.size() - cdStart
    u32(0x06054b50L); u16(0); u16(0)
    u16(central.length); u16(central.length)
    u32(cdSize.toLong); u32(cdStart.toLong); u16(0)
    out.toByteArray
  }

  // ---- decode ----------------------------------------------------------

  private def rd16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def rd32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
    ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  def parse(bytes: Array[Byte]): Option[Vector[Entry]] = {
    try parseImpl(bytes)
    catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def parseImpl(bytes: Array[Byte]): Option[Vector[Entry]] = {
    if (bytes.length < 22) return None
    // ---- EOCD: last signature within the 64 KiB + 22 tail window ----
    var eocd = -1
    var i = bytes.length - 22
    val floor = math.max(0, bytes.length - 22 - 0xFFFF)
    while (eocd < 0 && i >= floor) {
      if (rd32(bytes, i) == 0x06054b50L &&
          i + 22 + rd16(bytes, i + 20) == bytes.length) eocd = i
      else i -= 1
    }
    if (eocd < 0) return None
    if (rd16(bytes, eocd + 4) != 0 || rd16(bytes, eocd + 6) != 0)
      return None // multi-disk
    val n = rd16(bytes, eocd + 8)
    if (n != rd16(bytes, eocd + 10) || n > MaxEntries) return None
    val cdSize = rd32(bytes, eocd + 12)
    val cdOfs = rd32(bytes, eocd + 16)
    if (cdOfs + cdSize != eocd.toLong) return None
    // ---- central directory walk ----
    val out = Vector.newBuilder[Entry]
    var p = cdOfs.toInt
    var k = 0
    while (k < n) {
      if (p + 46 > eocd || rd32(bytes, p) != 0x02014b50L) return None
      val flags = rd16(bytes, p + 8)
      val method = rd16(bytes, p + 10)
      val crc = rd32(bytes, p + 16)
      val csize = rd32(bytes, p + 20)
      val usize = rd32(bytes, p + 24)
      val nameLen = rd16(bytes, p + 28)
      val extraLen = rd16(bytes, p + 30)
      val commentLen = rd16(bytes, p + 32)
      val localOfs = rd32(bytes, p + 42)
      if ((flags & 0x0009) != 0) return None // encrypted / data descriptor
      if (method != 0 && method != 8) return None
      if (csize == 0xFFFFFFFFL || usize == 0xFFFFFFFFL ||
          localOfs == 0xFFFFFFFFL) return None // zip64
      if (usize > MaxEntryBytes || csize > MaxEntryBytes) return None
      if (nameLen == 0 || p + 46 + nameLen + extraLen + commentLen > eocd)
        return None
      val name = new String(bytes, p + 46, nameLen, US_ASCII)
      // ---- local header re-derivation (lengths may differ from CD) ----
      val lp = localOfs.toInt
      if (lp + 30 > cdOfs || rd32(bytes, lp) != 0x04034b50L) return None
      if (rd16(bytes, lp + 8) != method) return None
      // no data descriptor (bit 3 is rejected above) → the local header
      // must carry the same crc/sizes as the central directory
      if ((rd16(bytes, lp + 6) & 0x0009) != 0) return None
      if (rd32(bytes, lp + 14) != crc || rd32(bytes, lp + 18) != csize ||
          rd32(bytes, lp + 22) != usize) return None
      val lNameLen = rd16(bytes, lp + 26)
      val lExtraLen = rd16(bytes, lp + 28)
      if (lNameLen != nameLen ||
          new String(bytes, lp + 30, lNameLen, US_ASCII) != name) return None
      val dataStart = lp + 30 + lNameLen + lExtraLen
      if (dataStart.toLong + csize > cdOfs) return None
      val data = java.util.Arrays.copyOfRange(
        bytes, dataStart, dataStart + csize.toInt)
      val payload =
        if (method == 0) {
          if (csize != usize) return None
          data
        } else {
          val inf = new Inflater(true) // raw deflate, no zlib wrapper
          inf.setInput(data)
          val buf = new Array[Byte](math.min(usize.toInt + 1, 1 << 16))
          val bos = new java.io.ByteArrayOutputStream()
          try {
            while (!inf.finished()) {
              val got =
                try inf.inflate(buf)
                catch { case _: java.util.zip.DataFormatException =>
                  return None }
              if (got == 0 && inf.needsInput()) return None // truncated
              bos.write(buf, 0, got)
              if (bos.size() > usize) return None
            }
          } finally inf.end()
          bos.toByteArray
        }
      if (payload.length.toLong != usize) return None
      val c = new CRC32(); c.update(payload)
      if (c.getValue != crc) return None
      out += Entry(name, method, csize.toInt, payload)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    if (p != eocd) return None // central directory must end at the EOCD
    Some(out.result())
  }
}
