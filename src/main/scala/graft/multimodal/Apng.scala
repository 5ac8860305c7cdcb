package graft.multimodal

/** APNG — animated PNG (W3C PNG specification, third edition, §4.8
  * "Animation information" / the original Mozilla APNG extension).
  * Completes the animated-image class next to GIF89a inter-frame
  * composition ([[GifAnim]]): APNG is what modern crawls actually carry
  * for animation, and unlike GIF it composes with FULL 8-bit alpha
  * (blend_op OVER), not just binary transparency.
  *
  * Public format only: a PNG with an `acTL` chunk (num_frames,
  * num_plays) after IHDR; each frame is announced by an `fcTL` chunk
  * (sequence_number, region width/height/x/y, delay_num/den,
  * dispose_op NONE|BACKGROUND|PREVIOUS, blend_op SOURCE|OVER). The
  * first animation frame may be the stream's own IDAT (fcTL before
  * IDAT, full-canvas region required); later frames ship as `fdAT`
  * chunks = sequence_number + an INDEPENDENT zlib stream of filtered
  * scanlines for the region. fcTL and fdAT share one sequence counter
  * starting at 0 with no gaps.
  *
  * Composition (spec order): the output buffer starts fully
  * transparent; before rendering frame N, frame N-1's dispose_op is
  * applied (NONE keeps, BACKGROUND clears N-1's region to transparent
  * black, PREVIOUS reverts N-1's region to the buffer as it was before
  * N-1 rendered; a PREVIOUS on the FIRST frame is treated as
  * BACKGROUND). blend SOURCE copies RGBA; blend OVER composites with
  * the non-premultiplied alpha formula (integer, truncating division —
  * exact when source alpha is 0 or 255).
  *
  * Strictness contract (DecoderFuzzSpec law): CRC mismatch, sequence
  * gaps, out-of-canvas regions, frame-count mismatch, short/long zlib
  * payloads, unknown dispose/blend, or truncation reject the whole
  * stream with None — honest rejection, never a crash.
  */
object Apng {

  /** one frame spec for the encoder: `px(x, y)` is asked in CANVAS
    * coordinates inside the region and returns (r, g, b, a). */
  final case class FrameSpec(x: Int, y: Int, w: Int, h: Int,
      disposeOp: Int, blendOp: Int, delayNum: Int, delayDen: Int,
      px: (Int, Int) => (Int, Int, Int, Int))

  /** decoded animation: canvases are full-canvas COMPOSED frames,
    * pixels packed 0xAARRGGBB. */
  final case class Anim(width: Int, height: Int, numPlays: Int,
      delays: Vector[(Int, Int)], canvases: Vector[Array[Int]])

  val MaxCanvasPx: Long = 1L << 26
  /** cumulative decoded-pixel bound across frames (the GifAnim law): a
    * small crafted file must not demand unbounded composition memory. */
  val MaxTotalPx: Long = 1L << 27

  // ---- chunk plumbing ---------------------------------------------------

  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(body)
    be32(body.length.toLong) ++ t ++ body ++ be32(crc.getValue)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ---- encoder ------------------------------------------------------------

  /** RGBA8 APNG; the first frame must cover the canvas (it doubles as
    * the stream's default image / IDAT). Scanlines use filter type 0 —
    * the decode-side filter family is exercised by the still-PNG
    * fixtures ([[Multimodal.encodePng]]). */
  def encode(w: Int, h: Int, numPlays: Int, frames: Seq[FrameSpec]): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h <= MaxCanvasPx)
    require(frames.nonEmpty && frames.head.x == 0 && frames.head.y == 0 &&
      frames.head.w == w && frames.head.h == h,
      "first frame must cover the canvas")
    frames.foreach { f =>
      require(f.x >= 0 && f.y >= 0 && f.w > 0 && f.h > 0 &&
        f.x + f.w <= w && f.y + f.h <= h, "region inside canvas")
      require(f.disposeOp >= 0 && f.disposeOp <= 2 &&
        f.blendOp >= 0 && f.blendOp <= 1)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    out.write(chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 6, 0, 0, 0))) // 8-bit RGBA, no interlace
    out.write(chunk("acTL",
      be32(frames.length.toLong) ++ be32(numPlays.toLong)))
    var seq = 0L
    def fctl(f: FrameSpec): Array[Byte] = {
      val b = be32(seq) ++ be32(f.w.toLong) ++ be32(f.h.toLong) ++
        be32(f.x.toLong) ++ be32(f.y.toLong) ++
        Array[Byte](((f.delayNum >> 8) & 0xFF).toByte,
          (f.delayNum & 0xFF).toByte,
          ((f.delayDen >> 8) & 0xFF).toByte, (f.delayDen & 0xFF).toByte,
          f.disposeOp.toByte, f.blendOp.toByte)
      seq += 1
      chunk("fcTL", b)
    }
    def rows(f: FrameSpec): Array[Byte] = {
      val raw = new Array[Byte](f.h * (1 + 4 * f.w))
      var i = 0
      for (yy <- 0 until f.h) {
        raw(i) = 0; i += 1 // filter type 0
        for (xx <- 0 until f.w) {
          val (r, g, b, a) = f.px(f.x + xx, f.y + yy)
          raw(i) = r.toByte; raw(i + 1) = g.toByte
          raw(i + 2) = b.toByte; raw(i + 3) = a.toByte
          i += 4
        }
      }
      deflate(raw)
    }
    out.write(fctl(frames.head))
    out.write(chunk("IDAT", rows(frames.head)))
    frames.tail.foreach { f =>
      out.write(fctl(f))
      val data = rows(f)
      out.write(chunk("fdAT", be32(seq) ++ data))
      seq += 1
    }
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  // ---- decoder ------------------------------------------------------------

  private final case class Fctl(seq: Long, w: Int, h: Int, x: Int, y: Int,
      delayNum: Int, delayDen: Int, dispose: Int, blend: Int)

  def decode(bytes: Array[Byte]): Option[Anim] = {
    try decodeImpl(bytes)
    catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeImpl(bytes: Array[Byte]): Option[Anim] = {
    if (bytes.length < 8) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Sig(i)) return None; i += 1 }
    def u8(at: Int) = bytes(at) & 0xFF
    def rd32(at: Int): Long =
      (u8(at).toLong << 24) | (u8(at + 1) << 16) | (u8(at + 2) << 8) | u8(at + 3)
    var w = 0; var h = 0
    var numFrames = -1; var numPlays = 0
    var sawIhdr = false; var sawIend = false
    val fctls = Vector.newBuilder[Fctl]
    // per-frame zlib data: index aligned with fcTL order
    val frameData = scala.collection.mutable.ArrayBuffer.empty[java.io.ByteArrayOutputStream]
    var idatSeen = false
    var idatIsFrame0 = false
    var nextSeq = 0L
    var nFctl = 0
    while (i + 12 <= bytes.length && !sawIend) {
      val len = rd32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > bytes.length) return None
      val typ = new String(bytes, i + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, i + 4, 4 + len.toInt)
      if (crc.getValue != rd32(i + 8 + len.toInt)) return None
      val body = i + 8
      typ match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          w = rd32(body).toInt; h = rd32(body + 4).toInt
          if (w <= 0 || h <= 0 || w.toLong * h > MaxCanvasPx) return None
          if (u8(body + 8) != 8 || u8(body + 9) != 6 || u8(body + 12) != 0)
            return None // RGBA8, no interlace — the encoder's scope
          sawIhdr = true
        case "acTL" =>
          if (!sawIhdr || numFrames >= 0 || idatSeen || len != 8) return None
          numFrames = rd32(body).toInt
          numPlays = rd32(body + 4).toInt
          if (numFrames <= 0 || numFrames > 4096) return None
        case "fcTL" =>
          if (!sawIhdr || numFrames < 0 || len != 26) return None
          if (rd32(body) != nextSeq) return None
          nextSeq += 1
          val f = Fctl(rd32(body), rd32(body + 4).toInt, rd32(body + 8).toInt,
            rd32(body + 12).toInt, rd32(body + 16).toInt,
            (u8(body + 20) << 8) | u8(body + 21),
            (u8(body + 22) << 8) | u8(body + 23),
            u8(body + 24), u8(body + 25))
          if (f.w <= 0 || f.h <= 0 || f.x < 0 || f.y < 0 ||
              f.x + f.w > w || f.y + f.h > h) return None
          if (f.dispose > 2 || f.blend > 1) return None
          if (!idatSeen && nFctl > 0) return None // two fcTL before IDAT
          if (!idatSeen) idatIsFrame0 = true
          fctls += f
          frameData += new java.io.ByteArrayOutputStream()
          nFctl += 1
        case "IDAT" =>
          if (!sawIhdr) return None
          idatSeen = true
          if (idatIsFrame0) frameData(0).write(bytes, body, len.toInt)
        case "fdAT" =>
          if (len < 4 || nFctl == 0 || !idatSeen) return None
          if (rd32(body) != nextSeq) return None
          nextSeq += 1
          frameData(nFctl - 1).write(bytes, body + 4, len.toInt - 4)
        case "IEND" =>
          if (len != 0) return None
          sawIend = true
        case _ => () // ancillary chunks
      }
      i += 12 + len.toInt
    }
    if (!sawIhdr || !sawIend || numFrames < 0) return None
    if (i != bytes.length) return None // trailing garbage
    val fs = fctls.result()
    if (fs.length != numFrames || !idatIsFrame0) return None
    if (fs.head.x != 0 || fs.head.y != 0 || fs.head.w != w || fs.head.h != h)
      return None // first animated frame must cover the canvas
    var totalPx = 0L
    fs.foreach { f =>
      totalPx += f.w.toLong * f.h
      if (totalPx > MaxTotalPx) return None
    }
    // ---- inflate + unfilter each frame region, then compose ----
    val canvas = new Array[Int](w * h) // 0xAARRGGBB, starts transparent
    val canvases = Vector.newBuilder[Array[Int]]
    val delays = Vector.newBuilder[(Int, Int)]
    var fi = 0
    var prevSnapshot: Array[Int] = null
    var prevF: Fctl = null
    while (fi < fs.length) {
      val f = fs(fi)
      val region = inflateRegion(frameData(fi).toByteArray, f.w, f.h)
        .getOrElse(return None)
      // dispose of the PREVIOUS frame
      if (prevF != null) {
        prevF.dispose match {
          case 0 => ()
          case 1 =>
            var yy = prevF.y
            while (yy < prevF.y + prevF.h) {
              java.util.Arrays.fill(canvas, yy * w + prevF.x,
                yy * w + prevF.x + prevF.w, 0)
              yy += 1
            }
          case 2 =>
            var yy = prevF.y
            while (yy < prevF.y + prevF.h) {
              System.arraycopy(prevSnapshot, yy * w + prevF.x, canvas,
                yy * w + prevF.x, prevF.w)
              yy += 1
            }
        }
      }
      // snapshot for a possible dispose-PREVIOUS of THIS frame
      val effDispose = if (fi == 0 && f.dispose == 2) 1 else f.dispose
      prevSnapshot = if (effDispose == 2) canvas.clone() else prevSnapshot
      prevF = f.copy(dispose = effDispose)
      // blend the region
      var yy = 0
      while (yy < f.h) {
        var xx = 0
        while (xx < f.w) {
          val src = region(yy * f.w + xx)
          val at = (f.y + yy) * w + (f.x + xx)
          if (f.blend == 0) canvas(at) = src
          else {
            val sa = (src >>> 24) & 0xFF
            if (sa == 255) canvas(at) = src
            else if (sa != 0) {
              val dst = canvas(at)
              val da = (dst >>> 24) & 0xFF
              val outA = sa * 255 + da * (255 - sa) // scaled by 255
              def ch(sc: Int, dc: Int): Int =
                if (outA == 0) 0
                else (sc * sa * 255 + dc * da * (255 - sa)) / outA
              val r = ch((src >> 16) & 0xFF, (dst >> 16) & 0xFF)
              val g = ch((src >> 8) & 0xFF, (dst >> 8) & 0xFF)
              val b = ch(src & 0xFF, dst & 0xFF)
              canvas(at) = ((outA / 255) << 24) | (r << 16) | (g << 8) | b
            }
          }
          xx += 1
        }
        yy += 1
      }
      canvases += canvas.clone()
      delays += ((f.delayNum, f.delayDen))
      fi += 1
    }
    Some(Anim(w, h, numPlays, delays.result(), canvases.result()))
  }

  /** inflate an fdAT/IDAT zlib stream and reverse the scanline filters
    * for an RGBA8 region; exact length enforced. */
  private def inflateRegion(z: Array[Byte], rw: Int, rh: Int): Option[Array[Int]] = {
    val stride = 4 * rw
    val raw = new Array[Byte](rh * (1 + stride))
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(z)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None
        off += n
      }
      if (off != raw.length || !inf.finished()) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    val out = new Array[Int](rw * rh)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < rh) {
      val base = y * (1 + stride)
      val filter = raw(base) & 0xFF
      var x = 0
      while (x < stride) {
        val fv = raw(base + 1 + x) & 0xFF
        val a = if (x >= 4) cur(x - 4) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x >= 4 && y > 0) prev(x - 4) else 0
        val recon = filter match {
          case 0 => fv
          case 1 => fv + a
          case 2 => fv + b
          case 3 => fv + ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            fv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        cur(x) = recon & 0xFF
        x += 1
      }
      var px = 0
      while (px < rw) {
        val o = px * 4
        out(y * rw + px) = (cur(o + 3) << 24) | (cur(o) << 16) |
          (cur(o + 1) << 8) | cur(o + 2)
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some(out)
  }
}
