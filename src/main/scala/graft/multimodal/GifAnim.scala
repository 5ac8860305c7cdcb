package graft.multimodal

/** ======= REAL ======= animated GIF decode — the first INTER-FRAME
  * format in the multimodal family (every frame is a delta onto the
  * logical-screen canvas). Frames are sub-rectangles composed under the
  * GIF89a Graphic Control Extension semantics:
  *
  *  - disposal 0/1: the drawn frame stays on the canvas;
  *  - disposal 2: after the frame's delay, its RECT reverts to the
  *    background color before the next frame draws;
  *  - disposal 3: the canvas reverts to its state BEFORE the frame;
  *  - a transparent index never overwrites the canvas pixel under it;
  *  - interlaced frames carry rows in the 4-pass (8/0, 8/4, 4/2, 2/1)
  *    order and are de-interlaced here;
  *  - the NETSCAPE2.0 application extension's loop count is surfaced.
  *
  * The canvas is deterministic: it starts as the background color
  * (global palette at the background index; index 0 when absent), so
  * every composed pixel is exact integer arithmetic an oracle restates.
  * LZW is the shared [[Multimodal.lzwDecode]]; anything malformed
  * (rect outside the screen, short pixel data, bad codes) → None.
  *
  * Reference scope note: signaldb stores media as opaque blobs; frame
  * decode belongs to the training-pipeline surface this engine adds
  * (SURVEY §2 multimodal). H.264/VP9 entropy decode stays honestly
  * rejected — this closes the inter-frame COMPOSITION semantics on a
  * format whose whole spec is public and hand-implementable.
  */
object GifAnim {

  /** one decoded frame: the raw rect indices (de-interlaced) plus the
    * control state that governs its composition. `transparent` = -1
    * when the frame has no transparent index. */
  final case class Frame(left: Int, top: Int, w: Int, h: Int,
      disposal: Int, transparent: Int, delayCs: Int,
      interlaced: Boolean, indices: Array[Byte], palette: Array[Int])

  final case class Anim(width: Int, height: Int, bgIndex: Int,
      globalPalette: Array[Int], frames: Vector[Frame],
      loopCount: Option[Int])

  /** decode every frame of a GIF87a/89a stream. */
  def decode(bytes: Array[Byte]): Option[Anim] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 13 || new String(bytes.slice(0, 4), "ASCII") != "GIF8")
      return None
    var i = 6
    val sw = le16(i); val sh = le16(i + 2); val flags = u8(i + 4)
    val bgIndex = u8(i + 5)
    i += 7
    var global: Array[Int] = Array.empty
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (i + 3 * n > bytes.length) return None
      global = (0 until n).map(k =>
        (u8(i + 3 * k) << 16) | (u8(i + 3 * k + 1) << 8) | u8(i + 3 * k + 2)).toArray
      i += 3 * n
    }
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > (1L << 26)) return None
    val frames = Vector.newBuilder[Frame]
    var loopCount: Option[Int] = None
    // pending Graphic Control Extension state (applies to next image)
    var disposal = 0; var transparent = -1; var delayCs = 0
    var nFrames = 0
    var totalRectPx = 0L
    while (i < bytes.length) {
      u8(i) match {
        case 0x21 => // extension
          if (i + 2 > bytes.length) return None
          val label = u8(i + 1)
          i += 2
          if (label == 0xF9) { // Graphic Control Extension
            if (i >= bytes.length || u8(i) != 4 || i + 5 > bytes.length)
              return None
            val packed = u8(i + 1)
            disposal = (packed >> 2) & 7
            delayCs = le16(i + 2)
            transparent = if ((packed & 1) != 0) u8(i + 4) else -1
            i += 5
            if (i >= bytes.length || u8(i) != 0) return None
            i += 1
          } else if (label == 0xFF) { // application extension
            if (i >= bytes.length) return None
            val blockLen = u8(i)
            val app = if (blockLen == 11 && i + 12 <= bytes.length)
              new String(bytes, i + 1, 11, "ASCII") else ""
            i += 1 + blockLen
            // sub-blocks; NETSCAPE2.0 carries (1, loop LE16)
            while (i < bytes.length && u8(i) != 0) {
              val n = u8(i)
              if (i + 1 + n > bytes.length) return None
              if (app == "NETSCAPE2.0" && n == 3 && u8(i + 1) == 1)
                loopCount = Some(le16(i + 2))
              i += 1 + n
            }
            if (i >= bytes.length) return None
            i += 1
          } else { // comment / plain text / unknown: skip sub-blocks
            while (i < bytes.length && u8(i) != 0) i += 1 + u8(i)
            if (i >= bytes.length) return None
            i += 1
          }
        case 0x2C => // image descriptor
          if (i + 10 > bytes.length) return None
          val left = le16(i + 1); val top = le16(i + 3)
          val iw = le16(i + 5); val ih = le16(i + 7); val iflags = u8(i + 9)
          i += 10
          if (iw <= 0 || ih <= 0 || left + iw > sw || top + ih > sh)
            return None
          var pal = global
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            if (i + 3 * n > bytes.length) return None
            pal = (0 until n).map(k =>
              (u8(i + 3 * k) << 16) | (u8(i + 3 * k + 1) << 8) | u8(i + 3 * k + 2)).toArray
            i += 3 * n
          }
          if (pal.isEmpty) return None
          if (i >= bytes.length) return None
          val mcs = u8(i); i += 1
          if (mcs < 2 || mcs > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          while (i < bytes.length && u8(i) != 0) {
            val n = u8(i)
            if (i + 1 + n > bytes.length) return None
            data.write(bytes, i + 1, n); i += 1 + n
          }
          if (i >= bytes.length) return None
          i += 1 // sub-block terminator
          val raw = Multimodal.lzwDecode(mcs, data.toByteArray, iw * ih)
            .getOrElse(return None)
          if (raw.length < iw * ih) return None
          val interlaced = (iflags & 0x40) != 0
          val idx =
            if (!interlaced) raw
            else { // 4-pass de-interlace: rows arrive 0/8, 4/8, 2/4, 1/2
              val out = new Array[Byte](iw * ih)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until ih by step) {
                System.arraycopy(raw, src * iw, out, y * iw, iw)
                src += 1
              }
              out
            }
          frames += Frame(left, top, iw, ih, disposal, transparent,
            delayCs, interlaced, java.util.Arrays.copyOf(idx, iw * ih), pal)
          nFrames += 1
          if (nFrames > 4096) return None // runaway stream
          // cumulative decode bounds: a tiny crafted stream must not be
          // able to demand unbounded memory. Both the retained frame
          // indices (sum of rect areas) and what compose() will retain
          // (frames x full canvas) stay under 2^27 px, or the input is
          // rejected as hostile rather than decoded
          totalRectPx += iw.toLong * ih
          if (totalRectPx > (1L << 27)) return None
          if (nFrames.toLong * sw * sh > (1L << 27)) return None
          disposal = 0; transparent = -1; delayCs = 0 // GCE is one-shot
        case 0x3B =>
          val fs = frames.result()
          if (fs.isEmpty) return None
          return Some(Anim(sw, sh, bgIndex, global, fs, loopCount))
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** compose the frames onto the logical screen: returns the canvas
    * (packed 0xRRGGBB per pixel) AFTER each frame is drawn, applying
    * the PREVIOUS frame's disposal first. Background = the global
    * palette's background index (0x000000 if out of range). */
  def compose(a: Anim): Vector[Array[Int]] = {
    val bg = if (a.bgIndex < a.globalPalette.length)
      a.globalPalette(a.bgIndex) else 0
    val n = a.width * a.height
    var canvas = Array.fill(n)(bg)
    var beforePrev: Array[Int] = null // canvas before the previous draw
    var prev: Frame = null
    val out = Vector.newBuilder[Array[Int]]
    a.frames.foreach { f =>
      if (prev != null) prev.disposal match {
        case 2 => // restore the previous frame's rect to background
          var y = 0
          while (y < prev.h) {
            var x = 0
            while (x < prev.w) {
              canvas((prev.top + y) * a.width + (prev.left + x)) = bg
              x += 1
            }
            y += 1
          }
        case 3 => canvas = beforePrev.clone() // restore to prior state
        case _ => // 0/1: leave as drawn
      }
      beforePrev = canvas.clone()
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) {
          val ci = f.indices(y * f.w + x) & 0xFF
          if (ci != f.transparent && ci < f.palette.length)
            canvas((f.top + y) * a.width + (f.left + x)) = f.palette(ci)
          x += 1
        }
        y += 1
      }
      out += canvas.clone()
      prev = f
    }
    out.result()
  }

  /** one frame of a synthetic animation. `transparent` = -1 for none. */
  final case class FrameSpec(left: Int, top: Int, w: Int, h: Int,
      disposal: Int, transparent: Int, delayCs: Int, interlaced: Boolean,
      index: (Int, Int) => Int)

  /** standards-conformant multi-frame GIF89a: global color table,
    * NETSCAPE2.0 loop extension, a Graphic Control Extension before
    * every frame, real LZW per frame (rows pre-shuffled into interlace
    * order when the frame is flagged interlaced). Any external viewer
    * plays it; [[decode]] must undo all of it. */
  def syntheticAnimatedGif(sw: Int, sh: Int, palette: Array[Int],
      bgIndex: Int, loopCount: Int, specs: Seq[FrameSpec]): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256 && specs.nonEmpty)
    var palBits = 1
    while ((2 << (palBits - 1)) < palette.length) palBits += 1
    val palN = 2 << (palBits - 1)
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ASCII"))
    out.write(le16(sw)); out.write(le16(sh))
    out.write(0x80 | (palBits - 1))
    out.write(bgIndex); out.write(0)
    for (k <- 0 until palN) {
      val rgb = if (k < palette.length) palette(k) else 0
      out.write((rgb >> 16) & 0xFF); out.write((rgb >> 8) & 0xFF)
      out.write(rgb & 0xFF)
    }
    // NETSCAPE2.0 loop extension
    out.write(0x21); out.write(0xFF); out.write(11)
    out.write("NETSCAPE2.0".getBytes("ASCII"))
    out.write(3); out.write(1); out.write(le16(loopCount)); out.write(0)
    specs.foreach { f =>
      require(f.left + f.w <= sw && f.top + f.h <= sh && f.w > 0 && f.h > 0)
      // Graphic Control Extension
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(((f.disposal & 7) << 2) | (if (f.transparent >= 0) 1 else 0))
      out.write(le16(f.delayCs))
      out.write(if (f.transparent >= 0) f.transparent else 0)
      out.write(0)
      // image descriptor
      out.write(0x2C)
      out.write(le16(f.left)); out.write(le16(f.top))
      out.write(le16(f.w)); out.write(le16(f.h))
      out.write(if (f.interlaced) 0x40 else 0)
      val mcs = math.max(2, palBits)
      out.write(mcs)
      val rows: Seq[Int] =
        if (!f.interlaced) 0 until f.h
        else Seq((0, 8), (4, 8), (2, 4), (1, 2))
          .flatMap { case (s0, st) => s0 until f.h by st }
      val idx = new Array[Byte](f.w * f.h)
      var p = 0
      rows.foreach { y =>
        var x = 0
        while (x < f.w) {
          val c = f.index(x, y)
          require(c >= 0 && c < palette.length, s"index $c out of palette")
          idx(p) = c.toByte; p += 1; x += 1
        }
      }
      val lzw = Multimodal.lzwEncode(mcs, idx)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n); off += n
      }
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }
}
