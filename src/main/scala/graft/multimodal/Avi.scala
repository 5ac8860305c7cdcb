package graft.multimodal

import java.io.ByteArrayOutputStream

/** ======= REAL ======= MJPEG-in-AVI VIDEO decode, zero codec deps:
  * Motion-JPEG is the one video format whose frames need no inter-frame
  * entropy codec — every frame is an independent baseline JPEG, which
  * [[Jpeg]] already decodes from raw bytes. So the full video path is
  * genuinely real here: RIFF/AVI container walk (hdrl → avih main
  * header, strl → strh/strf stream headers, movi → 00dc frame chunks
  * with RIFF word alignment) plus per-frame JPEG decode. H.264/VP9
  * remain out (their entropy decoding is codec-library territory) —
  * this closes the video column of the multimodal table for the codec
  * class that is honestly decodable.
  *
  * Reference context: signaldb stores media attachments as opaque blobs
  * with typed metadata; frame-level features are the training-pipeline
  * consumer of that column.
  */
object Avi {

  /** container metadata from the real header walk + the raw bytes of
    * each video frame chunk, in stream order. */
  final case class AviVideo(
      width: Int, height: Int, usPerFrame: Long, totalFrames: Int,
      frames: Vector[Array[Byte]])

  /** Build a standards-shaped AVI: RIFF('AVI ') { LIST(hdrl){ avih,
    * LIST(strl){ strh('vids'/'MJPG'), strf(BITMAPINFOHEADER) } },
    * LIST(movi){ 00dc… } } — each 00dc payload one JPEG, padded to
    * even length per the RIFF rules. */
  def syntheticAvi(w: Int, h: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(fourcc.getBytes("ASCII"))
      writeLe32(out, body.length)
      out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF word alignment
      out.toByteArray
    }
    def list(kind: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val body = new ByteArrayOutputStream()
      body.write(kind.getBytes("ASCII"))
      parts.foreach(body.write)
      chunk("LIST", body.toByteArray)
    }
    val avih = {
      val b = new ByteArrayOutputStream()
      writeLe32(b, usPerFrame.toInt) // dwMicroSecPerFrame
      writeLe32(b, 0); writeLe32(b, 0); writeLe32(b, 0) // maxBytes, pad, flags
      writeLe32(b, frames.size) // dwTotalFrames
      writeLe32(b, 0) // dwInitialFrames
      writeLe32(b, 1) // dwStreams
      writeLe32(b, 0) // dwSuggestedBufferSize
      writeLe32(b, w); writeLe32(b, h)
      (0 until 4).foreach(_ => writeLe32(b, 0)) // dwReserved
      chunk("avih", b.toByteArray)
    }
    val strh = {
      val b = new ByteArrayOutputStream()
      b.write("vids".getBytes("ASCII"))
      b.write("MJPG".getBytes("ASCII"))
      writeLe32(b, 0); writeLe32(b, 0) // flags, prio+lang
      writeLe32(b, 0) // initial frames
      writeLe32(b, 1) // dwScale
      writeLe32(b, if (usPerFrame > 0) (1000000L / usPerFrame).toInt else 0) // dwRate
      writeLe32(b, 0) // start
      writeLe32(b, frames.size) // length
      writeLe32(b, 0); writeLe32(b, 0); writeLe32(b, 0) // bufsize, quality, samplesize
      writeLe32(b, 0); writeLe32(b, 0) // rcFrame
      chunk("strh", b.toByteArray)
    }
    val strf = {
      val b = new ByteArrayOutputStream()
      writeLe32(b, 40) // biSize
      writeLe32(b, w); writeLe32(b, h)
      writeLe16(b, 1); writeLe16(b, 24) // planes, bitcount
      b.write("MJPG".getBytes("ASCII")) // biCompression
      writeLe32(b, w * h * 3)
      writeLe32(b, 0); writeLe32(b, 0); writeLe32(b, 0); writeLe32(b, 0)
      chunk("strf", b.toByteArray)
    }
    val movi = list("movi", frames.map(f => chunk("00dc", f)))
    val riffBody = new ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("ASCII"))
    riffBody.write(list("hdrl", Seq(avih, list("strl", Seq(strh, strf)))))
    riffBody.write(movi)
    chunk("RIFF", riffBody.toByteArray)
  }

  /** Real RIFF walk: validates RIFF/'AVI ' framing and declared sizes,
    * reads width/height/usPerFrame/dwTotalFrames from avih, requires an
    * MJPG 'vids' stream header, and collects 00dc/00db frame payloads
    * from the movi LIST honoring the even-byte padding rule. Truncated
    * or malformed containers and frame-count mismatches → None, never a
    * guess. */
  def aviVideo(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes.length < 12) return None
    def le32(i: Int): Long =
      (bytes(i) & 0xFFL) | ((bytes(i + 1) & 0xFFL) << 8) |
        ((bytes(i + 2) & 0xFFL) << 16) | ((bytes(i + 3) & 0xFFL) << 24)
    def fourcc(i: Int): String = new String(bytes.slice(i, i + 4), "ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val riffLen = le32(4)
    if (riffLen < 4 || 8 + riffLen > bytes.length) return None
    var w = -1; var h = -1; var usPerFrame = -1L; var total = -1
    var mjpg = false
    var streamIdx = -1 // strl LISTs appear in stream-number order
    val frames = Vector.newBuilder[Array[Byte]]
    // walk chunks in [from, to); LIST bodies recurse
    def walk(from: Int, to: Int): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val id = fourcc(i)
        val len = le32(i + 4)
        if (len > Int.MaxValue || i + 8 + len > to) return false
        val body = i + 8
        val n = len.toInt
        id match {
          case "LIST" =>
            if (n < 4) return false
            fourcc(body) match {
              case "strl" =>
                streamIdx += 1
                if (!walk(body + 4, body + n)) return false
              case "hdrl" | "movi" =>
                if (!walk(body + 4, body + n)) return false
              case _ => () // unknown LIST kinds skipped whole
            }
          case "avih" =>
            if (n < 40) return false
            usPerFrame = le32(body)
            total = le32(body + 16).toInt
            w = le32(body + 32).toInt
            h = le32(body + 36).toInt
          case "strh" =>
            // only STREAM 0 may satisfy the MJPG-video requirement —
            // the frame collector below takes 00dc/00db chunks only
            if (n >= 8 && streamIdx == 0 && fourcc(body) == "vids" &&
                fourcc(body + 4) == "MJPG")
              mjpg = true
          case c if (c.endsWith("dc") || c.endsWith("db")) &&
              c.startsWith("00") =>
            // only stream 0's chunks: the strh check above binds the MJPG
            // video stream to stream 0, so a multi-stream AVI (01dc, …)
            // must not interleave foreign frames into the list
            frames += bytes.slice(body, body + n)
          case _ => () // strf, idx1, JUNK, …
        }
        i = body + n + (n % 2) // RIFF word alignment
      }
      true
    }
    if (!walk(12, 8 + riffLen.toInt)) return None
    val fs = frames.result()
    if (w <= 0 || h <= 0 || total < 0 || !mjpg || fs.size != total) None
    else Some(AviVideo(w, h, usPerFrame, total, fs))
  }

  private def writeLe32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }
  private def writeLe16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }
}
