package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The MJPEG/AVI container walk: round trip (encode → decode returns
  * the exact frame bytes and header fields), RIFF word-alignment with
  * odd-length frame chunks, rejection of truncation / wrong fourccs /
  * non-MJPG streams / frame-count mismatches, and the end-to-end law
  * that container frames decode pixel-identically to the JPEGs that
  * went in. */
class AviSpec extends AnyFunSuite {

  private def frame(id: Long, w: Int, h: Int, f: Int): Array[Byte] =
    Jpeg.encodeGray(w, h, (x, y) =>
      ((id * 29 + (x / 8) * 7 + (y / 8) * 3 + f * 19) % 256).toInt)

  test("round trip: header fields and exact frame bytes") {
    val frames = (0 until 3).map(frame(7L, 16, 8, _))
    val avi = Avi.syntheticAvi(16, 8, 40000L, frames)
    val v = Avi.aviVideo(avi).get
    assert(v.width == 16 && v.height == 8)
    assert(v.usPerFrame == 40000L && v.totalFrames == 3)
    assert(v.frames.size == 3)
    for (i <- 0 until 3) assert(v.frames(i).sameElements(frames(i)))
  }

  test("odd-length frame chunks honor RIFF word alignment") {
    // force odd payload: append a COM-free single byte is invalid JPEG,
    // so instead check alignment with raw odd-length opaque payloads
    val odd = Array.tabulate[Byte](33)(i => (i * 3).toByte)
    val even = Array.tabulate[Byte](40)(i => (i * 5).toByte)
    val avi = Avi.syntheticAvi(8, 8, 1000L, Seq(odd, even, odd))
    val v = Avi.aviVideo(avi).get
    assert(v.frames.size == 3)
    assert(v.frames(0).sameElements(odd) && v.frames(1).sameElements(even) &&
      v.frames(2).sameElements(odd))
  }

  test("rejections: truncation, wrong magic, non-MJPG, count mismatch") {
    val good = Avi.syntheticAvi(8, 8, 1000L, Seq(frame(1L, 8, 8, 0)))
    assert(Avi.aviVideo(good).isDefined)
    // truncated at every prefix boundary that cuts a declared size
    assert(Avi.aviVideo(good.take(good.length - 5)).isEmpty)
    assert(Avi.aviVideo(good.take(20)).isEmpty)
    assert(Avi.aviVideo(Array[Byte]()).isEmpty)
    // wrong outer magic
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(Avi.aviVideo(bad).isEmpty)
    // wrong form type (not 'AVI ')
    val badForm = good.clone(); badForm(8) = 'W'.toByte
    assert(Avi.aviVideo(badForm).isEmpty)
    // corrupt the MJPG handler fourcc in strh → stream no longer MJPEG
    val idx = indexOfSeq(good, "MJPG".getBytes("ASCII"))
    assert(idx > 0)
    val notMjpg = good.clone(); notMjpg(idx) = 'X'.toByte
    assert(Avi.aviVideo(notMjpg).isEmpty)
    // dwTotalFrames disagreeing with movi chunk count
    val avihIdx = indexOfSeq(good, "avih".getBytes("ASCII"))
    val mismatch = good.clone()
    mismatch(avihIdx + 8 + 16) = 9 // dwTotalFrames little-endian low byte
    assert(Avi.aviVideo(mismatch).isEmpty)
  }

  test("multi-stream AVI: foreign 01dc chunks are not mixed into the video") {
    val frames = (0 until 2).map(frame(3L, 8, 8, _))
    val good = Avi.syntheticAvi(8, 8, 1000L, frames)
    // splice a second-stream video chunk (01dc) into the movi body:
    // 8-byte header + 4-byte foreign payload, then fix the movi LIST
    // size and the outer RIFF size
    val moviIdx = indexOfSeq(good, "movi".getBytes("ASCII"))
    assert(moviIdx > 0)
    val foreign = "01dc".getBytes("ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    val insertAt = moviIdx + 4
    val spliced = good.take(insertAt) ++ foreign ++ good.drop(insertAt)
    def patchLe32(arr: Array[Byte], off: Int, delta: Int): Unit = {
      val old = (arr(off) & 0xFF) | ((arr(off + 1) & 0xFF) << 8) |
        ((arr(off + 2) & 0xFF) << 16) | ((arr(off + 3) & 0xFF) << 24)
      val v = old + delta
      arr(off) = v.toByte; arr(off + 1) = (v >>> 8).toByte
      arr(off + 2) = (v >>> 16).toByte; arr(off + 3) = (v >>> 24).toByte
    }
    patchLe32(spliced, moviIdx - 8 + 4, foreign.length) // movi LIST size
    patchLe32(spliced, 4, foreign.length)               // RIFF size
    val v = Avi.aviVideo(spliced).get
    assert(v.totalFrames == 2 && v.frames.size == 2)
    for (i <- 0 until 2) assert(v.frames(i).sameElements(frames(i)))
  }

  test("container frames decode pixel-identically to the source JPEGs") {
    val id = 11L; val w = 23; val h = 15
    val frames = (0 until 4).map(frame(id, w, h, _))
    val v = Avi.aviVideo(Avi.syntheticAvi(w, h, 40000L, frames)).get
    for (f <- 0 until 4) {
      val (dw, dh, px) = Jpeg.decodeGrayPlane(v.frames(f)).get
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) ==
          ((id * 29 + (x / 8) * 7 + (y / 8) * 3 + f * 19) % 256).toInt)
    }
  }

  private def indexOfSeq(hay: Array[Byte], needle: Array[Byte]): Int =
    hay.indices.find(i => i + needle.length <= hay.length &&
      needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
}
