package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** MP3 frame census: framing arithmetic, ID3 wrappers, and the
  * honest-rejection fuzz law. */
class Mp3FramesSpec extends AnyFunSuite {

  test("census counts frames, bitrates, padding, tags exactly") {
    val frames = (0 until 40).map(f => (f % 14 + 1, f % 3 == 0))
    val id3 = ("artist=graft;" * 10).getBytes("US-ASCII")
    val mp3 = Mp3Frames.encode(frames, 1, id3, id3v1 = true)
    val c = Mp3Frames.census(mp3).get
    assert(c.nFrames == 40 && c.sampleRate == 48000 && c.hasId3v1)
    assert(c.id3v2Bytes == 10 + id3.length)
    assert(c.paddedFrames == frames.count(_._2))
    assert(c.bitrateSumKbps ==
      frames.map(f => Mp3Frames.Bitrates(f._1).toLong).sum)
    assert(c.totalFrameBytes == frames.map { case (b, p) =>
      Mp3Frames.frameLength(Mp3Frames.Bitrates(b), 48000, p).toLong }.sum)
    assert(mp3.length == 10 + id3.length + c.totalFrameBytes + 128)
    // bare stream without tags
    val bare = Mp3Frames.encode(frames.take(5), 0, Array.emptyByteArray,
      id3v1 = false)
    val c2 = Mp3Frames.census(bare).get
    assert(c2.nFrames == 5 && c2.sampleRate == 44100 && !c2.hasId3v1 &&
      c2.id3v2Bytes == 0)
  }

  test("framing violations reject honestly") {
    val mp3 = Mp3Frames.encode(Seq((5, false), (9, true)), 2,
      Array.emptyByteArray, id3v1 = false)
    assert(Mp3Frames.census(Array.emptyByteArray).isEmpty)
    assert(Mp3Frames.census(mp3.take(mp3.length - 1)).isEmpty)
    assert(Mp3Frames.census(mp3 ++ Array[Byte](0)).isEmpty) // lost sync
    val badSync = mp3.clone(); badSync(0) = 0x7F
    assert(Mp3Frames.census(badSync).isEmpty)
    val freeFmt = mp3.clone(); freeFmt(2) = (freeFmt(2) & 0x0F).toByte
    assert(Mp3Frames.census(freeFmt).isEmpty)
    val badRate = mp3.clone()
    badRate(2) = ((badRate(2) & ~0x0C) | 0x0C).toByte
    assert(Mp3Frames.census(badRate).isEmpty)
  }

  test("bit-flip fuzz never crashes") {
    val mp3 = Mp3Frames.encode((0 until 12).map(f => (f % 14 + 1, false)),
      1, "meta".getBytes, id3v1 = true)
    var seed = 91L
    for (_ <- 1 to 400) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = mp3.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      Mp3Frames.census(m) // must not throw
    }
  }
}
