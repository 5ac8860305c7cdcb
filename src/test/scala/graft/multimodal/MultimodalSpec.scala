package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Container-header decode: real byte-layout parsing (the q277 round
  * trip proves offsets; here the edge paths — multi-segment JPEG walks,
  * truncation, garbage — which must return None, never a guess). */
class MultimodalSpec extends AnyFunSuite {

  test("round trips for all three containers") {
    for ((fmt, w, h) <- Seq(("png", 640, 480), ("jpeg", 1, 65535), ("gif", 16, 16)))
      assert(Multimodal.imageDims(Multimodal.syntheticImage(fmt, w, h))
        .contains((w, h)), s"$fmt $w x $h")
  }

  test("JPEG marker walk skips multiple APPn/COM segments before SOF") {
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    val app1 = Array(0xFF, 0xE1).map(_.toByte) ++ be16(8) ++ Array.fill[Byte](6)(1)
    val com = Array(0xFF, 0xFE).map(_.toByte) ++ be16(5) ++ Array.fill[Byte](3)(2)
    val sof2 = Array(0xFF, 0xC2).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(123) ++ be16(456) ++ Array[Byte](3, 0)
    val buf = Array(0xFF, 0xD8).map(_.toByte) ++ app1 ++ com ++ sof2
    assert(Multimodal.imageDims(buf).contains((456, 123)))
  }

  test("WAV chunk walk and MP4 box walk round trip; junk chunks skipped") {
    assert(Multimodal.wavMeta(Multimodal.syntheticWav(44100, 2))
      .contains((44100, 2)))
    // a LIST chunk before fmt must be skipped by size
    val wav = Multimodal.syntheticWav(16000, 1)
    val withList = wav.take(12) ++
      "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array.fill[Byte](4)(9) ++
      wav.drop(12)
    assert(Multimodal.wavMeta(withList).contains((16000, 1)))
    assert(Multimodal.mp4Meta(Multimodal.syntheticMp4(90000, 12345L))
      .contains((90000, 12345L)))
    assert(Multimodal.wavMeta("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(Multimodal.mp4Meta(Array[Byte](0, 0, 0, 1)).isEmpty)
  }

  test("WAV 16-bit PCM samples decode to exact integer stats") {
    // mixed signs prove the LE16 sign extension: [-3, 0, 5, -32768, 32767]
    val wav = Multimodal.syntheticWavPcm(8000, 1, Seq(-3, 0, 5, -32768, 32767))
    val p = Multimodal.wavPcm(wav).get
    assert(p.sampleRate == 8000 && p.channels == 1 && p.nSamples == 5L)
    assert(p.peak == 32768L)
    assert(p.sumAbs == 3L + 0L + 5L + 32768L + 32767L)
    assert(p.sumSq == 9L + 25L + 32768L * 32768L + 32767L * 32767L)

    // a junk chunk between fmt and data is skipped by size
    val withJunk = wav.take(36) ++
      "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array.fill[Byte](4)(7) ++
      wav.drop(36)
    assert(Multimodal.wavPcm(withJunk).get.sumSq == p.sumSq)

    // non-PCM format (IEEE float = 3) and 8-bit PCM are rejected
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(Multimodal.wavPcm(nonPcm).isEmpty)
    val eightBit = wav.clone(); eightBit(34) = 8
    assert(Multimodal.wavPcm(eightBit).isEmpty)

    // data chunk truncated mid-sample: the partial sample is not read
    val cut = wav.dropRight(1)
    assert(Multimodal.wavPcm(cut).get.nSamples == 4L)
  }

  test("garbage and truncated payloads decode to None") {
    assert(Multimodal.imageDims(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.imageDims("not an image at all".getBytes).isEmpty)
    // PNG signature but truncated before IHDR dims
    val cut = Multimodal.syntheticImage("png", 9, 9).take(17)
    assert(Multimodal.imageDims(cut).isEmpty)
    // JPEG SOI with no SOF before the buffer ends
    assert(Multimodal.imageDims(Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)).isEmpty)
  }
}
