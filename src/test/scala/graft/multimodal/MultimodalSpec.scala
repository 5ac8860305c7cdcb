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
