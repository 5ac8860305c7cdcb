package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** RFC 8878 frame walking over REAL zstd output (zstd-jni, the library
  * behind parquet's zstd codec): declared content sizes, skippable
  * frames, frame boundaries enabling frame-parallel decode, and the
  * honest-rejection fuzz law. */
class ZstdFrameSpec extends AnyFunSuite {
  import com.github.luben.zstd.Zstd

  private def frameOf(s: String): Array[Byte] =
    Zstd.compress(s.getBytes("UTF-8"), 3)

  private def skippable(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    u32(0x184D2A50L); u32(payload.length.toLong); out.write(payload)
    out.toByteArray
  }

  test("single-shot compress declares the content size in the header") {
    val txt = "zstd framing probe " * 25
    val fs = ZstdFrame.parse(frameOf(txt)).get
    assert(fs.length == 1 && !fs.head.skippable)
    assert(fs.head.contentSize == txt.getBytes("UTF-8").length)
    assert(fs.head.nBlocks >= 1 && fs.head.dictId == 0)
  }

  test("multi-frame streams walk frame by frame, skippables included") {
    val a = "first shard " * 30; val b = "second shard " * 17
    val meta = "shard-meta: lang=en".getBytes("UTF-8")
    val stream = frameOf(a) ++ skippable(meta) ++ frameOf(b)
    val fs = ZstdFrame.parse(stream).get
    assert(fs.map(_.skippable) == Vector(false, true, false))
    assert(fs(1).contentSize == meta.length)
    assert(fs.map(_.frameBytes).sum == stream.length)
    assert(fs(0).contentSize + fs(2).contentSize ==
      (a + b).getBytes("UTF-8").length)
  }

  test("frame boundaries from the walker enable frame-parallel decode") {
    val parts = Seq("alpha " * 40, "beta " * 9, "gamma " * 77)
    val stream = parts.map(frameOf).reduce(_ ++ _)
    val fs = ZstdFrame.parse(stream).get
    var off = 0
    val decoded = fs.map { f =>
      val slice = java.util.Arrays.copyOfRange(stream, off, off + f.frameBytes)
      off += f.frameBytes
      new String(Zstd.decompress(slice, f.contentSize.toInt), "UTF-8")
    }
    assert(decoded == parts)
  }

  test("RLE and raw blocks parse (hand-built frames)") {
    // single-segment frame, 1-byte FCS, one RLE block: 64 x 'A'
    val rle = Array[Byte](0x28.toByte, 0xB5.toByte, 0x2F.toByte,
      0xFD.toByte, 0x20, 64,
      (64 << 3 | 1 << 1 | 1).toByte, ((64 << 3) >> 8).toByte, 0, 'A')
    val fs = ZstdFrame.parse(rle).get
    assert(fs.head.contentSize == 64 && fs.head.nBlocks == 1)
    assert(new String(Zstd.decompress(rle, 64), "UTF-8") == "A" * 64)
    // raw block: 5 literal bytes
    val raw = Array[Byte](0x28.toByte, 0xB5.toByte, 0x2F.toByte,
      0xFD.toByte, 0x20, 5,
      (5 << 3 | 0 << 1 | 1).toByte, 0, 0, 'h', 'e', 'l', 'l', 'o')
    val fs2 = ZstdFrame.parse(raw).get
    assert(fs2.head.contentSize == 5)
    assert(new String(Zstd.decompress(raw, 5), "UTF-8") == "hello")
  }

  test("framing violations reject honestly") {
    val f = frameOf("reject me " * 20)
    assert(ZstdFrame.parse(Array.emptyByteArray).isEmpty)
    assert(ZstdFrame.parse(f.take(3)).isEmpty)
    assert(ZstdFrame.parse(f.take(f.length - 1)).isEmpty) // truncated block
    assert(ZstdFrame.parse(f ++ Array[Byte](1, 2, 3)).isEmpty) // garbage tail
    val badMagic = f.clone(); badMagic(0) = 0x29
    assert(ZstdFrame.parse(badMagic).isEmpty)
    val reserved = f.clone(); reserved(4) = (reserved(4) | 0x08).toByte
    assert(ZstdFrame.parse(reserved).isEmpty) // reserved FHD bit
  }

  test("bit-flip fuzz never crashes the walker") {
    val stream = frameOf("fuzz " * 50) ++ skippable("m".getBytes) ++
      frameOf("tail " * 11)
    var seed = 17L
    for (_ <- 1 to 300) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = stream.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      ZstdFrame.parse(m) // must not throw
    }
  }
}
