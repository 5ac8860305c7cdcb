package graft.sources

/** Zstandard FRAME framing (RFC 8878) — the compression wrapper real
  * 100 TB corpora actually ship in (Common Crawl's WET/WAT `.zst`
  * drops, HuggingFace `.jsonl.zst` shards). The entropy payload is
  * decoded by the zstd library on the Spark classpath (zstd-jni backs
  * parquet's zstd codec); THIS walker owns the container layer the
  * library API hides: frame magics, header descriptor flags, declared
  * content sizes, skippable metadata frames and block framing — the
  * fields an ingest planner needs (how many records, how big decoded,
  * where frames split for parallel decode) WITHOUT decompressing.
  *
  * Layout walked (RFC 8878 §3): magic 0xFD2FB528 LE; frame-header
  * descriptor byte (bits 7-6 content-size-field size, 5 single-segment,
  * 4 unused, 3 reserved = must-be-0, 2 content-checksum, 1-0 dict-id
  * size); optional window descriptor; dict id; declared content size
  * (0/1/2/4/8 bytes, the 2-byte form offset by 256); then blocks with
  * 3-byte little-endian headers (bit 0 last, bits 2-1 type: raw / RLE /
  * compressed / reserved, rest the size — an RLE block stores ONE
  * byte); then a 4-byte xxhash64 low-word if the checksum flag is set.
  * Skippable frames: magic 0x184D2A5x LE + 4-byte size.
  *
  * Strictness contract (DecoderFuzzSpec law, as [[Warc]]/[[Tar]]/
  * [[ZipArc]]): unknown magic, a set reserved bit, a reserved block
  * type, or any truncation rejects the whole stream with None.
  */
object ZstdFrame {

  /** one frame of a stream: skippable frames carry their payload size,
    * data frames their header facts + block census. `contentSize` is
    * the DECLARED decoded size (-1 when the header omits it). */
  final case class Frame(skippable: Boolean, contentSize: Long,
      nBlocks: Int, hasChecksum: Boolean, dictId: Long, frameBytes: Int)

  val MaxFrames = 1 << 20
  val MaxBlocksPerFrame = 1 << 20

  private def rd32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
    ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  def parse(bytes: Array[Byte]): Option[Vector[Frame]] = {
    try parseImpl(bytes)
    catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def parseImpl(bytes: Array[Byte]): Option[Vector[Frame]] = {
    if (bytes.isEmpty) return None
    val out = Vector.newBuilder[Frame]
    var i = 0
    var count = 0
    while (i < bytes.length) {
      count += 1
      if (count > MaxFrames) return None
      if (i + 4 > bytes.length) return None
      val magic = rd32(bytes, i)
      if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) {
        // ---- skippable frame ----
        if (i + 8 > bytes.length) return None
        val sz = rd32(bytes, i + 4)
        if (i + 8 + sz > bytes.length) return None
        out += Frame(skippable = true, contentSize = sz, nBlocks = 0,
          hasChecksum = false, dictId = 0, frameBytes = (8 + sz).toInt)
        i += (8 + sz).toInt
      } else if (magic == 0xFD2FB528L) {
        // ---- zstd frame header ----
        val start = i
        i += 4
        if (i >= bytes.length) return None
        val fhd = bytes(i) & 0xFF; i += 1
        if ((fhd & 0x08) != 0) return None // reserved bit
        val fcsFlag = fhd >> 6
        val singleSegment = (fhd & 0x20) != 0
        val hasChecksum = (fhd & 0x04) != 0
        val didFlag = fhd & 0x03
        if (!singleSegment) {
          if (i >= bytes.length) return None
          i += 1 // window descriptor
        }
        val didLen = didFlag match {
          case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
        }
        if (i + didLen > bytes.length) return None
        var dictId = 0L
        var d = 0
        while (d < didLen) { dictId |= (bytes(i + d) & 0xFFL) << (8 * d); d += 1 }
        i += didLen
        val fcsLen = fcsFlag match {
          case 0 => if (singleSegment) 1 else 0
          case 1 => 2; case 2 => 4; case _ => 8
        }
        if (i + fcsLen > bytes.length) return None
        var contentSize = -1L
        if (fcsLen > 0) {
          contentSize = 0L
          var c = 0
          while (c < fcsLen) {
            contentSize |= (bytes(i + c) & 0xFFL) << (8 * c); c += 1
          }
          if (fcsLen == 2) contentSize += 256
          if (contentSize < 0) return None
        }
        i += fcsLen
        // ---- block walk ----
        var last = false
        var nBlocks = 0
        while (!last) {
          nBlocks += 1
          if (nBlocks > MaxBlocksPerFrame) return None
          if (i + 3 > bytes.length) return None
          val bh = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8) |
            ((bytes(i + 2) & 0xFF) << 16)
          i += 3
          last = (bh & 1) != 0
          val btype = (bh >> 1) & 3
          val bsize = bh >> 3
          val stored = btype match {
            case 0 => bsize      // raw
            case 1 => 1          // RLE: one byte, regenerated bsize times
            case 2 => bsize      // compressed
            case _ => return None // reserved
          }
          if (i + stored > bytes.length) return None
          i += stored
        }
        if (hasChecksum) {
          if (i + 4 > bytes.length) return None
          i += 4
        }
        out += Frame(skippable = false, contentSize = contentSize,
          nBlocks = nBlocks, hasChecksum = hasChecksum, dictId = dictId,
          frameBytes = i - start)
      } else return None
    }
    Some(out.result())
  }
}
