package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side plumbing — schema, partition-parallel batch iteration,
  * row shapes — is real. Container HEADERS (PNG/JPEG/GIF dims, WAV fmt,
  * MP4 boxes) and WAV 16-bit PCM SAMPLES (`wavPcm`) are genuinely
  * decoded from raw bytes, no codec libraries. Image pixel and video
  * frame decode remain A STUB (this container has no JPEG/H.264
  * codecs): `decodeStub` derives a deterministic pseudo-feature vector
  * from the md5 of the payload. Swap `decodeStub` for a real codec
  * (e.g. JNI/ONNX) without touching the plumbing.
  */
object Multimodal {

  /** media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),     // image | audio | video
    StructField("bytes", BinaryType),    // opaque payload
    StructField("meta", MapType(StringType, StringType))))

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: Map[String, String])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      f0: Double, f1: Double, f2: Double, f3: Double,
      f4: Double, f5: Double, f6: Double, f7: Double)

  /** ======= STUB ======= deterministic fake decode: 8 features from the
    * first 8 md5 hex nibbles of the payload, each nibble/15.0. A real
    * implementation would decode pixels/samples here. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    (0 until 8).map(i =>
      Character.digit(hex.charAt(i), 16).toDouble / 15.0).toArray
  }

  /** partition-parallel feature extraction — the mapPartitions shape a
    * Pandas-UDF/mapInPandas pipeline would use, one batch per partition. */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val f = decodeStub(r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
          f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }
    }
  }

  /** ======= REAL ======= container-header decode, no codec libraries:
    * image dimensions parsed from the actual byte layout —
    * PNG IHDR (BE32 width/height at offsets 16/20 after the 8-byte
    * signature + chunk header), JPEG via a marker walk to the first SOF
    * (BE16 height at +5, width at +7, skipping APPn/COM segments by
    * their BE16 lengths), GIF logical screen descriptor (LE16 at 6/8).
    * Unknown/truncated payloads → None, never a guess. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    val pngSig = Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length >= 24 && (0 until 8).forall(i => u8(i) == pngSig(i)))
      Some((be32(16), be32(20)))
    else if (bytes.length >= 10 && u8(0) == 'G' && u8(1) == 'I' &&
        u8(2) == 'F' && u8(3) == '8')
      Some((le16(6), le16(8)))
    else if (bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 9 <= bytes.length) {
        if (u8(i) != 0xFF) return None
        val marker = u8(i + 1)
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) i += 2
        else {
          val isSof = (marker >= 0xC0 && marker <= 0xCF) &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) return Some((be16(i + 7), be16(i + 5)))
          i += 2 + be16(i + 2)
        }
      }
      None
    } else None
  }

  /** structurally valid minimal image headers for the three containers —
    * the FIXTURE generator (payload bodies are synthetic; the headers
    * follow the real byte layout, so imageDims exercises the genuine
    * parse paths). */
  def syntheticImage(format: String, w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    format match {
      case "png" =>
        Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
          be32(13) ++ "IHDR".getBytes("ASCII") ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 2, 0, 0, 0)
      case "jpeg" =>
        // SOI, APP0 (JFIF), then SOF0 — the APP0 forces the marker walk
        Array(0xFF, 0xD8).map(_.toByte) ++
          Array(0xFF, 0xE0).map(_.toByte) ++ be16(16) ++
          "JFIF".getBytes("ASCII") ++ Array.fill[Byte](10)(0) ++
          Array(0xFF, 0xC0).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
          be16(h) ++ be16(w) ++ Array[Byte](3, 0)
      case "gif" =>
        "GIF89a".getBytes("ASCII") ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }
  }

  /** WAV metadata from the RIFF chunk walk (no codec libs): find the
    * `fmt ` chunk, read channels (LE16 at data+2) and sample rate (LE32
    * at data+4). None for non-RIFF/truncated payloads. */
  def wavMeta(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int) = new String(bytes.slice(i, i + 4), "ASCII")
    if (bytes.length < 20 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val size = le32(i + 4)
      if (id == "fmt " && i + 8 + 8 <= bytes.length)
        return Some((le32(i + 8 + 4), le16(i + 8 + 2))) // (sampleRate, channels)
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** MP4/ISO-BMFF metadata from the box walk: moov → mvhd (version 0:
    * BE32 timescale at +12, BE32 duration at +16 of the box payload). */
  def mp4Meta(bytes: Array[Byte]): Option[(Int, Long)] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def tag(i: Int) = new String(bytes.slice(i + 4, i + 8), "ASCII")
    def walk(from: Int, to: Int): Option[(Int, Long)] = {
      var i = from
      while (i + 8 <= to) {
        val size = be32(i)
        if (size < 8 || i + size > to) return None
        tag(i) match {
          case "moov" =>
            val r = walk(i + 8, i + size)
            if (r.isDefined) return r
          case "mvhd" if size >= 8 + 20 && u8(i + 8) == 0 => // version 0
            return Some((be32(i + 8 + 12), be32(i + 8 + 16).toLong & 0xFFFFFFFFL))
          case _ => ()
        }
        i += size
      }
      None
    }
    if (bytes.length < 8) None else walk(0, bytes.length)
  }

  /** decoded 16-bit PCM stats — exact integers end to end. */
  final case class WavPcm(sampleRate: Int, channels: Int, nSamples: Long,
      peak: Long, sumAbs: Long, sumSq: Long)

  /** ======= REAL ======= WAV 16-bit PCM SAMPLE decode, zero codec deps:
    * the RIFF chunk walk locates `fmt ` (must declare audio format 1 =
    * linear PCM, 16 bits/sample) and `data`; the data chunk's LE16
    * signed samples fold to exact integer statistics (count, peak =
    * max |s|, Σ|s|, Σs²) — the feature columns an audio-quality or
    * silence-detection pipeline filters on. Non-PCM/truncated payloads
    * → None, never a guess. (Image pixels and video frames remain
    * honestly stubbed — no JPEG/H.264 entropy decoding without codec
    * libraries; PCM needs none.) */
  def wavPcm(bytes: Array[Byte]): Option[WavPcm] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int) = new String(bytes.slice(i, i + 4), "ASCII")
    if (bytes.length < 20 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, rate)
    var bits = 0
    var data: Option[(Int, Int)] = None // (offset, size)
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val size = le32(i + 4)
      if (id == "fmt " && i + 8 + 16 <= bytes.length) {
        fmt = Some((le16(i + 8), le16(i + 8 + 2), le32(i + 8 + 4)))
        bits = le16(i + 8 + 14)
      } else if (id == "data") {
        data = Some((i + 8, math.min(size, bytes.length - i - 8)))
      }
      i += 8 + size + (size & 1)
    }
    (fmt, data) match {
      case (Some((1, ch, rate)), Some((off, sz))) if bits == 16 =>
        var n = 0L; var peak = 0L; var sAbs = 0L; var sSq = 0L
        var j = off
        while (j + 2 <= off + sz) {
          val s = le16(j).toShort.toLong // sign-extend
          val a = math.abs(s)
          n += 1; if (a > peak) peak = a; sAbs += a; sSq += s * s
          j += 2
        }
        Some(WavPcm(rate, ch, n, peak, sAbs, sSq))
      case _ => None
    }
  }

  /** structurally valid WAV fixture WITH a PCM data chunk. */
  def syntheticWavPcm(sampleRate: Int, channels: Int,
      samples: Seq[Int]): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val data = samples.toArray.flatMap(le16)
    "RIFF".getBytes("ASCII") ++ le32(36 + data.length) ++ "WAVE".getBytes("ASCII") ++
      "fmt ".getBytes("ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16) ++
      "data".getBytes("ASCII") ++ le32(data.length) ++ data
  }

  /** structurally valid WAV header fixture. */
  def syntheticWav(sampleRate: Int, channels: Int): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    "RIFF".getBytes("ASCII") ++ le32(36) ++ "WAVE".getBytes("ASCII") ++
      "fmt ".getBytes("ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels * 2) ++ le16((channels * 2)) ++ le16(16) ++
      "data".getBytes("ASCII") ++ le32(0)
  }

  /** structurally valid minimal MP4 fixture (ftyp + moov/mvhd v0). */
  def syntheticMp4(timescale: Int, durationUnits: Long): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val ftyp = be32(16) ++ "ftyp".getBytes("ASCII") ++
      "isom".getBytes("ASCII") ++ be32(512)
    val mvhdPayload = Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(durationUnits.toInt) ++ Array.fill[Byte](80)(0)
    val mvhd = be32(8 + mvhdPayload.length) ++ "mvhd".getBytes("ASCII") ++ mvhdPayload
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes("ASCII") ++ mvhd
    ftyp ++ moov
  }

  /** "resize"/"frame-sample" stub: keep every strideth 16-byte block —
    * real plumbing (binary slicing is genuine), fake media semantics. */
  def frameSample(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("sampled",
      expr(s"""aggregate(
         sequence(0, CAST(ceil(length(bytes) / 16.0) AS INT) - 1),
         CAST(array() AS ARRAY<BINARY>),
         (acc, i) -> IF(i % $stride = 0,
                        array_append(acc, substring(bytes, i * 16 + 1, 16)),
                        acc))"""))
      .withColumn("n_frames", size(col("sampled")))
}
