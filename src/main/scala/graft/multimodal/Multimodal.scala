package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side plumbing — schema, partition-parallel batch iteration,
  * row shapes — is real; the actual media DECODE IS A STUB (this container
  * has no image/audio codecs): `decodeStub` derives a deterministic
  * pseudo-feature vector from the md5 of the payload. Swap `decodeStub`
  * for a real codec (e.g. JNI/ONNX) without touching the plumbing.
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
