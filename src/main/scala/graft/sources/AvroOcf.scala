package graft.sources

/** Avro Object Container Files (the Apache Avro 1.x spec's file
  * format) — the dataset interchange format of the Hive/Kafka era and
  * still a common corpus drop. The FRAMING and the BINARY record
  * encoding are hand-rolled here: magic `Obj\1`, the metadata map
  * (avro.schema / avro.codec), 16-byte sync markers, counted data
  * blocks (null or raw-deflate codec), zigzag-varint longs, and flat
  * records of long/string/double/boolean fields. The schema JSON rides
  * Jackson (already a repo dependency) — plumbing, not format work.
  *
  * The Avro Java library ships on the Spark classpath (the Iceberg
  * manifests use it), so AvroOcfSpec proves wire interop BOTH
  * directions against the reference implementation.
  *
  * Scope: flat record schemas over {long, string, double, boolean};
  * codecs null and deflate. Anything else — unions, nesting, other
  * codecs — rejects loudly (DecoderFuzzSpec law), as do sync-marker
  * mismatches, count/size lies, and truncation.
  */
object AvroOcf {

  val MaxRecords = 1 << 22
  val MaxBlockBytes = 64 << 20

  final case class Field(name: String, kind: String) // long|string|double|boolean
  final case class Ocf(fields: Vector[Field], codec: String,
      records: Vector[Vector[Any]])

  // ---- varints ------------------------------------------------------------

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1)

  private def putVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var x = zigzag(value)
    while ((x & ~0x7FL) != 0) { out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
  }

  private final class Rd(val b: Array[Byte], var i: Int, val end: Int) {
    def varint(): Long = {
      var u = 0L; var shift = 0
      while (true) {
        if (i >= end || shift > 63) throw Bad
        val x = b(i) & 0xFF; i += 1
        u |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return unzigzag(u)
        shift += 7
      }
      0L
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || i + n > end) throw Bad
      val out = java.util.Arrays.copyOfRange(b, i, i + n); i += n; out
    }
  }
  private object Bad extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  // ---- encoder ------------------------------------------------------------

  /** write an OCF of flat records; `codec` is "null" or "deflate". The
    * sync marker derives deterministically from the schema (fixtures
    * must be reproducible; the spec only requires consistency). */
  def encode(name: String, fields: Seq[Field], records: Seq[Seq[Any]],
      codec: String, recordsPerBlock: Int = 1000): Array[Byte] = {
    require(codec == "null" || codec == "deflate")
    require(fields.nonEmpty && recordsPerBlock > 0)
    val schema = "{\"type\":\"record\",\"name\":\"" + name +
      "\",\"fields\":[" + fields.map(f =>
        "{\"name\":\"" + f.name + "\",\"type\":\"" + f.kind + "\"}")
        .mkString(",") + "]}"
    val md = java.security.MessageDigest.getInstance("MD5")
    val sync = md.digest(("graft-ocf:" + schema).getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    // metadata map: one block of 2 entries, then the 0 terminator
    putVarint(out, 2)
    def putStr(s: String): Unit = {
      val b = s.getBytes("UTF-8"); putVarint(out, b.length.toLong); out.write(b)
    }
    putStr("avro.schema"); putStr(schema)
    putStr("avro.codec"); putStr(codec)
    putVarint(out, 0)
    out.write(sync)
    records.grouped(recordsPerBlock).foreach { group =>
      val body = new java.io.ByteArrayOutputStream()
      group.foreach { rec =>
        require(rec.length == fields.length)
        rec.zip(fields).foreach {
          case (v: Long, Field(_, "long")) => putVarint(body, v)
          case (v: String, Field(_, "string")) =>
            val b = v.getBytes("UTF-8")
            putVarint(body, b.length.toLong); body.write(b)
          case (v: Double, Field(_, "double")) =>
            val bits = java.lang.Double.doubleToLongBits(v)
            var k = 0
            while (k < 8) { body.write(((bits >>> (8 * k)) & 0xFF).toInt); k += 1 }
          case (v: Boolean, Field(_, "boolean")) =>
            body.write(if (v) 1 else 0)
          case other => throw new IllegalArgumentException(s"field $other")
        }
      }
      val payload =
        if (codec == "null") body.toByteArray
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(body.toByteArray); d.finish()
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        }
      putVarint(out, group.length.toLong)
      putVarint(out, payload.length.toLong)
      out.write(payload)
      out.write(sync)
    }
    out.toByteArray
  }

  // ---- decoder ------------------------------------------------------------

  def decode(bytes: Array[Byte]): Option[Ocf] = {
    try decodeImpl(bytes)
    catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def decodeImpl(bytes: Array[Byte]): Option[Ocf] = {
    if (bytes.length < 20 || bytes(0) != 'O' || bytes(1) != 'b' ||
        bytes(2) != 'j' || bytes(3) != 1) return None
    val rd = new Rd(bytes, 4, bytes.length)
    var schema: String = null
    var codec = "null"
    var mapCount = rd.varint()
    while (mapCount != 0) {
      val n = if (mapCount < 0) { rd.varint(); -mapCount } else mapCount
      if (n > 1024) return None
      var k = 0L
      while (k < n) {
        val key = new String(rd.bytes(rd.varint().toInt), "UTF-8")
        val value = rd.bytes(rd.varint().toInt)
        key match {
          case "avro.schema" => schema = new String(value, "UTF-8")
          case "avro.codec" => codec = new String(value, "UTF-8")
          case _ => ()
        }
        k += 1
      }
      mapCount = rd.varint()
    }
    if (schema == null) return None
    if (codec != "null" && codec != "deflate") return None
    // ---- flat-record schema (Jackson for the JSON plumbing) ----
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(schema)
      catch { case _: Exception => return None }
    if (root == null || root.path("type").asText() != "record") return None
    val fArr = root.path("fields")
    if (!fArr.isArray || fArr.size() == 0) return None
    val fields = Vector.newBuilder[Field]
    var fi = 0
    while (fi < fArr.size()) {
      val f = fArr.get(fi)
      val kind = f.path("type").asText()
      if (!Set("long", "string", "double", "boolean").contains(kind))
        return None // unions/nesting: out of scope, loudly
      fields += Field(f.path("name").asText(), kind)
      fi += 1
    }
    val fs = fields.result()
    val sync = rd.bytes(16)
    // ---- data blocks ----
    val records = Vector.newBuilder[Vector[Any]]
    var total = 0L
    while (rd.i < rd.end) {
      val count = rd.varint()
      if (count < 0 || count > MaxRecords) return None
      total += count
      if (total > MaxRecords) return None
      val size = rd.varint()
      if (size < 0 || size > MaxBlockBytes) return None
      val payload = rd.bytes(size.toInt)
      val raw =
        if (codec == "null") payload
        else {
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(payload)
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          try {
            while (!inf.finished()) {
              val got =
                try inf.inflate(buf)
                catch { case _: java.util.zip.DataFormatException =>
                  return None }
              if (got == 0 && inf.needsInput()) return None
              bos.write(buf, 0, got)
              if (bos.size() > MaxBlockBytes) return None
            }
          } finally inf.end()
          bos.toByteArray
        }
      if (!java.util.Arrays.equals(rd.bytes(16), sync)) return None
      val rr = new Rd(raw, 0, raw.length)
      var r = 0L
      while (r < count) {
        val rec = Vector.newBuilder[Any]
        fs.foreach { f =>
          f.kind match {
            case "long" => rec += rr.varint()
            case "string" =>
              rec += new String(rr.bytes(rr.varint().toInt), "UTF-8")
            case "double" =>
              val b = rr.bytes(8)
              var bits = 0L
              var k = 0
              while (k < 8) { bits |= (b(k) & 0xFFL) << (8 * k); k += 1 }
              rec += java.lang.Double.longBitsToDouble(bits)
            case _ =>
              val b = rr.bytes(1)
              if (b(0) != 0 && b(0) != 1) throw Bad
              rec += (b(0) == 1)
          }
        }
        records += rec.result()
        r += 1
      }
      if (rr.i != rr.end) return None // block size must be exact
    }
    Some(Ocf(fs, codec, records.result()))
  }
}
