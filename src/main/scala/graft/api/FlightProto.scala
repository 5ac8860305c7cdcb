package graft.api

import java.nio.{ByteBuffer, ByteOrder}

import graft.sources.Pb

/** Hand-rolled codec for the Arrow Flight protocol messages this server
  * speaks (public `flight.proto`, arrow.apache.org — the same wire
  * format `src/querier/src/flight.rs` serves in the reference) plus the
  * Arrow IPC encapsulation split/join a Flight stream requires.
  *
  * Flight does NOT put the framed IPC stream on the wire as one blob:
  * each IPC message travels as one `FlightData` protobuf whose
  * `data_header` is the bare flatbuffer `Message` bytes and whose
  * `data_body` is the message body — the 8-byte continuation/length
  * encapsulation exists only inside files and plain IPC streams. So the
  * server splits the stream the repo already produces
  * ([[ArrowResult.ipcStream]]) into (header, body) pairs, and a client
  * re-joins them to feed any standard IPC reader.
  */
object FlightProto {

  // ---- protobuf wire reading (same public format PbWriter encodes) ----

  /** minimal protobuf walker: callback per (field, wire); length-
    * delimited payloads handed as slices. */
  private[api] def walk(bytes: Array[Byte], from: Int, until: Int)(
      f: (Int, Int, Long, Array[Byte]) => Unit): Unit = {
    var i = from
    def varint(): Long = {
      var v = 0L; var s = 0
      var b = 0
      do {
        if (i >= until) throw new IllegalArgumentException("truncated varint")
        b = bytes(i) & 0xFF; i += 1
        v |= (b & 0x7FL) << s; s += 7
      } while ((b & 0x80) != 0)
      v
    }
    while (i < until) {
      val key = varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      wire match {
        case 0 => f(field, 0, varint(), null)
        case 1 =>
          if (i + 8 > until) throw new IllegalArgumentException("truncated fixed64")
          var v = 0L; var k = 0
          while (k < 8) { v |= (bytes(i + k) & 0xFFL) << (8 * k); k += 1 }
          i += 8; f(field, 1, v, null)
        case 2 =>
          val len = varint().toInt
          if (len < 0 || i + len > until)
            throw new IllegalArgumentException("truncated bytes field")
          val s = java.util.Arrays.copyOfRange(bytes, i, i + len)
          i += len; f(field, 2, len, s)
        case 5 =>
          if (i + 4 > until) throw new IllegalArgumentException("truncated fixed32")
          var v = 0L; var k = 0
          while (k < 4) { v |= (bytes(i + k) & 0xFFL) << (8 * k); k += 1 }
          i += 4; f(field, 5, v, null)
        case w => throw new IllegalArgumentException(s"unsupported wire type $w")
      }
    }
  }

  // ---- Flight messages ----

  /** Ticket { bytes ticket = 1; } */
  def decodeTicket(b: Array[Byte]): String = {
    var t = ""
    walk(b, 0, b.length) { (f, w, _, s) =>
      if (f == 1 && w == 2) t = new String(s, "UTF-8")
    }
    t
  }

  def encodeTicket(t: String): Array[Byte] =
    new Pb().str(1, t).result

  /** FlightDescriptor { type = 1 (0 unknown, 1 PATH, 2 CMD);
    * repeated string path = 2; bytes cmd = 3; } */
  final case class Descriptor(dtype: Int, path: Seq[String], cmd: String)

  def decodeDescriptor(b: Array[Byte]): Descriptor = {
    var t = 0; val p = Seq.newBuilder[String]; var c = ""
    walk(b, 0, b.length) { (f, w, v, s) =>
      (f, w) match {
        case (1, 0) => t = v.toInt
        case (2, 2) => p += new String(s, "UTF-8")
        case (3, 2) => c = new String(s, "UTF-8")
        case _ =>
      }
    }
    Descriptor(t, p.result(), c)
  }

  def encodeDescriptor(d: Descriptor): Array[Byte] = {
    val pb = new Pb()
    if (d.dtype != 0) pb.vint(1, d.dtype)
    d.path.foreach(pb.str(2, _))
    if (d.cmd.nonEmpty) pb.str(3, d.cmd)
    pb.result
  }

  /** FlightData { FlightDescriptor flight_descriptor = 1;
    * bytes data_header = 2; bytes app_metadata = 3;
    * bytes data_body = 1000; } */
  final case class Data(descriptor: Option[Descriptor],
      header: Array[Byte], body: Array[Byte])

  def encodeData(d: Data): Array[Byte] = {
    val pb = new Pb()
    d.descriptor.foreach(x => pb.bytes(1, encodeDescriptor(x)))
    if (d.header.nonEmpty) pb.bytes(2, d.header)
    if (d.body.nonEmpty) pb.bytes(1000, d.body)
    pb.result
  }

  def decodeData(b: Array[Byte]): Data = {
    var desc: Option[Descriptor] = None
    var hdr = Array.emptyByteArray; var body = Array.emptyByteArray
    walk(b, 0, b.length) { (f, w, _, s) =>
      (f, w) match {
        case (1, 2) => desc = Some(decodeDescriptor(s))
        case (2, 2) => hdr = s
        case (1000, 2) => body = s
        case _ =>
      }
    }
    Data(desc, hdr, body)
  }

  /** FlightInfo { bytes schema = 1; FlightDescriptor = 2;
    * repeated FlightEndpoint endpoint = 3; int64 total_records = 4;
    * int64 total_bytes = 5; }
    * FlightEndpoint { Ticket ticket = 1; repeated Location location = 2; }
    * An EMPTY location list means "fetch from the service that returned
    * the info" (flight.proto), which is exactly this single server. */
  final case class Info(schema: Array[Byte], descriptor: Descriptor,
      tickets: Seq[String], totalRecords: Long = -1L, totalBytes: Long = -1L)

  def encodeInfo(i: Info): Array[Byte] = {
    val pb = new Pb()
    if (i.schema.nonEmpty) pb.bytes(1, i.schema)
    pb.bytes(2, encodeDescriptor(i.descriptor))
    i.tickets.foreach(t =>
      pb.msg(3)(ep => ep.bytes(1, encodeTicket(t))))
    // total_records/total_bytes are int64 (varint zig-zag-free); -1 =
    // unknown per flight.proto — encoded as the 10-byte two's-complement
    // varint like any negative int64
    pb.vint(4, i.totalRecords)
    pb.vint(5, i.totalBytes)
    pb.result
  }

  def decodeInfo(b: Array[Byte]): Info = {
    var schema = Array.emptyByteArray
    var desc = Descriptor(0, Nil, "")
    val ts = Seq.newBuilder[String]
    var tr = -1L; var tb = -1L
    walk(b, 0, b.length) { (f, w, v, s) =>
      (f, w) match {
        case (1, 2) => schema = s
        case (2, 2) => desc = decodeDescriptor(s)
        case (3, 2) =>
          walk(s, 0, s.length) { (f2, w2, _, s2) =>
            if (f2 == 1 && w2 == 2) ts += decodeTicket(s2)
          }
        case (4, 0) => tr = v
        case (5, 0) => tb = v
        case _ =>
      }
    }
    Info(schema, desc, ts.result(), tr, tb)
  }

  /** SchemaResult { bytes schema = 1; } — same shape as Ticket. */
  def encodeSchemaResult(schema: Array[Byte]): Array[Byte] =
    new Pb().bytes(1, schema).result

  def decodeSchemaResult(b: Array[Byte]): Array[Byte] = {
    var out = Array.emptyByteArray
    walk(b, 0, b.length) { (f, w, _, s) => if (f == 1 && w == 2) out = s }
    out
  }

  /** HandshakeRequest/Response { uint64 protocol_version = 1;
    * bytes payload = 2; } */
  def decodeHandshake(b: Array[Byte]): (Long, Array[Byte]) = {
    var ver = 0L; var payload = Array.emptyByteArray
    walk(b, 0, b.length) { (f, w, v, s) =>
      (f, w) match {
        case (1, 0) => ver = v
        case (2, 2) => payload = s
        case _ =>
      }
    }
    (ver, payload)
  }

  def encodeHandshake(ver: Long, payload: Array[Byte]): Array[Byte] = {
    val pb = new Pb()
    if (ver != 0) pb.vint(1, ver)
    if (payload.nonEmpty) pb.bytes(2, payload)
    pb.result
  }

  // ---- Arrow IPC encapsulation split / join ----

  /** one encapsulated IPC message: the bare flatbuffer `Message` bytes
    * (including its trailing 8-byte-alignment padding — harmless to
    * flatbuffer readers, required to reproduce the stream byte-exactly)
    * and the message body. */
  final case class IpcMessage(header: Array[Byte], body: Array[Byte])

  /** split a standard Arrow IPC STREAM (continuation-marker framing, as
    * [[ArrowResult.ipcStream]] writes) into its messages. The body
    * length comes from the flatbuffer `Message.bodyLength` field
    * (already 8-byte aligned by the writer), read via the Arrow format
    * classes on the Spark classpath. */
  def splitIpcStream(bytes: Array[Byte]): Seq[IpcMessage] = {
    val out = Seq.newBuilder[IpcMessage]
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() >= 8) {
      val cont = bb.getInt()
      if (cont != -1)
        throw new IllegalArgumentException(
          "not a continuation-framed IPC stream (legacy framing?)")
      val metaLen = bb.getInt()
      if (metaLen == 0) return out.result() // end-of-stream marker
      val meta = new Array[Byte](metaLen)
      bb.get(meta)
      val fb = org.apache.arrow.flatbuf.Message.getRootAsMessage(
        ByteBuffer.wrap(meta).order(ByteOrder.LITTLE_ENDIAN))
      val bodyLen = fb.bodyLength().toInt
      val body =
        if (bodyLen == 0) Array.emptyByteArray
        else { val b = new Array[Byte](bodyLen); bb.get(b); b }
      out += IpcMessage(meta, body)
    }
    out.result()
  }

  /** re-join messages into a standard IPC stream (what a Flight client
    * does to feed pyarrow/arrow-rs/an `ArrowStreamReader`). */
  def joinIpcStream(msgs: Seq[IpcMessage]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    msgs.foreach { m =>
      i32(-1); i32(m.header.length)
      out.write(m.header); out.write(m.body)
    }
    i32(-1); i32(0) // end-of-stream
    out.toByteArray
  }
}
