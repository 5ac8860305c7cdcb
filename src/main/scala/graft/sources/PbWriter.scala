package graft.sources

import java.io.ByteArrayOutputStream

/** Minimal protobuf writer (public wire format) shared by the OTLP/pprof
  * test suites and the deterministic pprof oracle fixture: requests are
  * hand-encoded against the public wire format, so decode tests prove the
  * reader against independently-constructed bytes. */
private[graft] final class Pb {
  val out = new ByteArrayOutputStream()
  def varint(v: Long): Pb = {
    var x = v
    while ((x & ~0x7FL) != 0) { out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt); this
  }
  def tag(field: Int, wire: Int): Pb = varint((field << 3) | wire)
  def fixed64(field: Int, v: Long): Pb = {
    tag(field, 1)
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
    this
  }
  def double(field: Int, v: Double): Pb =
    fixed64(field, java.lang.Double.doubleToLongBits(v))
  def fixed32(field: Int, v: Int): Pb = {
    tag(field, 5)
    var i = 0
    while (i < 4) { out.write((v >>> (8 * i)) & 0xFF); i += 1 }
    this
  }
  def vint(field: Int, v: Long): Pb = { tag(field, 0); varint(v) }
  def bytes(field: Int, b: Array[Byte]): Pb = {
    tag(field, 2); varint(b.length); out.write(b); this
  }
  def str(field: Int, s: String): Pb = bytes(field, s.getBytes("UTF-8"))
  def msg(field: Int)(f: Pb => Unit): Pb = {
    val inner = new Pb; f(inner); bytes(field, inner.out.toByteArray)
  }
  def result: Array[Byte] = out.toByteArray
}

private[graft] object Pb {
  def strVal(p: Pb, field: Int, s: String): Unit =
    p.msg(field)(_.str(1, s)) // AnyValue{string_value=1}

  def kv(p: Pb, field: Int, k: String, v: String): Unit =
    p.msg(field) { x => x.str(1, k); strVal(x, 2, v) }
}
