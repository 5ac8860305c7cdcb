package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ingest-path wire fuzz: the OTLP / remote_write / pprof decoders
  * parse UNTRUSTED POST bodies. Feed each one random bytes, mutations
  * of valid payloads, and every truncation prefix — a decode may
  * return rows or throw its documented malformed-payload error
  * (IllegalArgumentException from Reader.fail, snappy/gzip transport
  * IOExceptions), but never a crash class (ArrayIndexOutOfBounds, NPE,
  * NegativeArraySize, StackOverflow) and never an unbounded
  * allocation: crafted length fields are the classic parser CVE shape. */
class WireFuzzSpec extends AnyFunSuite {

  // minimal protobuf writer (the OtlpSpec/HttpShellSpec idiom)
  private class Pb {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Pb = {
      var x = v
      while ((x & ~0x7FL) != 0) { out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    def tag(f: Int, w: Int): Pb = varint((f << 3) | w)
    def fixed64(f: Int, v: Long): Pb = {
      tag(f, 1); (0 until 8).foreach(i => out.write(((v >>> (8 * i)) & 0xFF).toInt)); this
    }
    def bytes(f: Int, b: Array[Byte]): Pb = { tag(f, 2); varint(b.length); out.write(b); this }
    def str(f: Int, s: String): Pb = bytes(f, s.getBytes("UTF-8"))
    def msg(f: Int)(fn: Pb => Unit): Pb = { val p = new Pb; fn(p); bytes(f, p.out.toByteArray) }
    def result: Array[Byte] = out.toByteArray
  }

  private def logsPayload(n: Int): Array[Byte] = {
    val req = new Pb
    req.msg(1) { rl =>
      rl.msg(1)(_.msg(1) { kv => kv.str(1, "service.name"); kv.msg(2)(_.str(1, "svc")) })
      rl.msg(2) { sl =>
        for (i <- 0 until n) sl.msg(2) { lr =>
          lr.fixed64(1, 1700000000000000000L + i)
          lr.str(3, "info")
          lr.msg(5)(_.str(1, s"line $i"))
        }
      }
    }
    req.result
  }

  private def probe(what: String, bytes: Array[Byte])(dec: Array[Byte] => Any): Unit =
    try { dec(bytes); () }
    catch {
      case _: IllegalArgumentException => () // Reader.fail — the contract
      case _: java.io.IOException => ()      // transport (snappy/gzip)
      case e: Throwable =>
        fail(s"$what: decoder threw ${e.getClass.getName}: ${e.getMessage} " +
          s"(len=${bytes.length})")
    }

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "otlp-logs" -> (Otlp.decodeLogsRequest(_)),
    "otlp-traces" -> (Otlp.decodeTracesRequest(_)),
    "otlp-metrics" -> (Otlp.decodeMetricsRequest(_)),
    "otlp-profiles" -> (Otlp.decodeProfilesRequest(_)),
    "remote-write-v1" -> (PromRemoteWrite.decodeWriteRequest(_)),
    "remote-write-v2" -> (PromRemoteWrite.decodeWriteRequestV2(_)),
    "pprof" -> (Pprof.decode(_, "svc")))

  test("random byte blobs never escape as crash classes") {
    val rnd = new scala.util.Random(3L)
    for (i <- 0 until 400; (what, dec) <- decoders) {
      val blob = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      probe(s"$what-garbage#$i", blob)(dec)
    }
  }

  test("every truncation and 1200 mutations of a valid OTLP logs payload hold the contract") {
    val rnd = new scala.util.Random(5L)
    val valid = logsPayload(4)
    assert(Otlp.decodeLogsRequest(valid).size == 4) // the fixture is real
    for (len <- 0 until valid.length; (what, dec) <- decoders)
      probe(s"$what-trunc@$len", valid.take(len))(dec)
    for (i <- 0 until 1200) {
      val b = valid.clone()
      for (_ <- 0 to rnd.nextInt(3))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val (what, dec) = decoders(i % decoders.length)
      probe(s"$what-mut#$i", b)(dec)
    }
  }

  test("remote_write mutations: valid snappy frame, corrupted protobuf inside") {
    val rnd = new scala.util.Random(9L)
    val valid = PromRemoteWrite.encodeWriteRequest(Seq(
      (Map("__name__" -> "m", "job" -> "j"), Seq((1L, 1.0), (2L, 2.5)))))
    assert(PromRemoteWrite.decodeWriteRequest(valid).nonEmpty)
    val validV2 = PromRemoteWrite.encodeWriteRequestV2(Seq(
      (Map("__name__" -> "m", "job" -> "j"), Seq((1L, 1.0)))))
    assert(PromRemoteWrite.decodeWriteRequestV2(validV2).nonEmpty)
    // corrupt the UNCOMPRESSED protobuf, recompress — exercises the
    // walk itself rather than the snappy checksum
    val raw = org.xerial.snappy.Snappy.uncompress(valid)
    for (i <- 0 until 400) {
      val b = raw.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val rec = org.xerial.snappy.Snappy.compress(b)
      probe(s"rw1-inner#$i", rec)(PromRemoteWrite.decodeWriteRequest(_))
    }
    val rawV2 = org.xerial.snappy.Snappy.uncompress(validV2)
    for (i <- 0 until 400) {
      val b = rawV2.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val rec = org.xerial.snappy.Snappy.compress(b)
      probe(s"rw2-inner#$i", rec)(PromRemoteWrite.decodeWriteRequestV2(_))
    }
  }
}
