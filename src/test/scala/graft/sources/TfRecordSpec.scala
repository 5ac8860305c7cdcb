package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing + tf.Example proto: known-answer CRC-32C, masked
  * CRC law, round trips for all three feature kinds, framing
  * arithmetic, and the honest-rejection fuzz law. */
class TfRecordSpec extends AnyFunSuite {

  test("CRC-32C known-answer and mask") {
    // the canonical CRC-32C check value (ASCII '123456789')
    val b = "123456789".getBytes("US-ASCII")
    assert(TfRecord.crc32c(b, 0, b.length) == 0xE3069283)
    // all-zero 32 bytes: another published Castagnoli vector
    val z = new Array[Byte](32)
    assert(TfRecord.crc32c(z, 0, 32) == 0x8A9136AA)
    // mask is the record_writer.cc rotation+offset
    assert(TfRecord.mask(0) == 0xA282EAD8.toInt)
  }

  test("record framing round trip with exact length arithmetic") {
    val out = new java.io.ByteArrayOutputStream()
    val payloads = Seq("alpha", "beta beta", "").map(_.getBytes("UTF-8"))
    payloads.foreach(TfRecord.writeRecord(out, _))
    val stream = out.toByteArray
    assert(stream.length == payloads.map(_.length + 16).sum)
    val got = TfRecord.readAll(stream).get
    assert(got.length == 3)
    got.zip(payloads).foreach { case (g, p) =>
      assert(java.util.Arrays.equals(g, p))
    }
  }

  test("tf.Example round trip: bytes, packed floats, packed int64s") {
    val ex = TfRecord.writeExample(Seq(
      "text" -> TfRecord.Feature(Vector("hello world".getBytes("UTF-8")),
        Vector.empty, Vector.empty),
      "scores" -> TfRecord.Feature(Vector.empty,
        Vector(0.25f, -1.5f, 3.75f), Vector.empty),
      "ids" -> TfRecord.Feature(Vector.empty, Vector.empty,
        Vector(7L, 300L, 1234567L))))
    val fs = TfRecord.parseExample(ex).get
    assert(fs.map(_._1) == Vector("text", "scores", "ids"))
    assert(new String(fs(0)._2.bytes.head, "UTF-8") == "hello world")
    assert(fs(1)._2.floats == Vector(0.25f, -1.5f, 3.75f))
    assert(fs(2)._2.ints == Vector(7L, 300L, 1234567L))
  }

  test("framing violations reject honestly") {
    val out = new java.io.ByteArrayOutputStream()
    TfRecord.writeRecord(out, "payload body".getBytes("UTF-8"))
    val s = out.toByteArray
    assert(TfRecord.readAll(s.take(s.length - 1)).isEmpty)  // data CRC cut
    assert(TfRecord.readAll(s.take(10)).isEmpty)            // header cut
    assert(TfRecord.readAll(s :+ 0.toByte).isEmpty)         // garbage tail
    val badLenCrc = s.clone(); badLenCrc(9) = (badLenCrc(9) ^ 1).toByte
    assert(TfRecord.readAll(badLenCrc).isEmpty)
    val badData = s.clone(); badData(14) = (badData(14) ^ 1).toByte
    assert(TfRecord.readAll(badData).isEmpty)               // data CRC catch
    assert(TfRecord.readAll(Array.emptyByteArray).get.isEmpty) // empty = 0 recs
  }

  test("bit-flip fuzz never crashes framing or proto parse") {
    val out = new java.io.ByteArrayOutputStream()
    val ex = TfRecord.writeExample(Seq(
      "t" -> TfRecord.Feature(Vector("abcdef".getBytes), Vector.empty,
        Vector.empty),
      "i" -> TfRecord.Feature(Vector.empty, Vector.empty, Vector(42L))))
    TfRecord.writeRecord(out, ex)
    val s = out.toByteArray
    var seed = 23L
    for (_ <- 1 to 300) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = s.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      TfRecord.readAll(m).foreach(_.foreach(TfRecord.parseExample))
      TfRecord.parseExample(m) // raw garbage directly at the proto layer
    }
  }
}
