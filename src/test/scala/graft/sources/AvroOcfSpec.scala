package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Avro OCF: round trips (both codecs, multi-block), wire interop BOTH
  * directions against the Avro Java reference implementation on the
  * classpath, and the honest-rejection fuzz law. */
class AvroOcfSpec extends AnyFunSuite {

  private val fields = Seq(AvroOcf.Field("id", "long"),
    AvroOcf.Field("title", "string"), AvroOcf.Field("score", "double"),
    AvroOcf.Field("kept", "boolean"))
  private def recs(n: Int): Seq[Seq[Any]] =
    (0 until n).map(i => Seq((i * 7L - 3), s"doc $i é", i * 0.25,
      i % 3 == 0))

  test("round trips: null and deflate codecs, multi-block") {
    for (codec <- Seq("null", "deflate"); n <- Seq(0, 1, 5, 2500)) {
      val bytes = AvroOcf.encode("Doc", fields, recs(n), codec, 1000)
      val ocf = AvroOcf.decode(bytes).get
      assert(ocf.codec == codec && ocf.fields.map(_.name) ==
        Vector("id", "title", "score", "kept"))
      assert(ocf.records.length == n)
      ocf.records.zip(recs(n)).foreach { case (got, want) =>
        assert(got == want.toVector)
      }
    }
  }

  test("the Avro Java reference implementation reads our files") {
    for (codec <- Seq("null", "deflate")) {
      val bytes = AvroOcf.encode("Doc", fields, recs(120), codec, 50)
      val reader = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      var i = 0
      while (reader.hasNext) {
        val r = reader.next()
        assert(r.get("id").asInstanceOf[Long] == i * 7L - 3)
        assert(r.get("title").toString == s"doc $i é")
        assert(r.get("score").asInstanceOf[Double] == i * 0.25)
        assert(r.get("kept").asInstanceOf[Boolean] == (i % 3 == 0))
        i += 1
      }
      reader.close()
      assert(i == 120, s"codec=$codec")
    }
  }

  test("we read Avro-Java-written files (both codecs)") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"Doc","fields":[
        |{"name":"id","type":"long"},{"name":"title","type":"string"},
        |{"name":"score","type":"double"},
        |{"name":"kept","type":"boolean"}]}""".stripMargin)
    for (codecName <- Seq(None, Some("deflate"))) {
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema))
      codecName.foreach(c =>
        w.setCodec(org.apache.avro.file.CodecFactory.fromString(c)))
      val bos = new java.io.ByteArrayOutputStream()
      w.create(schema, bos)
      for (i <- 0 until 80) {
        val r = new org.apache.avro.generic.GenericData.Record(schema)
        r.put("id", i * 11L); r.put("title", s"t$i")
        r.put("score", i / 8.0); r.put("kept", i % 2 == 0)
        w.append(r)
      }
      w.close()
      val ocf = AvroOcf.decode(bos.toByteArray)
      assert(ocf.nonEmpty, s"codec=$codecName")
      assert(ocf.get.records.length == 80)
      assert(ocf.get.records(3) == Vector(33L, "t3", 0.375, false))
    }
  }

  test("framing violations reject honestly") {
    val bytes = AvroOcf.encode("Doc", fields, recs(40), "deflate", 16)
    assert(AvroOcf.decode(Array.emptyByteArray).isEmpty)
    assert(AvroOcf.decode(bytes.take(3)).isEmpty)
    assert(AvroOcf.decode(bytes.take(bytes.length / 2)).isEmpty)
    val badMagic = bytes.clone(); badMagic(3) = 2
    assert(AvroOcf.decode(badMagic).isEmpty)
    // corrupt the sync marker copy after the first block
    val bad = bytes.clone(); bad(bytes.length - 3) = (bad(bytes.length - 3) ^ 1).toByte
    assert(AvroOcf.decode(bad).isEmpty)
    // a union-typed schema must reject loudly, not misparse
    val unionSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"U","fields":[
        |{"name":"x","type":["null","long"]}]}""".stripMargin)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](unionSchema))
    val bos = new java.io.ByteArrayOutputStream()
    w.create(unionSchema, bos); w.close()
    assert(AvroOcf.decode(bos.toByteArray).isEmpty)
  }

  test("bit-flip fuzz never crashes") {
    val bytes = AvroOcf.encode("Doc", fields, recs(60), "null", 25)
    var seed = 29L
    for (_ <- 1 to 400) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = bytes.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      AvroOcf.decode(m) // must not throw
    }
  }
}
