package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** ZIP framing: round trips both ways against java.util.zip (a fully
  * independent implementation), CRC/size discipline, EOCD comment
  * scan, and the honest-rejection fuzz law. */
class ZipArcSpec extends AnyFunSuite {

  private def members(n: Int): Seq[(String, Array[Byte], Boolean)] =
    (0 until n).map { i =>
      (s"m$i.txt", (s"member $i body " * (i * 11 + 1)).getBytes("UTF-8"),
        i % 2 == 0)
    }

  test("encode/parse round trip: stored and deflated members") {
    val ms = members(6)
    val zip = ZipArc.encode(ms)
    val got = ZipArc.parse(zip).get
    assert(got.length == 6)
    got.zip(ms).foreach { case (e, (name, payload, deflated)) =>
      assert(e.name == name)
      assert(e.method == (if (deflated) 8 else 0))
      assert(java.util.Arrays.equals(e.payload, payload))
    }
  }

  test("java.util.zip reads our archive") {
    val ms = members(4)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(ZipArc.encode(ms)))
    ms.foreach { case (name, payload, _) =>
      val e = zin.getNextEntry
      assert(e.getName == name)
      val read = zin.readAllBytes()
      assert(java.util.Arrays.equals(read, payload), name)
    }
    assert(zin.getNextEntry == null)
  }

  test("we read a java.util.zip-produced archive (stored entries)") {
    // ZipOutputStream on a non-seekable stream emits data descriptors
    // (flag bit 3) for DEFLATED entries — outside our strict subset —
    // so the positive interop direction uses STORED entries, where it
    // writes classic headers
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    val ms = members(5)
    ms.foreach { case (name, payload, _) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setMethod(java.util.zip.ZipEntry.STORED)
      e.setSize(payload.length)
      val c = new java.util.zip.CRC32(); c.update(payload)
      e.setCrc(c.getValue)
      zout.putNextEntry(e); zout.write(payload); zout.closeEntry()
    }
    zout.close()
    val got = ZipArc.parse(bos.toByteArray).get
    assert(got.length == ms.length)
    got.zip(ms).foreach { case (e, (name, payload, _)) =>
      assert(e.name == name && e.method == 0)
      assert(java.util.Arrays.equals(e.payload, payload))
    }
  }

  test("data-descriptor (flag bit 3) archives reject, not misparse") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    val e = new java.util.zip.ZipEntry("d.txt")
    zout.putNextEntry(e)
    zout.write(("deflated body " * 40).getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    assert(ZipArc.parse(bos.toByteArray).isEmpty)
  }

  test("EOCD scan survives an archive comment") {
    val zip = ZipArc.encode(members(2))
    // splice a comment: bump the comment-length field and append
    val comment = "dataset v1; see MANIFEST".getBytes("US-ASCII")
    val out = java.util.Arrays.copyOf(zip, zip.length + comment.length)
    out(zip.length - 2) = (comment.length & 0xFF).toByte
    out(zip.length - 1) = ((comment.length >> 8) & 0xFF).toByte
    System.arraycopy(comment, 0, out, zip.length, comment.length)
    val got = ZipArc.parse(out).get
    assert(got.length == 2)
  }

  test("framing violations reject honestly") {
    val ms = members(3)
    val zip = ZipArc.encode(ms)
    assert(ZipArc.parse(Array.emptyByteArray).isEmpty)
    assert(ZipArc.parse(zip.take(zip.length - 4)).isEmpty) // EOCD cut
    assert(ZipArc.parse(zip.take(20)).isEmpty)
    assert(ZipArc.parse(zip.drop(4)).isEmpty) // offsets all shifted
    // corrupt a STORED payload byte: the CRC check must catch it
    // (m1 is stored; its data starts at local1 = 52, +30 header +6 name)
    val bad = zip.clone()
    bad(100) = (bad(100) ^ 0x40).toByte
    assert(ZipArc.parse(bad).isEmpty)
    // zero the CRC field of the first local header
    val badCrc = zip.clone()
    badCrc(14) = 0; badCrc(15) = 0; badCrc(16) = 0; badCrc(17) = 0
    assert(ZipArc.parse(badCrc).isEmpty)
  }

  test("bit-flip fuzz never crashes") {
    val zip = ZipArc.encode(members(4))
    var seed = 31L
    for (_ <- 1 to 300) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = zip.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      ZipArc.parse(m) // must not throw
    }
  }
}
