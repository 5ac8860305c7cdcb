package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** PDF text extraction: real xref/object/stream walk, FlateDecode,
  * content-stream show-op collection, escape discipline, and honest
  * rejection of everything out of scope. */
class PdfSpec extends AnyFunSuite {

  test("extracts Tj/TJ text in order, plain and Flate") {
    for (flate <- Seq(false, true)) {
      val pdf = Pdf.synthetic(Seq(Seq("hello world", "second line")), flate)
      val t = Pdf.extractText(pdf).get
      assert(t.nPages == 1)
      assert(t.nTextOps == 2) // one Tj + one TJ
      // TJ splits its chunk but concatenation restores it
      assert(t.text == "hello worldsecond line", s"flate=$flate: '${t.text}'")
    }
  }

  test("multi-page documents concatenate page by page") {
    val pdf = Pdf.synthetic(Seq(Seq("p1a", "p1b"), Seq("p2a"), Seq()), flate = true)
    val t = Pdf.extractText(pdf).get
    assert(t.nPages == 3)
    assert(t.nTextOps == 3)
    assert(t.text == "p1ap1bp2a")
  }

  test("escape discipline survives the round trip") {
    val tricky = "par(en)s \\back\\ and\nnewline"
    val t = Pdf.extractText(Pdf.synthetic(Seq(Seq(tricky)), flate = false)).get
    assert(t.text == tricky)
    // octal escapes and hex strings decode too: swap show-ops for
    // SAME-LENGTH replacements so /Length and the xref stay valid
    val pdfBytes = Pdf.synthetic(Seq(Seq("zzzzzzzz"), Seq("zzzz")),
      flate = false)
    val s = new String(pdfBytes, "ISO-8859-1")
      .replace("(zzzzzzzz) Tj", "(A\\102\\51) Tj") // \102 = B, \51 = )
      .replace("(zzzz) Tj", "<4142> Tj") // hex string "AB"
    assert(s.length == pdfBytes.length)
    val t2 = Pdf.extractText(s.getBytes("ISO-8859-1")).get
    assert(t2.text == "AB)AB")
  }

  test("truncation and garbage reject to None, never a crash") {
    val pdf = Pdf.synthetic(Seq(Seq("content here", "and more")), flate = true)
    for (cut <- Seq(3, 20, pdf.length / 3, pdf.length / 2, pdf.length - 4))
      Pdf.extractText(pdf.take(cut)) // any Option; must not throw
    assert(Pdf.extractText(Array[Byte](1, 2, 3)).isEmpty)
    assert(Pdf.extractText("not a pdf at all, nope".getBytes).isEmpty)
    var seed = 12345L
    for (_ <- 1 to 60) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val mutated = pdf.clone()
      val at = ((seed >>> 16) % mutated.length).toInt.abs
      mutated(at) = (mutated(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      Pdf.extractText(mutated) // must not throw
    }
  }

  test("foreign filters and corrupt deflate reject honestly") {
    val flated = Pdf.synthetic(Seq(Seq("secret")), flate = true)
    // swap the filter name for a SAME-LENGTH unknown one so every xref
    // offset stays valid — the walk must reject the filter, not guess
    val foreign = new String(flated, "ISO-8859-1")
      .replace("/Filter /FlateDecode", "/Filter /Flat3Decode")
    assert(foreign.length == flated.length)
    assert(Pdf.extractText(foreign.getBytes("ISO-8859-1")).isEmpty)
    // corrupt the deflate payload: inflate must fail closed
    val mangled = flated.clone()
    val at = {
      val s = new String(flated, "ISO-8859-1")
      s.indexOf("stream\n") + 10
    }
    mangled(at) = (mangled(at) ^ 0x55).toByte
    Pdf.extractText(mangled) // None or a Bail-caught None; never a crash
  }
}
