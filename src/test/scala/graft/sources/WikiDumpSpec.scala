package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** MediaWiki dump walker: page extraction, entity decode, and the
  * strict-rejection law on malformed documents. */
class WikiDumpSpec extends AnyFunSuite {

  private val doc =
    """<mediawiki>
      |  <page><title>Alpha &amp; Beta</title><ns>0</ns><id>7</id><revision><id>15</id><text bytes="11">a &lt;b&gt; c</text></revision></page>
      |  <page><title>Talk:Alpha</title><ns>1</ns><id>8</id><revision><id>16</id><text>ok</text></revision></page>
      |</mediawiki>""".stripMargin

  test("pages extract with entity decode and document order") {
    val ps = WikiDump.pages(doc).get
    assert(ps.map(_.title) == Vector("Alpha & Beta", "Talk:Alpha"))
    assert(ps.map(_.ns) == Vector(0, 1))
    assert(ps.map(_.id) == Vector(7L, 8L))
    assert(ps.head.text == "a <b> c")
  }

  test("malformed documents reject honestly") {
    assert(WikiDump.pages("").isEmpty)
    assert(WikiDump.pages("<mediawiki><page></mediawiki>").isEmpty)
    assert(WikiDump.pages(doc.replace("</title>", "")).isEmpty)
    assert(WikiDump.pages(doc.replace("<ns>0</ns>", "<ns>x</ns>")).isEmpty)
    assert(WikiDump.pages(doc.replace("&amp;", "&bogus;")).isEmpty)
    assert(WikiDump.pages(doc.replace("</mediawiki>", "")).isEmpty)
    // stray non-whitespace between pages
    assert(WikiDump.pages(doc.replace("</page>\n  <page>",
      "</page>junk<page>")).isEmpty)
  }

  test("end-to-end .xml.bz2: hand-rolled bzip2 wraps the dump") {
    val z = Bzip2.compress(doc.getBytes("UTF-8"), 1)
    val ps = Bzip2.decompress(z).map(new String(_, "UTF-8"))
      .flatMap(WikiDump.pages).get
    assert(ps.length == 2 && ps.head.id == 7L)
  }
}
