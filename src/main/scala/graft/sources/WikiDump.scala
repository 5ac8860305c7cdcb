package graft.sources

/** MediaWiki XML dump page extraction — the shape of the classic
  * public text corpus: Wikipedia database dumps are `<mediawiki>`
  * documents of `<page>` elements shipped as `.xml.bz2` ([[Bzip2]]
  * owns the wrapper). This walker owns the minimal strict subset the
  * dumps actually use for page payloads: element walk by tag name,
  * the five predefined XML entities, CDATA-free text nodes. It is NOT
  * a general XML parser and rejects anything outside the dump shape —
  * honest rejection, never a guess (DecoderFuzzSpec law).
  */
object WikiDump {

  final case class Page(title: String, ns: Int, id: Long, text: String)

  val MaxPages = 1 << 20

  private def unescape(s: String): Option[String] = {
    if (!s.contains('&')) return Some(s)
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi < 0 || semi - i > 6) return None
        s.substring(i + 1, semi) match {
          case "amp" => out += '&'
          case "lt" => out += '<'
          case "gt" => out += '>'
          case "quot" => out += '"'
          case "apos" => out += '\''
          case _ => return None // numeric refs out of dump scope
        }
        i = semi + 1
      } else { out += c; i += 1 }
    }
    Some(out.toString)
  }

  /** the first <tag ...>body</tag> inside [from, until); returns
    * (bodyStart, bodyEnd, elementEnd). */
  private def element(xml: String, tag: String, from: Int,
      until: Int): Option[(Int, Int, Int)] = {
    val open = xml.indexOf("<" + tag, from)
    if (open < 0 || open >= until) return None
    val openEnd = xml.indexOf('>', open)
    if (openEnd < 0 || openEnd >= until) return None
    // reject a longer tag name sharing the prefix
    val afterName = open + 1 + tag.length
    if (afterName < xml.length && xml.charAt(afterName) != '>' &&
        xml.charAt(afterName) != ' ' && xml.charAt(afterName) != '/')
      return element(xml, tag, afterName, until)
    val close = xml.indexOf("</" + tag + ">", openEnd)
    if (close < 0 || close + tag.length + 3 > until) return None
    Some((openEnd + 1, close, close + tag.length + 3))
  }

  /** all pages of a dump document; None on any malformed element. */
  def pages(xml: String): Option[Vector[Page]] = {
    val root = element(xml, "mediawiki", 0, xml.length).getOrElse(return None)
    val out = Vector.newBuilder[Page]
    var at = root._1
    var n = 0
    while (at < root._2) {
      val nextPage = xml.indexOf("<page>", at)
      if (nextPage < 0 || nextPage >= root._2) {
        // only whitespace may remain before </mediawiki>
        if (!xml.substring(at, root._2).forall(_.isWhitespace)) return None
        at = root._2
      } else if (!xml.substring(at, nextPage).forall(_.isWhitespace)) {
        return None // stray content between pages
      } else {
        n += 1
        if (n > MaxPages) return None
        val p = element(xml, "page", nextPage, root._2).getOrElse(return None)
        val title = element(xml, "title", p._1, p._2).getOrElse(return None)
        val ns = element(xml, "ns", p._1, p._2).getOrElse(return None)
        val id = element(xml, "id", p._1, p._2).getOrElse(return None)
        val rev = element(xml, "revision", p._1, p._2).getOrElse(return None)
        val text = element(xml, "text", rev._1, rev._2).getOrElse(return None)
        val nsV = xml.substring(ns._1, ns._2).trim.toIntOption
          .getOrElse(return None)
        val idV = xml.substring(id._1, id._2).trim.toLongOption
          .getOrElse(return None)
        out += Page(
          unescape(xml.substring(title._1, title._2)).getOrElse(return None),
          nsV, idV,
          unescape(xml.substring(text._1, text._2)).getOrElse(return None))
        at = p._3
      }
    }
    Some(out.result())
  }
}
