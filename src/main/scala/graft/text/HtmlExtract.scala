package graft.text

import scala.collection.mutable.ArrayBuffer

/** HTML → text extraction with the same observable contract as the
  * reference's web extractor
  * (/root/reference/Docodo.NET/DataSources/WebDataSource.cs:213-269):
  *
  *  - text nodes are concatenated in document order, each followed by a
  *    single space, EXCLUDING text whose parent element is `script` or
  *    `style`; comments and doctypes contribute nothing;
  *  - an `img` element with an `alt` attribute contributes `alt + " "`;
  *  - the result is trimmed of leading/trailing `\r`, `\n`, ' ' and every
  *    run matching `([ ]*[\n\r]+[ ]*)+` collapses to `"\r\n"`;
  *  - entities are left as-is in body text (the reference appends the raw
  *    InnerText of text nodes);
  *  - headers: `Name=<url>`, `Source=<source>`, plus `Title=` from the
  *    first `<title>` (HTML-encoded, '\n'/'=' replaced by ' ') and
  *    `Author=` from any `<meta>` with an `Author` attribute.
  *
  * The byte-exact spec is pinned by golden SHA-256 fixtures in
  * src/test/resources (SURVEY §7.4.6). Implementation is a single-pass
  * tokenizer: no DOM is built, so it streams at scale.
  */
object HtmlExtract {

  final case class Extracted(text: String, title: String, author: String) {
    /** Header page "0" content, cf. WebDataSource.cs:260-266. */
    def headers(url: String, sourceName: String): String = {
      val sb = new StringBuilder
      sb.append(s"Name=$url\n")
      sb.append(s"Source=$sourceName\n")
      if (title.nonEmpty) sb.append(s"Title=$title\n")
      if (author.nonEmpty) sb.append(s"Author=$author\n")
      sb.toString
    }
  }

  private val collapseRe = "([ ]*[\\n\\r]+[ ]*)+".r

  def extract(html: Array[Byte]): Extracted =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def extract(html: String): Extracted = {
    val body = new StringBuilder
    var title: String = ""
    var author: String = ""
    var inTitle = false
    val titleSb = new StringBuilder
    var sawTitle = false

    val n = html.length
    var i = 0

    def skipUntil(s: String, from: Int): Int = {
      val p = html.indexOf(s, from)
      if (p < 0) n else p + s.length
    }

    // parse a tag starting at '<'; returns index after tag end.
    // emits side effects for img/meta/title/script/style.
    while (i < n) {
      // text nodes inside <title> count both as body text (document order)
      // and as the Title header source — HtmlAgilityPack's DescendantsAndSelf
      // walk includes them (parent "title" is neither script nor style).
      def emitText(t: String): Unit = {
        if (t.nonEmpty) {
          if (inTitle) titleSb.append(t)
          body.append(t).append(' ')
        }
      }
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        emitText(html.substring(i))
        i = n
      } else {
        if (lt > i) emitText(html.substring(i, lt))
        // now at '<'
        if (html.startsWith("<!--", lt)) {
          i = skipUntil("-->", lt + 4)
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          i = skipUntil(">", lt + 1)
        } else {
          // element tag
          val close = html.charAt(lt + 1) == '/'
          var p = if (close) lt + 2 else lt + 1
          val nameStart = p
          while (p < n && (html.charAt(p).isLetterOrDigit || html.charAt(p) == '-' || html.charAt(p) == ':')) p += 1
          val name = html.substring(nameStart, p).toLowerCase(java.util.Locale.ROOT)
          // parse attributes up to '>'
          val attrs = ArrayBuffer.empty[(String, String)]
          var selfClosed = false
          var done = false
          while (!done && p < n) {
            val c = html.charAt(p)
            if (c == '>') { done = true; p += 1 }
            else if (c == '/' && p + 1 < n && html.charAt(p + 1) == '>') { selfClosed = true; done = true; p += 2 }
            else if (c.isWhitespace) p += 1
            else {
              // attribute
              val as = p
              while (p < n && !html.charAt(p).isWhitespace && html.charAt(p) != '=' && html.charAt(p) != '>' && html.charAt(p) != '/') p += 1
              val aname = html.substring(as, p)
              var avalue = ""
              while (p < n && html.charAt(p).isWhitespace) p += 1
              if (p < n && html.charAt(p) == '=') {
                p += 1
                while (p < n && html.charAt(p).isWhitespace) p += 1
                if (p < n && (html.charAt(p) == '"' || html.charAt(p) == '\'')) {
                  val q = html.charAt(p); p += 1
                  val vs = p
                  while (p < n && html.charAt(p) != q) p += 1
                  avalue = html.substring(vs, p)
                  if (p < n) p += 1
                } else {
                  val vs = p
                  while (p < n && !html.charAt(p).isWhitespace && html.charAt(p) != '>') p += 1
                  avalue = html.substring(vs, p)
                }
              }
              if (aname.nonEmpty) attrs += ((aname, avalue))
            }
          }
          i = p
          if (!close) {
            name match {
              case "script" | "style" =>
                if (!selfClosed) i = skipUntil("</" + name, i) match {
                  case e if e >= n => n
                  case e => skipUntil(">", e)
                }
              case "img" =>
                attrs.find(_._1.equalsIgnoreCase("alt")).foreach { case (_, v) =>
                  body.append(v).append(' ')
                }
              case "title" =>
                if (!sawTitle && !selfClosed) { inTitle = true; titleSb.clear() }
              case "meta" =>
                attrs.find(_._1.equalsIgnoreCase("author")).foreach { case (_, v) =>
                  author = htmlEncode(v).replace('\n', ' ').replace('=', ' ')
                }
              case _ =>
            }
          } else if (name == "title" && inTitle) {
            inTitle = false
            sawTitle = true
            title = htmlEncode(titleSb.toString).replace('\n', ' ').replace('=', ' ')
          }
        }
      }
    }
    var rstr = body.toString.dropWhile(c => c == '\r' || c == '\n' || c == ' ')
      .reverse.dropWhile(c => c == '\r' || c == '\n' || c == ' ').reverse
    rstr = collapseRe.replaceAllIn(rstr, java.util.regex.Matcher.quoteReplacement("\r\n"))
    Extracted(rstr, title, author)
  }

  /** WebUtility.HtmlEncode-compatible encoding used for Title/Author header
    * values (WebDataSource.cs:250,257). */
  def htmlEncode(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case '\'' => sb.append("&#39;")
      case c if c >= 160 && c < 256 => sb.append("&#").append(c.toInt).append(';')
      case c => sb.append(c)
    }
    sb.toString
  }
}
