package graft.query

import graft.core.Consts
import scala.collection.mutable.ArrayBuffer

/** Snippet ("found page text") generation — port of the reference's
  * SpannableString / PreparePageText machinery
  * (/root/reference/Docodo.NET/Search.cs:619-751): match words are wrapped
  * in ˋ…ˊ markers, the window is pos.min−80 … pos.max+80 capped at 320
  * chars, and sentence punctuation is normalized.
  */
object Snippets {

  private final case class Span(var text: String, format: Int)

  private val wordEndRe = java.util.regex.Pattern.compile("(?<=\\w)\\b")

  private def spansFor(text: String, startWords: Array[Int]): ArrayBuffer[Span] = {
    val res = ArrayBuffer.empty[Span]
    var lastpos = 0
    startWords.foreach { pos =>
      if (pos >= lastpos && pos <= text.length) {
        res += Span(text.substring(lastpos, pos), 0)
        val m = wordEndRe.matcher(text.substring(pos))
        val wordend = if (m.find()) m.start() else 0
        res += Span(text.substring(pos, math.min(text.length, pos + wordend)), 1)
        lastpos = pos + wordend
      }
    }
    res += Span(text.substring(math.min(lastpos, text.length)), 0)
    res
  }

  private def spanSubstring(spans: ArrayBuffer[Span], start: Int, len: Int): ArrayBuffer[Span] = {
    val res = ArrayBuffer.empty[Span]
    var l = 0
    var i = 0
    var break = false
    while (!break && i < spans.length) {
      val sp = spans(i)
      l += sp.text.length
      if (res.isEmpty && l > start) {
        if (sp.format != 0) res += sp
        else res += Span(sp.text.substring(start - l + sp.text.length), 0)
      } else if (res.nonEmpty) {
        if (l >= start + len) {
          if (sp.format != 0) res += sp
          else res += Span(sp.text.substring(0, math.max(0, start + len - l + sp.text.length)), 0)
          break = true
        } else res += sp
      }
      i += 1
    }
    res
  }

  private val punct = Seq(
    ("\\b\\W*\\.+\\W*\\b", ". "), ("\\b\\W*\\?+\\W*\\b", "? "),
    ("\\b\\W*!+\\W*\\b", "! "), ("\\b\\W*:+\\W*\\b", ": "),
    ("\\b\\W*,+\\W*\\b", ", "))

  private def stringify(spans: ArrayBuffer[Span]): String = {
    val sb = new StringBuilder
    spans.foreach { sp =>
      if (sp.format != 0) sb.append(Consts.BeginMatch).append(sp.text).append(Consts.EndMatch)
      else sb.append(sp.text)
    }
    sb.toString
  }

  /** snippet for one page given its ORIGINAL text and match positions. */
  def pageText(text: String, pos: Array[Int], maxLen: Int = Consts.MaxFoundPageText): String = {
    if (pos.isEmpty) return ""
    val spans = spansFor(text, pos)
    val r0 = math.min(math.max(0, pos.min - maxLen / 4), text.length)
    val r1 = math.min(math.min(pos.max + maxLen / 4, text.length), r0 + maxLen)
    var res = spanSubstring(spans, r0, r1 - r0)
    punct.foreach { case (p, rep) =>
      res.foreach(sp => sp.text = sp.text.replaceAll(p, java.util.regex.Matcher.quoteReplacement(rep)))
    }
    stringify(res)
  }

  /** header block with highlights (whole string, no window) — used when the
    * first found page is the header page "0" (Search.cs:569-574). */
  def highlightAll(text: String, pos: Array[Int]): String =
    stringify(spansFor(text, pos))

  /** highlighted words (format≠0 span texts, distinct, in order). */
  def foundWords(text: String, pos: Array[Int]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    spansFor(text, pos).foreach(sp => if (sp.format != 0 && sp.text.nonEmpty) seen += sp.text)
    seen.toSeq
  }

  /** `Name=v\nTitle=t\n...` → map, reference MakeHeaders split on '='/'\n'
    * (Search.cs:78-86). */
  def makeHeaders(str: String): Map[String, String] = {
    val splits = str.split("[=\n]")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var q = 0
    while (q + 1 < splits.length) {
      out(splits(q)) = splits(q + 1)
      q += 2
    }
    out.toMap
  }
}
