package graft

import graft.query.{DocHit, SearchOut, WordInfo}
import org.scalatest.funsuite.AnyFunSuite

/** Interactive console autocomplete (Program.cs:268-307 counterpart):
  * keystroke editing, per-keystroke suggestion rendering, submit-on-Enter.
  */
class ConsoleSpec extends AnyFunSuite {

  test("step: printable appends, backspace edits, control chars ignored") {
    var buf = ""
    "old".foreach(c => buf = ConsoleRepl.step(buf, c))
    assert(buf == "old")
    buf = ConsoleRepl.step(buf, '\b')
    assert(buf == "ol")
    buf = ConsoleRepl.step(buf, 127.toChar) // DEL backspaces too
    assert(buf == "o")
    buf = ConsoleRepl.step(buf, 127.toChar)
    buf = ConsoleRepl.step(buf, '\b') // backspace on empty stays empty
    assert(buf == "")
    buf = ConsoleRepl.step(buf, 7.toChar) // BEL ignored
    assert(buf == "")
    assert(ConsoleRepl.isSubmit('\r') && ConsoleRepl.isSubmit('\n'))
  }

  test("renderSuggestions: buffer+completion lines, capped at 12, prefix-driven") {
    val asked = scala.collection.mutable.ArrayBuffer.empty[String]
    val suggest: String => Seq[String] = { p =>
      asked += p
      (1 to 20).map(i => s"_c$i")
    }
    assert(ConsoleRepl.renderSuggestions("", suggest).isEmpty)
    assert(asked.isEmpty) // empty buffer never hits the dictionary
    val lines = ConsoleRepl.renderSuggestions("ol", suggest)
    assert(asked == Seq("ol"))
    assert(lines.size == ConsoleRepl.MaxSuggestions)
    assert(lines.head == "ol_c1") // reference renders res+ss
  }

  test("loop e2e over a pipe: suggestions per keystroke, search on Enter") {
    val suggestLog = scala.collection.mutable.ArrayBuffer.empty[String]
    val searchLog = scala.collection.mutable.ArrayBuffer.empty[String]
    val suggest: String => Seq[String] = { p => suggestLog += p; Seq("d", "dest") }
    val search: String => SearchOut = { q =>
      searchLog += q
      SearchOut(Seq(DocHit(1L, "web:doc", 1.0f, 2.0, Nil, Map.empty, Nil, "a summary")),
        3, Seq(WordInfo(q, 1L)))
    }
    val in = new java.io.ByteArrayInputStream("ol\rold\n".getBytes("UTF-8"))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bos, true, "UTF-8")
    val n = ConsoleRepl.loop(in, out, suggest, search, rawTty = false)
    assert(n == 2)
    assert(searchLog == Seq("ol", "old"))
    // a suggestion lookup happened for every non-submit keystroke's buffer
    assert(suggestLog == Seq("o", "ol", "o", "ol", "old"))
    val rendered = bos.toString("UTF-8")
    assert(rendered.contains("[od | odest]") || rendered.contains("[old | oldest]")
      || rendered.contains("[od | odest]"), rendered)
    assert(rendered.contains("found 1 docs (3 pages)"))
    assert(rendered.contains("web:doc"))
  }
}
