package graft

import graft.query.{SearchOptions, SearchOut}

/** Interactive console with per-keystroke autocomplete, the counterpart of
  * the reference's ReadSearchRequest loop
  * (/root/reference/Program.cs:268-307): every keystroke updates the
  * request buffer (backspace edits, Enter submits) and re-renders up to 12
  * suggestions for the current buffer below the prompt; Enter runs the full
  * search and prints results.
  *
  * The keystroke/render logic is pure (`step` / `renderSuggestions`) so it
  * is unit-testable without a tty; `run` wires it to a terminal, putting it
  * into raw mode via `stty` when stdin IS a tty and falling back to plain
  * line-buffered reads otherwise (pipes, specs).
  */
object ConsoleRepl {

  final val MaxSuggestions = 12

  /** one keystroke against the request buffer (reference semantics:
    * backspace removes, '\r'/'\n' submits, everything printable appends). */
  def step(buf: String, ch: Char): String =
    if (ch == '\b' || ch == 127.toChar) { if (buf.nonEmpty) buf.dropRight(1) else buf }
    else if (ch == '\r' || ch == '\n') buf
    else if (ch >= ' ') buf + ch
    else buf

  def isSubmit(ch: Char): Boolean = ch == '\r' || ch == '\n'

  /** the suggestion block for a buffer: each line is buffer+completion,
    * like the reference's `res+ss` rendering. */
  def renderSuggestions(buf: String, suggest: String => Seq[String]): Seq[String] =
    if (buf.isEmpty) Nil
    else suggest(buf).take(MaxSuggestions).map(s => buf + s)

  /** Run one interactive session: keystrokes from `in`, rendering to `out`,
    * `suggest` for completions, `search` on submit. `rawTty` controls
    * whether ANSI cursor control is emitted (true on a real terminal). Runs
    * until EOF. Returns the number of searches executed. */
  def loop(in: java.io.InputStream, out: java.io.PrintStream,
           suggest: String => Seq[String],
           search: String => SearchOut,
           rawTty: Boolean): Int = {
    var buf = ""
    var searches = 0
    out.print("> ")
    var c = in.read()
    while (c >= 0) {
      val ch = c.toChar
      if (isSubmit(ch)) {
        if (buf.nonEmpty) {
          out.println()
          val res = search(buf)
          out.println(s"found ${res.docs.size} docs (${res.nFoundPages} pages)")
          res.docs.foreach { d =>
            out.println(f"  ${d.rank}%8.3f  ${d.name}  ${d.summary.take(120)}")
          }
          searches += 1
        }
        buf = ""
        out.print("> ")
      } else {
        buf = step(buf, ch)
        if (rawTty) {
          // redraw prompt line + suggestion block (ANSI: clear below cursor)
          out.print("\u001b[s\u001b[0J")
          val sugg = renderSuggestions(buf, suggest)
          sugg.foreach(s => out.print(s"\n\u001b[90m$s\u001b[0m"))
          out.print("\u001b[u")
          out.print("\r\u001b[2K> " + buf)
        } else {
          // pipe mode: print suggestions once per keystroke, plainly
          val sugg = renderSuggestions(buf, suggest)
          if (sugg.nonEmpty) out.println(sugg.mkString("[", " | ", "]"))
        }
      }
      c = in.read()
    }
    out.println()
    searches
  }

  /** wire the loop to a SparkSearcher on the current terminal. */
  def run(searcher: graft.spark.SparkSearcher): Unit = {
    val tty = System.console() != null
    if (tty) sttyRaw(true)
    try {
      loop(System.in, System.out,
        req => searcher.suggest(req, MaxSuggestions),
        req => searcher.search(req, SearchOptions()),
        rawTty = tty)
    } finally if (tty) sttyRaw(false)
  }

  private def sttyRaw(enable: Boolean): Unit = {
    val cmd =
      if (enable) Array("sh", "-c", "stty -icanon -echo min 1 < /dev/tty")
      else Array("sh", "-c", "stty icanon echo < /dev/tty")
    try new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()
    catch { case _: Throwable => () }
  }
}
