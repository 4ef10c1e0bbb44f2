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

  /** Ctrl-D: raw mode disables VEOF processing, so EOF arrives as the raw
    * byte 0x04 — without this the raw-tty loop has NO normal exit path
    * (in.read() never returns -1 on a live tty). */
  def isEot(ch: Char): Boolean = ch == 4.toChar

  /** the suggestion block for a buffer: each line is buffer+completion,
    * like the reference's `res+ss` rendering. */
  def renderSuggestions(buf: String, suggest: String => Seq[String]): Seq[String] =
    if (buf.isEmpty) Nil
    else suggest(buf).take(MaxSuggestions).map(s => buf + s)

  /** Run one interactive session: keystrokes from `in`, rendering to `out`,
    * `suggest` for completions, `search` on submit. `rawTty` controls
    * whether ANSI cursor control is emitted (true on a real terminal). Runs
    * until EOF (or Ctrl-D in raw mode). Returns the number of searches
    * executed.
    *
    * Input is decoded as UTF-8 CHARACTERS, not bytes: raw mode delivers
    * multi-byte sequences (Cyrillic queries against a --voc ru index) one
    * byte at a time, and byte-wise handling would append mojibake and make
    * backspace remove partial code points. ANSI escape sequences (arrow
    * keys etc.) are consumed whole so their printable tail bytes never
    * leak into the buffer. */
  def loop(in: java.io.InputStream, out: java.io.PrintStream,
           suggest: String => Seq[String],
           search: String => SearchOut,
           rawTty: Boolean): Int = {
    val reader = new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8)
    var buf = ""
    var searches = 0
    var lastSugg = 0 // suggestion lines currently on screen (raw mode)
    out.print("> ")
    var c = reader.read()
    var stop = false
    while (c >= 0 && !stop) {
      val ch = c.toChar
      if (isEot(ch)) stop = true
      else if (ch == 27.toChar) {
        // swallow the escape sequence: CSI (ESC '[' ... final 0x40-0x7E),
        // SS3 (ESC 'O' final — application-cursor-mode arrows send
        // ESC O A, whose 'A' would otherwise land in the search buffer),
        // or a two-char sequence (ESC x)
        val n1 = reader.read()
        if (n1 == '['.toInt) {
          var fin = reader.read()
          while (fin >= 0 && (fin < 0x40 || fin > 0x7e)) fin = reader.read()
        } else if (n1 == 'O'.toInt) {
          reader.read()
        }
      } else if (isSubmit(ch)) {
        if (rawTty && lastSugg > 0) { out.print("\u001b[0J"); lastSugg = 0 }
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
          // Redraw: prompt line in place, suggestions below, then cursor
          // moved back UP by the number of lines actually printed — NOT
          // ESC[s/ESC[u save/restore, whose absolute position breaks when
          // the suggestion block scrolls the viewport at the bottom row.
          out.print("\r\u001b[2K> " + buf)
          out.print("\u001b[0J")
          val sugg = renderSuggestions(buf, suggest)
          sugg.foreach(s => out.print(s"\n\u001b[90m$s\u001b[0m"))
          if (sugg.nonEmpty) out.print(s"\u001b[${sugg.size}A")
          // re-place the cursor at the end of the prompt line
          out.print("\r\u001b[" + (2 + buf.length) + "G")
          lastSugg = sugg.size
        } else {
          // pipe mode: print suggestions once per keystroke, plainly
          val sugg = renderSuggestions(buf, suggest)
          if (sugg.nonEmpty) out.println(sugg.mkString("[", " | ", "]"))
        }
      }
      if (!stop) c = reader.read()
    }
    out.println()
    searches
  }

  /** wire the loop to a SparkSearcher on the current terminal. */
  def run(searcher: graft.spark.SparkSearcher): Unit = {
    val tty = System.console() != null
    // restore the terminal even on SIGINT: Ctrl-C (isig stays enabled in
    // -icanon) kills the JVM without running the finally below, which
    // would leave the user's shell with echo off
    val hook = new Thread(() => sttyRaw(false))
    if (tty) { sttyRaw(true); Runtime.getRuntime.addShutdownHook(hook) }
    try {
      loop(System.in, System.out,
        req => searcher.suggest(req, MaxSuggestions),
        req => searcher.search(req, SearchOptions()),
        rawTty = tty)
    } finally if (tty) {
      sttyRaw(false)
      try Runtime.getRuntime.removeShutdownHook(hook) catch { case _: Throwable => () }
    }
  }

  private def sttyRaw(enable: Boolean): Unit = {
    val cmd =
      if (enable) Array("sh", "-c", "stty -icanon -echo min 1 < /dev/tty")
      else Array("sh", "-c", "stty icanon echo < /dev/tty")
    try new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()
    catch { case _: Throwable => () }
  }
}
