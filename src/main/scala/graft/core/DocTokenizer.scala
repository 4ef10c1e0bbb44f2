package graft.core

import graft.text.Analyzer

/** Per-document indexing: turns a document's pages into term postings with
  * within-document character coordinates, page boundaries, and the BM25
  * document length.
  *
  * Semantics port of the reference indexing loop
  * (/root/reference/Docodo.NET/Build.cs:477-532):
  *  - page "0" is a `key=value\n` header block; for every value word piece
  *    (split at word boundaries) the field term `&key` is indexed at the
  *    piece start − 1 and the word itself at the piece start, provided the
  *    key is ≥ MIN_WORD_LENGTH (Build.cs:485-524); header words have no
  *    length gate;
  *  - body pages tokenize with `\p{L}+|\p{N}+` over the lowercased text and
  *    keep 3 ≤ len ≤ 32 (Build.cs:526-529);
  *  - the coordinate accumulates line.length+1 per header line and
  *    page.length per body page; each page's END coordinate is recorded
  *    (Build.cs:515,521,531-532), so position-in-page = coord − prevEnd.
  *
  * Within-doc coordinates replace the reference's global coordinate space
  * (SURVEY §7.1): observable outputs (per-page offsets) are identical, but
  * the build no longer serializes on a global counter.
  */
object DocTokenizer {

  final case class TokenPosting(term: String, coord: Long)

  final case class DocIndexed(
      postings: Array[TokenPosting],
      pageIds: Array[String],
      pageEnds: Array[Long],
      docLen: Long)

  /** Word-code memo: natural-language term frequencies are Zipfian, so a
    * per-partition cache turns stemming/vocab lookup into a hash probe for
    * almost every token. Bounded to keep executor memory flat. */
  final class CodeCache(an: Analyzer, max: Int = 1 << 17) {
    private val m = new java.util.HashMap[String, Seq[String]]()
    def codes(w: String): Seq[String] = {
      var c = m.get(w)
      if (c == null) {
        c = an.wordCodes(w)
        if (m.size < max) m.put(w, c)
      }
      c
    }
  }

  /** Index one document: optional header page "0" plus body pages "1".."N".
    * `bodyPages` are (id, text) in order.
    */
  def index(an: Analyzer, header: String, bodyPages: Seq[(String, String)],
            cache: CodeCache = null): DocIndexed = {
    val g = indexGrouped(an, header, bodyPages, cache)
    val out = new Array[TokenPosting](g.terms.length)
    var i = 0
    while (i < out.length) { out(i) = TokenPosting(g.terms(i), g.coords(i)); i += 1 }
    DocIndexed(out, g.pageIds, g.pageEnds, g.docLen)
  }

  /** Allocation-light result: parallel term/coord arrays (terms are shared
    * cache references, coords unboxed). */
  final case class DocIndexedG(
      terms: Array[String],
      coords: Array[Long],
      pageIds: Array[String],
      pageEnds: Array[Long],
      docLen: Long)

  def indexGrouped(an: Analyzer, header: String, bodyPages: Seq[(String, String)],
                   cache: CodeCache = null): DocIndexedG = {
    val lookup: String => Seq[String] =
      if (cache == null) an.wordCodes else cache.codes
    val terms = Array.newBuilder[String]
    val coords = new LongVec(256)
    @inline def put(t: String, c: Long): Unit = { terms += t; coords += c }
    val pageIds = Array.newBuilder[String]
    val pageEnds = Array.newBuilder[Long]
    var coord = 0L
    var docLen = 0L

    if (header != null && header.nonEmpty) {
      // header page "0" (Build.cs:485-524)
      // emulate StringReader.ReadLine: split on \n; a trailing \n yields no
      // empty final line
      val lines = {
        val parts = header.split("\n", -1)
        if (parts.nonEmpty && parts.last.isEmpty) parts.dropRight(1) else parts
      }
      lines.foreach { rawLine =>
        val line = rawLine.toLowerCase(java.util.Locale.ROOT)
        val eq = line.indexOf('=')
        if (eq >= 0) {
          val name = line.substring(0, eq)
          val value = line.substring(eq + 1).split("=")(0) // fields[1] of Split('=')
          if (name.length >= Consts.MinWordLength) {
            var dc = name.length + 1
            Analyzer.splitWordBoundaries(value).foreach { piece =>
              if (piece.length >= 1 && Analyzer.isWordChar(piece.charAt(0))) {
                put(Consts.FieldNameChar.toString + name, coord + dc - 1)
                val w = piece.toLowerCase(java.util.Locale.ROOT)
                val codes = lookup(w)
                codes.foreach(c => put(c, coord + dc))
                if (codes.nonEmpty) docLen += 1
              }
              dc += piece.length
            }
          }
        }
        coord += line.length + 1
      }
      pageIds += "0"
      pageEnds += coord
    }

    bodyPages.foreach { case (pid, text) =>
      val c = text.toLowerCase(java.util.Locale.ROOT)
      if (c.nonEmpty) {
        // inlined tokenizer loop: no per-token tuple allocation
        val m = Analyzer.tokenRe.matcher(c)
        while (m.find()) {
          val len = m.end() - m.start()
          if (len >= Consts.MinWordLength && len <= Consts.MaxWordLength) {
            val w = m.group()
            val codes = lookup(w)
            codes.foreach(code => put(code, coord + m.start()))
            if (codes.nonEmpty) docLen += 1
          }
        }
        coord += c.length
        pageIds += pid
        pageEnds += coord
      }
    }

    DocIndexedG(terms.result(), coords.toArray, pageIds.result(), pageEnds.result(), docLen)
  }
}
