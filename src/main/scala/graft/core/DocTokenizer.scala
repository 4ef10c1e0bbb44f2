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

  /** Index one document: optional header page "0" plus body pages "1".."N".
    * `bodyPages` are (id, text) in order.
    */
  def index(an: Analyzer, header: String, bodyPages: Seq[(String, String)]): DocIndexed = {
    val postings = Array.newBuilder[TokenPosting]
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
                postings += TokenPosting(Consts.FieldNameChar.toString + name, coord + dc - 1)
                val w = piece.toLowerCase(java.util.Locale.ROOT)
                val codes = an.wordCodes(w)
                codes.foreach(c => postings += TokenPosting(c, coord + dc))
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
        an.bodyTokens(c).foreach { case (w, off) =>
          val codes = an.wordCodes(w)
          codes.foreach(code => postings += TokenPosting(code, coord + off))
          if (codes.nonEmpty) docLen += 1
        }
        coord += c.length
        pageIds += pid
        pageEnds += coord
      }
    }

    DocIndexed(postings.result(), pageIds.result(), pageEnds.result(), docLen)
  }
}
