package graft.query

/** Engine-facing result model (shared by the in-memory reference engine and
  * the Spark engine; specs assert the two produce identical values).
  */
final case class PageHit(
    pageId: String,
    pos: Array[Int],
    rank: Float,
    text: String)

final case class DocHit(
    docId: Long,
    name: String,
    rank: Float,            // reference ("docodo") rank
    bm25: Double,           // our headline score
    pages: Seq[PageHit],
    headers: Map[String, String],
    foundWords: Seq[String],
    summary: String)

final case class WordInfo(word: String, nFound: Long)

final case class SearchOut(
    docs: Seq[DocHit],      // reference order: rank ascending (Search.cs:599)
    nFoundPages: Int,
    words: Seq[WordInfo],
    error: Option[String] = None)

final case class SearchOptions(dist: Int = graft.core.Consts.DefaultDist)
