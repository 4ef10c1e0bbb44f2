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
    summary: String) {
  /** header fields with the reference's typed coercion applied
    * (IndexPage.ConvertToObject). */
  def typedHeaders: Map[String, Any] =
    headers.view.mapValues(HeaderFields.typedValue).toMap
}

/** Typed header-field coercion, porting IndexPage.ConvertToObject
  * (/root/reference/Docodo.NET/DataSources/DataSources.cs:43-62): a value
  * that parses as a whole integer becomes Long, else a decimal becomes
  * BigDecimal, else the string stays. (The reference's regexes are
  * unanchored and long.Parse would throw on mixed text like "Author 3" —
  * we coerce only when the FULL value parses, falling back to string,
  * which is the only non-crashing reading of that contract.) */
object HeaderFields {
  private val intRe = "[+-]?[0-9]+".r.unanchored
  private val decRe = "[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)".r.unanchored

  def typedValue(v: String): Any = {
    val t = v.trim
    if (intRe.findFirstIn(t).isDefined && scala.util.Try(t.toLong).isSuccess) t.toLong
    else if (decRe.findFirstIn(t).isDefined && scala.util.Try(BigDecimal(t)).isSuccess) BigDecimal(t)
    else v
  }

  /** full port shape: header text block → typed field map (lines with
    * exactly one '='). */
  def convertToObject(headerText: String): Map[String, Any] =
    headerText.split("\n").iterator.flatMap { line =>
      val vals = line.split("=")
      if (vals.length == 2) Some(vals(0) -> typedValue(vals(1))) else None
    }.toMap
}

final case class WordInfo(word: String, nFound: Long)

final case class SearchOut(
    docs: Seq[DocHit],      // reference order: rank ascending (Search.cs:599)
    nFoundPages: Int,
    words: Seq[WordInfo],
    error: Option[String] = None)

final case class SearchOptions(dist: Int = graft.core.Consts.DefaultDist)
