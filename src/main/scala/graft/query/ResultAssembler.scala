package graft.query

import graft.core.Consts
import scala.collection.mutable.ArrayBuffer

/** Turns per-document evaluation output into the final SearchOut, porting
  * PrepareSearchResult + the enrichment/ordering tail of Search
  * (/root/reference/Docodo.NET/Search.cs:365-420,525-603):
  *
  *  - documents stream in ascending docId order (the reference's global
  *    coordinate order);
  *  - the doc-name regex filters and the MAX_FOUND_DOCS=500 cap apply in
  *    that order; pages count toward MAX_FOUND_PAGES=30000 globally, and
  *    the scan stops mid-page exactly like the reference;
  *  - when a fields expression exists, final docs = body docs ∩ field docs;
  *  - doc rank = 1+ln(Σ page ranks) ×10 for header-page-first hits; docs
  *    are returned rank-ASCENDING (a reference quirk we preserve);
  *  - snippets/headers/foundWords/summary come from the page texts.
  */
object ResultAssembler {

  /** One evaluated document (body expression result). */
  final case class DocEval(
      docId: Long,
      name: String,
      coords: Array[Long],
      pageIds: Array[String],
      pageEnds: Array[Long],
      dl: Long,
      codeTfs: Seq[(String, Long)]) // body-scoring codes → tf in this doc

  final case class Texts(header: String, bodyPages: Seq[(String, String)])

  final case class Partial(d: DocEval, pages: ArrayBuffer[(String, ArrayBuffer[Int])])

  /** Phase 1: stream docs in docId order, apply filters + caps. Returns the
    * kept partials and the (capped) global page count. Stops consuming the
    * iterator at the page cap, so a driver-side toLocalIterator only pulls
    * the partitions it needs. */
  def selectDocs(
      docsAsc: Iterator[DocEval],
      filters: Seq[String],
      fieldDocIds: Option[Set[Long]]): (ArrayBuffer[Partial], Int) = {

    val filterPats = filters.map(f => java.util.regex.Pattern.compile(f))
    var nFoundPages = 0
    var nFoundDocs = 0
    var stop = false
    val kept = ArrayBuffer.empty[Partial]

    while (!stop && docsAsc.hasNext) {
      val d = docsAsc.next()
      if (d.coords.nonEmpty) {
        var pages = Ranker.pagesOf(d.coords, d.pageIds, d.pageEnds)
        // global page cap with the reference's mid-page cut (Search.cs:409)
        if (nFoundPages + pages.length > Consts.MaxFoundPages) {
          val room = Consts.MaxFoundPages - nFoundPages + 1 // page that overflows is kept with 1 pos
          pages = pages.take(room)
          if (pages.nonEmpty) {
            val last = pages.last
            pages(pages.length - 1) = (last._1, last._2.take(1))
          }
          stop = true
        }
        nFoundPages += pages.length
        // the 500-doc cap applies BEFORE the field-docs intersection, which
        // happens afterwards in CombineSearchResults (Search.cs:543-546)
        if (nFoundDocs < Consts.MaxFoundDocs) {
          val matched = filterPats.isEmpty || filterPats.exists(_.matcher(d.name).find())
          if (matched) {
            nFoundDocs += 1
            kept += Partial(d, pages)
          }
        }
      }
    }

    val keptFinal = fieldDocIds match {
      case Some(ids) => kept.filter(p => ids.contains(p.d.docId))
      case None => kept
    }
    (keptFinal, nFoundPages)
  }

  /** Phase 2: ranks, BM25, snippets, ordering. */
  def enrich(
      kept: ArrayBuffer[Partial],
      nFoundPages: Int,
      textsOf: Long => Option[Texts],
      bm25DfOf: String => Long,
      nDocs: Long,
      avgdl: Double,
      wordInfos: Seq[WordInfo]): SearchOut = {

    val docHits = kept.map { case Partial(d, pages) =>
      val rank = Ranker.docRank(pages.map { case (id, pos) => (id, pos.toSeq) }.toSeq)
      val bm25 = Ranker.bm25Score(d.codeTfs, bm25DfOf, nDocs, d.dl, avgdl)
      val texts = textsOf(d.docId)
      var headers = Map.empty[String, String]
      var foundWords = Seq.empty[String]
      var pageHits = pages.map { case (id, pos) =>
        PageHit(id, pos.toArray, Ranker.pageRank(pos), "")
      }
      var summary = ""
      texts.foreach { t =>
        var headerStr = t.header
        if (pages.nonEmpty && pages.head._1 == "0") {
          headerStr = Snippets.highlightAll(t.header, pages.head._2.toArray)
        }
        headers = Snippets.makeHeaders(headerStr)
        val bodyTexts = t.bodyPages.toMap
        pageHits = pageHits.filter(_.pageId != "0").map { ph =>
          bodyTexts.get(ph.pageId) match {
            case Some(txt) =>
              foundWords = (foundWords ++ Snippets.foundWords(txt, ph.pos)).distinct
              ph.copy(text = Snippets.pageText(txt, ph.pos))
            case None => ph
          }
        }
        if (pageHits.nonEmpty) {
          summary = pageHits.sortBy(_.rank).take(3).sortBy(_.pageId)
            .map(_.text).mkString(" ... ")
        }
      }
      DocHit(d.docId, d.name, rank, bm25, pageHits.toSeq, headers, foundWords, summary)
    }

    SearchOut(docHits.sortBy(_.rank).toSeq, nFoundPages, wordInfos)
  }

  /** One row of the distributed selection stream: either a fully evaluated
    * doc (a kept-candidate — within its partition's first MAX_FOUND_DOCS
    * filter-passing docs) or a count-only stub. Beyond the doc cap a doc
    * influences the result ONLY through its page count (Search.cs:365-420
    * counts pages for every matching doc but keeps at most 500), so
    * partitions ship 16-byte stubs instead of full rows for the long tail
    * of a broad query — the cap arithmetic below stays exact because stubs
    * preserve per-doc page counts in global docId order. */
  sealed trait SelIn
  final case class SelDoc(d: DocEval, inField: Boolean) extends SelIn
  final case class SelCount(docId: Long, nPages: Int) extends SelIn

  /** selectDocs variant where field-set membership arrives as a per-doc
    * flag (already capped upstream at MAX_FOUND_DOCS field docs in docId
    * order) and over-cap docs arrive as count-only stubs. Semantics
    * identical: body docs cap first, intersection after. Filter-failing
    * docs may arrive EITHER as full rows (the emitter need not evaluate
    * filters) or as stubs (when it did): both paths count their pages and
    * keep nothing. */
  def selectDocsMixed(
      rowsAsc: Iterator[SelIn],
      filters: Seq[String],
      hasFields: Boolean): (ArrayBuffer[Partial], Int) = {
    val filterPats = filters.map(f => java.util.regex.Pattern.compile(f))
    var nFoundPages = 0
    var nFoundDocs = 0
    var stop = false
    val kept = ArrayBuffer.empty[(Partial, Boolean)]
    while (!stop && rowsAsc.hasNext) {
      rowsAsc.next() match {
        case SelCount(_, n0) =>
          // a stub is never kept, so the mid-page trim reduces to count
          // arithmetic: the overflowing page contributes exactly 1
          var n = n0
          if (nFoundPages + n > Consts.MaxFoundPages) {
            n = Consts.MaxFoundPages - nFoundPages + 1
            stop = true
          }
          nFoundPages += n
        case SelDoc(d, inField) =>
          if (d.coords.nonEmpty) {
            var pages = Ranker.pagesOf(d.coords, d.pageIds, d.pageEnds)
            if (nFoundPages + pages.length > Consts.MaxFoundPages) {
              val room = Consts.MaxFoundPages - nFoundPages + 1
              pages = pages.take(room)
              if (pages.nonEmpty) {
                val last = pages.last
                pages(pages.length - 1) = (last._1, last._2.take(1))
              }
              stop = true
            }
            nFoundPages += pages.length
            if (nFoundDocs < Consts.MaxFoundDocs) {
              val matched = filterPats.isEmpty || filterPats.exists(_.matcher(d.name).find())
              if (matched) {
                nFoundDocs += 1
                kept += ((Partial(d, pages), inField))
              }
            }
          }
      }
    }
    val keptFinal = if (hasFields) kept.filter(_._2).map(_._1) else kept.map(_._1)
    (keptFinal, nFoundPages)
  }

  /** Back-compat wrapper: all rows fully evaluated. */
  def selectDocsFlagged(
      docsAsc: Iterator[(DocEval, Boolean)],
      filters: Seq[String],
      hasFields: Boolean): (ArrayBuffer[Partial], Int) =
    selectDocsMixed(docsAsc.map { case (d, f) => SelDoc(d, f) }, filters, hasFields)

  /** Length of the docId-sorted prefix a partition must contribute so the
    * GLOBAL docId-ordered page-cap scan (selectDocs) can never miss a doc:
    * keep doc i while the cumulative page count BEFORE it is ≤ cap. Local
    * cumulative ≤ global cumulative at every docId, so the kept prefix is
    * a superset of what the global scan can consume — the soundness
    * invariant behind the per-partition cuts in SparkSearcher (pinned by a
    * property test in CoreSpec). */
  def pageCapPrefix[T](sortedAsc: scala.collection.IndexedSeq[T], pagesOf: T => Int, cap: Long): Int = {
    var cum = 0L
    var i = 0
    while (i < sortedAsc.length && cum <= cap) {
      cum += pagesOf(sortedAsc(i))
      i += 1
    }
    i
  }

  /** Single-pass convenience used by the in-memory engine. */
  def assemble(
      docsAsc: Iterator[DocEval],
      filters: Seq[String],
      fieldDocIds: Option[Set[Long]],
      textsOf: Long => Option[Texts],
      bm25DfOf: String => Long,
      nDocs: Long,
      avgdl: Double,
      wordInfos: Seq[WordInfo]): SearchOut = {
    val (kept, nPages) = selectDocs(docsAsc, filters, fieldDocIds)
    enrich(kept, nPages, textsOf, bm25DfOf, nDocs, avgdl, wordInfos)
  }
}
