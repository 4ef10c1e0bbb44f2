package graft.mem

import graft.core.{Consts, DocTokenizer}
import graft.query._
import graft.text.Analyzer
import scala.collection.mutable

/** Single-threaded in-memory engine. Two roles:
  *
  *  1. the semantics oracle: it ports the reference's observable behavior
  *     (tokenize → postings → query algebra → ranks) directly over the
  *     shared pure kernels, so the xUnit-derived golden counts run here;
  *  2. the independent scorer for the rank-identity specs: the distributed
  *     Spark engine must produce identical docIDs/scores on the same corpus
  *     (BASELINE.json north_rule).
  */
final class MemIndex(val analyzer: Analyzer) extends TermDict {

  final case class MemDoc(
      docId: Long,
      name: String,
      header: String,
      bodyPages: Seq[(String, String)],
      pageIds: Array[String],
      pageEnds: Array[Long],
      docLen: Long)

  // code -> docId -> ascending coords (TreeMap: ordinal key order like the
  // reference's SortedList with ordinal comparer, Index.cs:142-151)
  private val postings = mutable.TreeMap.empty[String, mutable.TreeMap[Long, mutable.ArrayBuffer[Long]]]
  private val docs = mutable.ArrayBuffer.empty[MemDoc]

  def nDocs: Long = docs.length.toLong
  def avgdl: Double = if (docs.isEmpty) 1.0 else docs.map(_.docLen).sum.toDouble / docs.length
  def doc(id: Long): MemDoc = docs(id.toInt)

  def addDoc(name: String, header: String, bodyPages: Seq[(String, String)]): Long = {
    val docId = docs.length.toLong
    val di = DocTokenizer.index(analyzer, header, bodyPages)
    di.postings.foreach { tp =>
      postings.getOrElseUpdate(tp.term, mutable.TreeMap.empty)
        .getOrElseUpdate(docId, mutable.ArrayBuffer.empty) += tp.coord
    }
    docs += MemDoc(docId, name, header, bodyPages, di.pageIds, di.pageEnds, di.docLen)
    docId
  }

  // --- TermDict ---
  override def existing(codes: Seq[String]): Set[String] =
    codes.filter(postings.contains).toSet

  override def likeWords(regex: String, limit: Int): Seq[String] = {
    val p = java.util.regex.Pattern.compile(regex)
    postings.keysIterator
      .filter(k => k.nonEmpty && Character.isLetter(k.charAt(0)) && p.matcher(k).find())
      .take(limit).toSeq
  }

  def cf(code: String): Long =
    postings.get(code).map(_.valuesIterator.map(_.length.toLong).sum).getOrElse(0L)

  def df(code: String): Long =
    postings.get(code).map(_.size.toLong).getOrElse(0L)

  /** suggestions for the last word of `req` ordered by cf desc, returning
    * completions (suffixes) — Search.cs:176-188. */
  def suggest(req: String, n: Int = 10): Seq[String] = {
    if (req.length < 2) return Nil
    val lastword = {
      val pieces = Analyzer.splitWordBoundaries(req).filter(_.nonEmpty)
      if (pieces.isEmpty) return Nil
      pieces.last.toLowerCase(java.util.Locale.ROOT)
    }
    if (lastword.length < 2) return Nil
    postings.keysIterator
      .filter(k => k.nonEmpty && k.charAt(0) >= 'A' && k.startsWith(lastword) && k.length > lastword.length)
      .toSeq.sortBy(k => -cf(k)).map(_.substring(lastword.length)).take(n)
  }

  /** close words by Levenshtein (Search.cs:169-174). */
  def closeWords(word: String, n: Int = 10): Seq[String] = {
    postings.keysIterator.toSeq
      .sortBy(k => levenshtein(k, word))
      .take(n)
  }

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  private def coordsOf(code: String, docId: Long): Array[Long] =
    postings.get(code).flatMap(_.get(docId)).map(_.toArray).getOrElse(Array.emptyLongArray)

  def plan(req: String, opts: SearchOptions): QueryPlan = {
    val parsed = QueryParser.parse(req, analyzer.stopWords)
    QueryPlanner.plan(parsed, analyzer, this, opts.dist)
  }

  def search(req: String, opts: SearchOptions = SearchOptions()): SearchOut = {
    val qp = plan(req, opts)
    if (qp.body.isEmpty && qp.fields.isEmpty) return SearchOut(Nil, 0, Nil)

    // candidate docs = union of docIds across all referenced codes
    val cand = mutable.SortedSet.empty[Long]
    qp.allCodes.foreach(c => postings.get(c).foreach(m => cand ++= m.keysIterator))

    val wordFound = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val scoringCodes = qp.leaves.filter(_.field.isEmpty).flatMap(_.codes).distinct

    val fieldDocs = qp.fields.map { fAst =>
      val s = mutable.LinkedHashSet.empty[Long]
      cand.iterator.foreach { d =>
        val r = qp.evalDoc(fAst, c => coordsOf(c, d))
        if (r.coords.nonEmpty && s.size < Consts.MaxFoundDocs) s += d
      }
      s.toSet
    }

    val mainAst = qp.body.orElse(qp.fields)
    val evals = cand.iterator.flatMap { d =>
      // leaf nFound accumulates the raw per-leaf counts (Search.cs:307)
      qp.leaves.foreach { lp =>
        val c = lp.seq(code => coordsOf(code, d), qp.dist).coords.length
        if (c > 0) wordFound(lp.id) = wordFound(lp.id) + c
      }
      val res = mainAst.map(a => qp.evalDoc(a, c => coordsOf(c, d))).getOrElse(PosSeq.empty)
      if (res.coords.isEmpty) None
      else {
        val md = docs(d.toInt)
        val tfs = scoringCodes.map(c => c -> coordsOf(c, d).length.toLong).filter(_._2 > 0)
        Some(ResultAssembler.DocEval(d, md.name, res.coords, md.pageIds, md.pageEnds, md.docLen, tfs))
      }
    }

    val out = ResultAssembler.assemble(
      evals,
      qp.filters,
      if (qp.body.isEmpty) None else fieldDocs, // body==fields expr → no self-intersection needed
      id => Some(ResultAssembler.Texts(docs(id.toInt).header, docs(id.toInt).bodyPages)),
      df, nDocs, avgdl,
      qp.leaves.map(lp => WordInfo(lp.word, 0L)))

    out.copy(words = qp.leaves.map(lp => WordInfo(lp.word, wordFound(lp.id))))
  }

  /** Bag-of-words BM25 top-k — the independent reference scorer for the
    * rank-identity spec (k docIds + scores, ties broken by docId asc).
    */
  def bm25TopK(queryWords: Seq[String], k: Int): Seq[(Long, Double)] = {
    val codes = queryWords.flatMap { w =>
      QueryPlanner.resolveWordCodes(w, exact0 = false, analyzer, this)._1
    }.distinct.sorted
    val scores = mutable.Map.empty[Long, Double]
    val n = nDocs
    val ad = avgdl
    codes.foreach { c =>
      postings.get(c).foreach { m =>
        val idf = Ranker.bm25Idf(n, m.size.toLong)
        m.foreach { case (d, coords) =>
          val add = idf * Ranker.bm25TfNorm(coords.length.toLong, docs(d.toInt).docLen, ad)
          scores(d) = scores.getOrElse(d, 0.0) + add
        }
      }
    }
    scores.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
  }
}
