package graft.query

import graft.core.Consts
import scala.collection.mutable.ArrayBuffer

/** Result assembly + scoring primitives shared by the in-memory reference
  * engine and the distributed engine. All arithmetic orders and integer
  * divisions deliberately mirror the reference so ranks are bit-identical.
  */
object Ranker {

  /** Map ascending within-doc result coordinates onto pages.
    * `pageEnds(i)` is the END coordinate of page i (exclusive); page start
    * is the previous end (0 for the first). Port of IndexPageList.GetPage
    * + PrepareSearchResult's grouping
    * (/root/reference/Docodo.NET/Build.cs:74-97, Search.cs:365-411).
    */
  def pagesOf(
      coords: Array[Long],
      pageIds: Array[String],
      pageEnds: Array[Long]): ArrayBuffer[(String, ArrayBuffer[Int])] = {
    val out = ArrayBuffer.empty[(String, ArrayBuffer[Int])]
    var pi = 0
    var i = 0
    while (i < coords.length) {
      val c = coords(i)
      while (pi < pageEnds.length && pageEnds(pi) <= c) pi += 1
      if (pi < pageEnds.length) {
        val start = if (pi == 0) 0L else pageEnds(pi - 1)
        val pos = (c - start).toInt
        if (out.nonEmpty && out.last._1 == pageIds(pi)) out.last._2 += pos
        else out += ((pageIds(pi), ArrayBuffer(pos)))
      }
      i += 1
    }
    out
  }

  /** Number of page groups [[pagesOf]] would produce, without materializing
    * them — the batch emitter needs only the COUNT for page-cap arithmetic
    * on its count-only stubs. Counts page-index transitions; exact because
    * a doc's page ids are unique (builder-written page list), so pagesOf's
    * consecutive-id merge fires iff the index is unchanged. */
  def pagesHitCount(coords: Array[Long], pageEnds: Array[Long]): Int = {
    var n = 0
    var pi = 0
    var lastPi = -1
    var i = 0
    while (i < coords.length) {
      val c = coords(i)
      while (pi < pageEnds.length && pageEnds(pi) <= c) pi += 1
      if (pi < pageEnds.length && pi != lastPi) { n += 1; lastPi = pi }
      i += 1
    }
    n
  }

  /** Page rank: 1 + Σ (30 / max(5, gap)) + ln(n). NOTE `30 / max(5, gap)`
    * is INTEGER division in the reference (Search.cs:99-111) — preserved.
    * Float accumulation order preserved. */
  def pageRank(pos: scala.collection.Seq[Int]): Float = {
    var bonus = 0.0f
    if (pos.length > 1) {
      var q = 1
      while (q < pos.length) {
        bonus += (30 / math.max(5, pos(q) - pos(q - 1))).toFloat
        q += 1
      }
    }
    1.0f + bonus + math.log(pos.length.toDouble).toFloat
  }

  /** Doc rank: 1 + ln(Σ page ranks), ×10 when the first found page is the
    * header page "0" (Search.cs:552-557, Index.cs:115). */
  def docRank(pages: scala.collection.Seq[(String, _ <: scala.collection.Seq[Int])]): Float = {
    var sum = 0.0f
    pages.foreach { case (_, pos) => sum += pageRank(pos) }
    var r = 1.0f + math.log(sum.toDouble).toFloat
    if (pages.nonEmpty && pages.head._1 == "0") r *= Consts.DocRankMultiply
    r
  }

  // ---- BM25 (headline scorer; SURVEY §7.1.5) ----

  def bm25Idf(nDocs: Long, df: Long): Double =
    math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)

  def bm25TfNorm(tf: Long, dl: Long, avgdl: Double): Double = {
    val k1 = Consts.Bm25K1; val b = Consts.Bm25B
    tf.toDouble / (tf + k1 * (1 - b + b * dl / avgdl))
  }

  /** Per-doc BM25 over (code → tf) with a canonical, order-stable summation
    * (codes sorted ordinal) so distributed and single-threaded paths agree
    * bit-for-bit (SURVEY §7.4.1). */
  def bm25Score(
      codeTfs: Seq[(String, Long)],
      dfOf: String => Long,
      nDocs: Long,
      dl: Long,
      avgdl: Double): Double = {
    var s = 0.0
    codeTfs.sortBy(_._1).foreach { case (code, tf) =>
      s += bm25Idf(nDocs, dfOf(code)) * bm25TfNorm(tf, dl, avgdl)
    }
    s
  }
}
