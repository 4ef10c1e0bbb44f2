package graft

import graft.query.ResultAssembler
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the per-partition page-cap cut soundness invariant:
  * merging each partition's pageCapPrefix MUST let the global docId-ordered
  * page-cap scan consume exactly the same docs (and count exactly the same
  * pages) as scanning the full uncut stream — for ANY distribution of docs,
  * page counts, partition assignments and caps. 500 seeded random trials.
  */
class PageCapPropertySpec extends AnyFunSuite {

  /** the global scan's consumption semantics (selectDocs): consume docs in
    * ascending docId while the cumulative page count BEFORE each is ≤ cap;
    * returns (consumed docIds, total pages counted with the mid-page cut). */
  private def globalConsume(sorted: Seq[(Long, Int)], cap: Long): (Seq[Long], Long) = {
    var cum = 0L
    val out = Seq.newBuilder[Long]
    var stopped = false
    sorted.foreach { case (d, p) =>
      if (!stopped) {
        if (cum + p > cap) {
          // mid-page cut: the overflowing doc is consumed truncated
          out += d
          cum = cap + 1
          stopped = true
        } else {
          out += d
          cum += p
        }
      }
    }
    (out.result(), cum)
  }

  test("per-partition pageCapPrefix merge ≡ full-stream scan (500 random trials)") {
    val rnd = new scala.util.Random(20260817)
    for (trial <- 0 until 500) {
      val n = rnd.nextInt(200)
      val nParts = 1 + rnd.nextInt(8)
      val cap = rnd.nextInt(60).toLong // small caps bind often
      // unique docIds, page counts ≥ 1, random partition assignment
      val docs = rnd.shuffle((0 until n).toList).map(_.toLong)
        .map(d => (d, 1 + rnd.nextInt(7), rnd.nextInt(nParts)))
      val full = docs.map(t => (t._1, t._2)).sortBy(_._1)
      val merged = (0 until nParts).flatMap { p =>
        val part = docs.filter(_._3 == p).map(t => (t._1, t._2)).sortBy(_._1).toIndexedSeq
        val keep = ResultAssembler.pageCapPrefix[(Long, Int)](part, _._2, cap)
        part.take(keep)
      }.sortBy(_._1)
      val (fullDocs, fullPages) = globalConsume(full, cap)
      val (cutDocs, cutPages) = globalConsume(merged, cap)
      assert(fullDocs == cutDocs,
        s"trial $trial: consumed docs diverge (n=$n parts=$nParts cap=$cap)")
      assert(fullPages == cutPages,
        s"trial $trial: page counts diverge (n=$n parts=$nParts cap=$cap)")
    }
  }
}
