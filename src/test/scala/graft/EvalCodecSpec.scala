package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip pins on the hand-rolled eval-row wire codec (the selection
  * shuffle's payload). The doc NAME is user data — URLs/paths, and a
  * data: URI can exceed `DataOutputStream.writeUTF`'s 65535-byte
  * modified-UTF-8 cap — so the codec must length-prefix raw UTF-8 for it
  * (a writeUTF there fails the scan task deterministically for any batch
  * whose page-cap prefix contains such a doc).
  */
class EvalCodecSpec extends AnyFunSuite {

  private def roundTrip(e: EvalRow): EvalRow =
    SparkSearcher.decodeEval(SparkSearcher.encodeEval(e))

  test("round-trip with a >64 KB multibyte doc name (writeUTF would throw)") {
    val name = "web:data:" + ("é" * 40000) // 80 KB UTF-8, 120 KB modified-UTF-8
    val e = EvalRow(42L, Array(1L, 5L, 9L), fieldHit = true,
      leafCounts = Array(3L), codes = Array("abc", "#1f"), tfs = Array(2L, 1L),
      name = name, pageIds = Seq("1", "2"), pageEnds = Seq(100L, 200L), docLen = 321L)
    val d = roundTrip(e)
    assert(d.name == name)
    assert(d.docId == e.docId && d.fieldHit == e.fieldHit && d.docLen == e.docLen)
    assert(d.coords.toSeq == e.coords.toSeq && d.leafCounts.toSeq == e.leafCounts.toSeq)
    assert(d.codes.toSeq == e.codes.toSeq && d.tfs.toSeq == e.tfs.toSeq)
    assert(d.pageIds == e.pageIds && d.pageEnds == e.pageEnds)
  }

  test("round-trip of an ordinary row and a meta-less aggregation row") {
    val full = EvalRow(7L, Array(0L, 2L), fieldHit = false, Array(1L, 0L),
      Array("term"), Array(4L), "docs/a.txt", Seq("0"), Seq(50L), 50L)
    val f = roundTrip(full)
    assert(f.docId == full.docId && f.name == full.name && f.docLen == full.docLen)
    assert(f.coords.toSeq == full.coords.toSeq && f.codes.toSeq == full.codes.toSeq)
    assert(f.pageIds == full.pageIds && f.pageEnds == full.pageEnds)
    val bare = EvalRow(9L, Array.emptyLongArray, fieldHit = false,
      Array(0L), Array.empty, Array.emptyLongArray, "", Nil, Nil, 0L)
    val d = roundTrip(bare)
    assert(d.docId == 9L && d.name == "" && d.coords.isEmpty && d.pageIds.isEmpty)
  }
}
