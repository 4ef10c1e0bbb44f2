package graft.query

import graft.core.LongVec

/** A posting coordinate sequence with the transient query attribute R
  * (proximity radius; R < 0 ⇒ ordered/"exact" combination), mirroring the
  * reference's IndexSequence query algebra
  * (/root/reference/Docodo.NET/IndexSequence.cs:161-163,218-322).
  *
  * Coordinates here are within-document character offsets (global across a
  * document's pages, page 0 = headers first), ascending. The group-building
  * `and`/`or` algorithms are semantics-exact ports — including the
  * ordered-mode rule that a left-operand coordinate prefers to start a new
  * group, and the early loop exit when a group closes after either stream
  * is exhausted — because the golden query counts depend on them.
  */
final case class PosSeq(coords: Array[Long], r: Int) {
  def isEmpty: Boolean = coords.isEmpty
  def withR(newR: Int): PosSeq = PosSeq(coords, newR)
}

object PosSeq {
  val empty: PosSeq = PosSeq(Array.emptyLongArray, 0)

  /** R combination shared by and/or: max magnitude; negative (ordered
    * mode) only when BOTH operands are ordered. */
  def combineR(ra: Int, rb: Int): Int = {
    val absR = math.max(math.abs(ra), math.abs(rb))
    if (ra < 0 && rb < 0) -absR else absR
  }

  // Per-thread scratch for and(): the out/group buffers are internal to one
  // call (toArray copies the exact-size result; and() never re-enters — its
  // operands are fully evaluated before the merge starts), and allocating
  // two growing vectors per (candidate doc × query × AND node) made GC the
  // top line of the batch eval profile.
  private val andScratch = ThreadLocal.withInitial[(LongVec, LongVec)](
    () => (new LongVec(256), new LongVec(64)))

  /** proximity-AND (`operator *`, IndexSequence.cs:218-284). */
  def and(a: PosSeq, b: PosSeq): PosSeq = {
    val absR = math.max(math.abs(a.r), math.abs(b.r))
    val r = if (a.r < 0 && b.r < 0) -absR else absR
    // one empty side ⇒ empty result (a group needs members from BOTH
    // streams — inGr0 && inGr1 can never hold); skip walking the other
    // stream into never-emitted groups
    if (a.coords.isEmpty || b.coords.isEmpty) return PosSeq(Array.emptyLongArray, r)

    val (out, group) = andScratch.get()
    out.clear(); group.clear()
    var inGr0 = false
    var inGr1 = false

    val s0 = a.coords; val s1 = b.coords
    var i0 = 0; var i1 = 0
    var move0 = true; var move1 = true
    var can0 = true; var can1 = true
    var cur0 = 0L; var cur1 = 0L
    var break = false

    while (!break && (can0 || can1)) {
      if (!move0 && !move1) { break = true }
      else {
        if (move0 && can0) { if (i0 < s0.length) { cur0 = s0(i0); i0 += 1 } else can0 = false }
        if (move1 && can1) { if (i1 < s1.length) { cur1 = s1(i1); i1 += 1 } else can1 = false }
        move0 = false; move1 = false
        if (!can0 && !can1) { break = true }
        else {
          var valToAdd = 0L
          if (!can0) { valToAdd = cur1; move1 = true }
          else if (!can1) { valToAdd = cur0; move0 = true }
          else if (java.lang.Long.compareUnsigned(cur0, cur1) < 0) { valToAdd = cur0; move0 = true }
          else if (java.lang.Long.compareUnsigned(cur0, cur1) > 0) { valToAdd = cur1; move1 = true }
          else { move0 = true; move1 = true; valToAdd = cur1 }

          var exited = false
          if (group.nonEmpty) {
            var bfinish = false
            if (absR != 0 && java.lang.Long.compareUnsigned(valToAdd - group.last, absR.toLong) > 0) bfinish = true
            else if (r < 0 && move0 && !inGr0) bfinish = true
            if (bfinish) {
              if (inGr0 && inGr1) out ++= group
              inGr0 = false; inGr1 = false; group.clear()
              if (!can0 || !can1) { break = true; exited = true }
            }
          }
          if (!exited) {
            if (move0) inGr0 = true
            if (move1) inGr1 = true
            group += valToAdd
          }
        }
      }
    }
    if (inGr0 && inGr1) out ++= group
    PosSeq(out.toArray, r)
  }

  // or() scratch, same argument as andScratch (or() never re-enters and
  // never runs inside and(), which takes fully-evaluated operands)
  private val orScratch = ThreadLocal.withInitial[LongVec](() => new LongVec(256))

  /** OR union-merge (`operator +`, IndexSequence.cs:286-322); duplicates
    * collapse when equal. */
  def or(a: PosSeq, b: PosSeq): PosSeq = {
    val absR = math.max(math.abs(a.r), math.abs(b.r))
    val r = if (a.r < 0 && b.r < 0) -absR else absR
    val s0 = a.coords; val s1 = b.coords
    // empty-side fast paths: the union IS the other operand's coordinates
    // (shared array — PosSeq is immutable and consumers only read)
    if (s0.isEmpty) return PosSeq(s1, r)
    if (s1.isEmpty) return PosSeq(s0, r)
    val out = orScratch.get()
    out.clear()
    var i0 = 0; var i1 = 0
    while (i0 < s0.length && i1 < s1.length) {
      val c = java.lang.Long.compareUnsigned(s0(i0), s1(i1))
      if (c < 0) { out += s0(i0); i0 += 1 }
      else if (c > 0) { out += s1(i1); i1 += 1 }
      else { out += s0(i0); i0 += 1; i1 += 1 }
    }
    while (i0 < s0.length) { out += s0(i0); i0 += 1 }
    while (i1 < s1.length) { out += s1(i1); i1 += 1 }
    PosSeq(out.toArray, r)
  }
}
