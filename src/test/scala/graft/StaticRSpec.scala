package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query._

/** Property pin for the AND-chain early exit in [[QueryPlan.evalDoc]]:
  * the bail-out substitutes [[QueryPlan.staticR]] for the R the skipped
  * right subtree would have produced, so staticR and the evaluated R must
  * agree byte-for-byte on EVERY plan shape — and the short-circuiting
  * evalDoc must equal a non-short-circuit evaluation exactly (coords and
  * R both). Both are derived from one method ([[LeafPlan.leafR]]) since
  * round 5, but this spec is the ground-truth guard: it evaluates the
  * reference way (plain PosSeq.and/or over leaf seqs, no bail-out) and
  * compares across randomized plans, ASTs, and documents — including
  * empty-coordinate docs that force the bail-out path.
  */
class StaticRSpec extends AnyFunSuite {

  /** Non-short-circuit reference evaluator: exactly the PosSeq algebra
    * with no early exit anywhere. */
  private def evalFull(qp: QueryPlan, ast: Ast, coordsOf: String => Array[Long]): PosSeq =
    ast match {
      case LeafRef(id) => qp.leaves(id).seq(coordsOf, qp.dist)
      case AndNode(l, r) => PosSeq.and(evalFull(qp, l, coordsOf), evalFull(qp, r, coordsOf))
      case OrNode(l, r) => PosSeq.or(evalFull(qp, l, coordsOf), evalFull(qp, r, coordsOf))
    }

  test("staticR == evaluated R and evalDoc == non-short-circuit eval, randomized") {
    val rnd = new scala.util.Random(20260819L)
    for (trial <- 0 until 400) {
      val dist = Seq(0, 1, 5, 10)(rnd.nextInt(4))
      val nLeaves = 1 + rnd.nextInt(4)
      val leaves = (0 until nLeaves).map { id =>
        val exact = rnd.nextBoolean()
        val word = ("w" * (3 + rnd.nextInt(6))) + id
        val field = if (rnd.nextInt(4) == 0) Some("f" + rnd.nextInt(2)) else None
        val fieldPresent = field.isDefined && rnd.nextBoolean()
        val codes = (0 until 1 + rnd.nextInt(3)).map(c => s"c${id}_$c").toArray
        LeafPlan(id, word, exact, field, fieldPresent,
          innerWordR = if (exact) -1 else 0, codes = codes)
      }
      def randAst(depth: Int): Ast =
        if (depth == 0 || rnd.nextInt(3) == 0) LeafRef(rnd.nextInt(nLeaves))
        else if (rnd.nextBoolean()) AndNode(randAst(depth - 1), randAst(depth - 1))
        else OrNode(randAst(depth - 1), randAst(depth - 1))
      val ast = randAst(2 + rnd.nextInt(2))
      val qp = QueryPlan(Some(ast), None, Nil, leaves, dist)

      // randomized doc: some codes empty (forces the AND bail-out), some
      // populated with ascending distinct coords
      val coordMap = scala.collection.mutable.HashMap.empty[String, Array[Long]]
      def coordsOf(code: String): Array[Long] = coordMap.getOrElseUpdate(code, {
        if (rnd.nextInt(3) == 0) Array.emptyLongArray
        else {
          val n = 1 + rnd.nextInt(6)
          val s = scala.collection.mutable.SortedSet.empty[Long]
          while (s.size < n) s += rnd.nextInt(200).toLong
          s.toArray
        }
      })

      val full = evalFull(qp, ast, coordsOf)
      val short = qp.evalDoc(ast, coordsOf)
      assert(qp.staticR(ast) == full.r,
        s"trial $trial: staticR ${qp.staticR(ast)} != evaluated R ${full.r} ($qp)")
      assert(short.r == full.r,
        s"trial $trial: evalDoc R ${short.r} != reference R ${full.r}")
      assert(short.coords.toSeq == full.coords.toSeq,
        s"trial $trial: evalDoc coords diverge from non-short-circuit eval")
    }
  }
}
