package graft.query

import graft.core.Consts
import graft.text.Analyzer

/** Term-dictionary access needed at plan time. Implemented by the in-memory
  * reference engine and by the Spark engine (over the termstats table).
  */
trait TermDict {
  /** which of these codes exist in the dictionary */
  def existing(codes: Seq[String]): Set[String]
  /** dictionary keys whose first char is a letter and that match `regex`
    * (unanchored), in ordinal key order, capped — cf. GetLikeWords
    * (/root/reference/Docodo.NET/Search.cs:160-167). */
  def likeWords(regex: String, limit: Int): Seq[String]
}

/** A fully resolved query: every leaf knows its posting codes and its
  * proximity radius rule. Pure data — serializable into Spark closures.
  */
final case class LeafPlan(
    id: Int,
    word: String,
    exact: Boolean,
    field: Option[String],
    fieldPresent: Boolean,
    innerWordR: Int,
    codes: Array[String]) {

  /** The final R value [[seq]] assigns this leaf — a function of plan
    * constants only, and the SINGLE derivation both `seq` and
    * [[QueryPlan.staticR]] use (the AND-chain early exit's correctness
    * requires the two to agree byte-for-byte; deriving both from one
    * method makes divergence impossible).
    *
    * R handling ports SearchSequence.d (Search.cs:302-312) and SearchField
    * (Search.cs:126-155): SearchWord sets R=-1 iff exact (Search.cs:258),
    * d() converts; in the field-present case `and(fseq(r=-1),
    * word(r=innerWordR))` yields a negative R iff innerWordR < 0 (see
    * [[PosSeq.combineR]] — data-independent), then d() rewrites it; a
    * field term absent from the dictionary takes SearchField's catch path
    * (empty sequence, R=0) and d() assigns dist+len. */
  def leafR(dist: Int): Int = {
    val len = word.length
    field match {
      case Some(_) if fieldPresent =>
        if (innerWordR < 0) -len - 4 else dist + len
      case Some(_) => dist + len
      case None => if (exact) -len - 4 else dist + len
    }
  }

  /** Evaluate this leaf for one document. `coordsOf` returns the ascending
    * within-doc coordinates of a code in that document (empty if none).
    * The assigned R is [[leafR]] in every branch — see its scaladoc for
    * the reference citations.
    */
  def seq(coordsOf: String => Array[Long], dist: Int): PosSeq = {
    var merged: PosSeq = null
    var i = 0
    while (i < codes.length) {
      val s = PosSeq(coordsOf(codes(i)), 0)
      merged = if (merged == null) s else PosSeq.or(merged, s)
      i += 1
    }
    val wordSeq = if (merged == null) PosSeq.empty else merged
    val r = leafR(dist)
    field match {
      case Some(f) if fieldPresent =>
        val fseq = PosSeq(coordsOf(Consts.FieldNameChar.toString + f), -1)
        PosSeq.and(fseq, wordSeq.withR(innerWordR)).withR(r)
      case Some(_) => PosSeq.empty.withR(r)
      case None => wordSeq.withR(r)
    }
  }
}

final case class QueryPlan(
    body: Option[Ast],
    fields: Option[Ast],
    filters: Seq[String],
    leaves: IndexedSeq[LeafPlan],
    dist: Int) {

  lazy val allCodes: Array[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    leaves.foreach { lp =>
      lp.codes.foreach(out += _)
      if (lp.fieldPresent) lp.field.foreach(f => out += Consts.FieldNameChar.toString + f)
    }
    out.toArray
  }

  def evalDoc(ast: Ast, coordsOf: String => Array[Long]): PosSeq = ast match {
    case LeafRef(id) => leaves(id).seq(coordsOf, dist)
    case AndNode(l, r) =>
      val a = evalDoc(l, coordsOf)
      // and(empty, x) is empty, and every node's R is data-INdependent
      // (leaf R is a function of plan constants only; and/or combine Rs by
      // sign and max alone — see PosSeq.combineR) — so a failed link bails
      // out of the whole AND chain without evaluating the right subtree
      // (a phrase over broad words skips the remaining OR union-merges for
      // every candidate that misses the first bigram).
      if (a.coords.isEmpty) PosSeq(Array.emptyLongArray, PosSeq.combineR(a.r, staticR(r)))
      else PosSeq.and(a, evalDoc(r, coordsOf))
    case OrNode(l, r) => PosSeq.or(evalDoc(l, coordsOf), evalDoc(r, coordsOf))
  }

  /** The R attribute `evalDoc(ast)` would return, computed WITHOUT
    * evaluating — exact by construction: leaf R is [[LeafPlan.leafR]]
    * (the same method `seq` assigns from — one derivation, no mirrored
    * rules to drift), and the and/or combiners depend only on their
    * operands' Rs ([[PosSeq.combineR]], the same formula `PosSeq.and`/
    * `or` apply). */
  def staticR(ast: Ast): Int = ast match {
    case LeafRef(id) => leaves(id).leafR(dist)
    case AndNode(l, r) => PosSeq.combineR(staticR(l), staticR(r))
    case OrNode(l, r) => PosSeq.combineR(staticR(l), staticR(r))
  }

  /** [[canMatch]] compiled against a dense code-id space: `codeId` maps a
    * code to its id once (-1 = can never be present), and the returned
    * matcher tests a doc via `has(id)` only — no per-doc string hashing.
    * The batch prescreen calls canMatch (docs × queries) times per
    * partition; the string-keyed form's hash lookups dominated it. */
  def compileCanMatch(codeId: String => Int): (Int => Boolean) => Boolean = {
    def leafC(lp: LeafPlan): (Int => Boolean) => Boolean = {
      val ids = lp.codes.map(codeId)
      def anyCode(has: Int => Boolean): Boolean = {
        var i = 0
        var hit = false
        while (i < ids.length && !hit) {
          val id = ids(i); hit = id >= 0 && has(id); i += 1
        }
        hit
      }
      lp.field match {
        case Some(f) if lp.fieldPresent =>
          val fid = codeId(Consts.FieldNameChar.toString + f)
          has => fid >= 0 && has(fid) && anyCode(has)
        case Some(_) => _ => false
        case None => anyCode
      }
    }
    def c(ast: Ast): (Int => Boolean) => Boolean = ast match {
      case LeafRef(id) => leafC(leaves(id))
      case AndNode(l, r) =>
        val cl = c(l); val cr = c(r)
        has => cl(has) && cr(has)
      case OrNode(l, r) =>
        val cl = c(l); val cr = c(r)
        has => cl(has) || cr(has)
    }
    val cb = body.map(c)
    val cf = fields.map(c)
    (cb, cf) match {
      case (Some(b), Some(f)) => has => b(has) || f(has)
      case (Some(b), None) => b
      case (None, Some(f)) => f
      case (None, None) => _ => false
    }
  }

  /** Presence-only prescreen over a doc's term set: false means evalDoc is
    * guaranteed empty for both body and fields, so the doc's position bytes
    * need not be decoded at all. Sound because the PosSeq algebra's
    * emptiness composes: and(a,b) nonempty ⇒ both nonempty, or(a,b)
    * nonempty ⇒ either nonempty, and a leaf needs one of its codes (plus
    * its field marker, for field leaves) present in the doc. */
  def canMatch(has: String => Boolean): Boolean = {
    def leafB(lp: LeafPlan): Boolean = lp.field match {
      case Some(f) if lp.fieldPresent =>
        has(Consts.FieldNameChar.toString + f) && lp.codes.exists(has)
      case Some(_) => false
      case None => lp.codes.exists(has)
    }
    def b(ast: Ast): Boolean = ast match {
      case LeafRef(id) => leafB(leaves(id))
      case AndNode(l, r) => b(l) && b(r)
      case OrNode(l, r) => b(l) || b(r)
    }
    body.exists(b) || fields.exists(b)
  }
}

object QueryPlanner {

  /** Port of SearchWord's code selection (Search.cs:192-260) WITHOUT the
    * dictionary-existence filter: wildcards expand over dictionary keys
    * (exact mode); otherwise prefer "known" codes (`#group` / `$stem`) and
    * fall back to the first self code.
    */
  def chooseCodes(
      word0: String,
      exact0: Boolean,
      an: Analyzer,
      dict: TermDict): (Seq[String], Boolean) = {
    var exact = exact0
    val word = word0.toLowerCase(java.util.Locale.ROOT)
    var words: Seq[String] = Seq(word)
    if (word.indexOf('_') >= 0) {
      exact = true
      words = dict.likeWords(word.replace("_", ".*"), Consts.MaxLikeWords)
    }
    val chosen = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach { w =>
      val codes = an.wordCodes(w)
      val (selfCodes, knowCodes) = codes.partition(c => c.nonEmpty && Analyzer.isWordChar(c.charAt(0)))
      val picked =
        if (!exact) { if (knowCodes.nonEmpty) knowCodes else selfCodes.take(1) }
        else selfCodes.take(1)
      picked.foreach(chosen += _)
    }
    (chosen.toSeq, exact)
  }

  /** chooseCodes + dictionary-existence filter (one dict round-trip). */
  def resolveWordCodes(
      word0: String,
      exact0: Boolean,
      an: Analyzer,
      dict: TermDict): (Seq[String], Boolean) = {
    val (chosen, exact) = chooseCodes(word0, exact0, an, dict)
    val present = dict.existing(chosen)
    (chosen.filter(present), exact)
  }

  /** Resolve all leaves with a single existence round-trip to the
    * dictionary (one small Spark job instead of one per leaf). */
  def plan(parsed: ParsedQuery, an: Analyzer, dict: TermDict, dist: Int): QueryPlan = {
    val fieldCodes = parsed.leaves.flatMap(_.field).distinct
      .map(f => Consts.FieldNameChar.toString + f)
    val prelim = parsed.leaves.map(spec => spec -> chooseCodes(spec.word, spec.exact, an, dict))
    val allCandidates = (prelim.flatMap(_._2._1) ++ fieldCodes).distinct
    val present = dict.existing(allCandidates)
    val leafPlans = prelim.map { case (spec, (chosen, exact)) =>
      val innerWordR = if (exact) -1 else 0
      LeafPlan(spec.id, spec.word, exact, spec.field,
        spec.field.exists(f => present.contains(Consts.FieldNameChar.toString + f)),
        innerWordR, chosen.filter(present).toArray)
    }
    QueryPlan(parsed.body, parsed.fields, parsed.filters, leafPlans, dist)
  }
}
