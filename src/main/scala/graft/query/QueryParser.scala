package graft.query

import graft.core.Consts
import graft.text.Analyzer
import scala.collection.mutable.ArrayBuffer

/** Query AST. The reference has no parser-proper: it textually rewrites the
  * request into a C# expression ("A.d()*(B.d()+C.d())") and hands it to an
  * interpreter (/root/reference/Docodo.NET/Search.cs:319-363,492-501).
  * We parse the same surface syntax into an AST with identical semantics:
  * `|` = OR, adjacency = proximity-AND, parens group, `"..."` marks words
  * exact, `{field=value}` splits into a separate fields expression,
  * `-filter:` extracts doc-name regex filters, `?` is a wildcard char.
  */
sealed trait Ast
final case class LeafRef(id: Int) extends Ast
final case class AndNode(l: Ast, r: Ast) extends Ast
final case class OrNode(l: Ast, r: Ast) extends Ast

/** One query word occurrence. `exact` per the reference rule: quoted words
  * (uppercased by the rewrite) and words with no letters (digits — ToUpper
  * fixed point, Search.cs:199) are exact. */
final case class LeafSpec(id: Int, word: String, exact: Boolean, field: Option[String])

final case class ParsedQuery(
    body: Option[Ast],
    fields: Option[Ast],
    filters: Seq[String],
    leaves: IndexedSeq[LeafSpec]) {
  def isEmpty: Boolean = body.isEmpty && fields.isEmpty
}

object QueryParser {

  private val filterRe = """\B-filter:((?:[\w*?\\.()+{}/]+,?)+)""".r
  private val cleanupRe = """[^\w(){}=~?|"]|_+""".r
  private val fieldRe = """\{*(\w+)[ ]*=([\w|() ]+)\}""".r
  private val braceLeftoverRe = """\{.*\}""".r

  def parse(req0: String, stopWords: Set[String] = Set.empty): ParsedQuery = {
    var req = req0.toLowerCase(java.util.Locale.ROOT)

    // -filter: doc-name regexes (Search.cs:456-466)
    val filters = ArrayBuffer.empty[String]
    filterRe.findFirstMatchIn(req).foreach { m =>
      m.group(1).split(',').filter(_.nonEmpty).foreach(filters += _)
    }
    req = filterRe.replaceAllIn(req, " ")

    val leaves = ArrayBuffer.empty[LeafSpec]

    /** returns (expressionAst, fieldsAst) */
    def prepare(text0: String, field: Option[String], keepshort: Boolean): (Option[Ast], Option[Ast]) = {
      var text = cleanupRe.replaceAllIn(text0, " ")

      var fieldsAst: Option[Ast] = None
      if (field.isEmpty) {
        // extract {field=value} clauses; their parsed value-expressions are
        // AND-combined (Search.cs:328-338)
        text = fieldRe.replaceAllIn(text, m => {
          val (sub, _) = prepare(m.group(2), Some(m.group(1)), keepshort = true)
          (fieldsAst, sub) match {
            case (None, s) => fieldsAst = s
            case (Some(f), Some(s)) => fieldsAst = Some(AndNode(f, s))
            case _ =>
          }
          ""
        })
        text = braceLeftoverRe.replaceAllIn(text, "")
      }

      text = text.replace('?', '_')
      if (!keepshort)
        text = text.replaceAll("""\b\w{1,2}\b""", " ")
      stopWords.foreach { st =>
        text = text.replaceAll("\\b" + java.util.regex.Pattern.quote(st) + "\\b", "")
      }

      (parseExpr(text, field, leaves), fieldsAst)
    }

    val (bodyAst, fieldsAst) = prepare(req, None, keepshort = false)
    ParsedQuery(bodyAst, fieldsAst, filters.toSeq, leaves.toIndexedSeq)
  }

  /** tokenize + parse the cleaned request text. Grammar (AND binds tighter):
    * or := and ('|' and)* ; and := atom+ ; atom := word | '(' or ')'.
    * A `"` toggles exact mode (the reference uppercases the greedy span
    * between the first and last quote — for well-formed queries toggling is
    * equivalent and handles multiple phrases better).
    */
  private def parseExpr(text: String, field: Option[String], leaves: ArrayBuffer[LeafSpec]): Option[Ast] = {
    sealed trait Tok
    case class W(s: String, exact: Boolean) extends Tok
    case object LP extends Tok
    case object RP extends Tok
    case object ORB extends Tok

    val toks = ArrayBuffer.empty[Tok]
    var i = 0
    var inQuote = false
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '"') { inQuote = !inQuote; i += 1 }
      else if (c == '(') { toks += LP; i += 1 }
      else if (c == ')') { toks += RP; i += 1 }
      else if (c == '|') { toks += ORB; i += 1 }
      else if (Analyzer.isWordChar(c)) {
        val s = i
        while (i < n && Analyzer.isWordChar(text.charAt(i))) i += 1
        val w = text.substring(s, i)
        // exact if quoted, or if ToUpper is a fixed point (no letters)
        val exact = inQuote || !w.exists(Character.isLetter)
        toks += W(w, exact)
      } else i += 1
    }

    var p = 0
    def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None

    def parseOr(): Option[Ast] = {
      var left = parseAnd()
      var go = true
      while (go) peek match {
        case Some(ORB) =>
          p += 1
          val right = parseAnd()
          (left, right) match {
            case (Some(l), Some(r)) => left = Some(OrNode(l, r))
            case (None, r) => left = r
            case _ =>
          }
        case _ => go = false
      }
      left
    }

    def parseAnd(): Option[Ast] = {
      var left: Option[Ast] = None
      var go = true
      while (go) peek match {
        case Some(W(w, ex)) =>
          p += 1
          val id = leaves.length
          leaves += LeafSpec(id, w, ex, field)
          val atom: Ast = LeafRef(id)
          left = left.map(l => AndNode(l, atom)).orElse(Some(atom))
        case Some(LP) =>
          p += 1
          val inner = parseOr()
          peek match { case Some(RP) => p += 1; case _ => }
          inner.foreach { in =>
            left = left.map(l => AndNode(l, in): Ast).orElse(Some(in))
          }
        case _ => go = false
      }
      left
    }

    parseOr()
  }
}
