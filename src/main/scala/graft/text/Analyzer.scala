package graft.text

import graft.core.Consts
import scala.collection.mutable.ArrayBuffer

/** Morphological vocabulary: word → group number, with a first-letter range
  * gate and an associated stemmer. Words resolving to the same group are
  * interchangeable at search time via the `#hex` term namespace.
  * Cf. /root/reference/Docodo.NET/Dict.cs:13-103.
  */
final case class Vocab(
    name: String,
    entries: Map[String, Int],
    range: (Char, Char),
    stemmerName: String = "en") extends Serializable {
  def stem(w: String): String = Analyzer.stemmerByName(stemmerName)(w)
  def search(stemmed: String): Int = entries.getOrElse(stemmed, 0)
  def inRange(c: Char): Boolean = c >= range._1 && c <= range._2
}

object Vocab {
  /** Load the reference's binary `.voc` format: repeated
    * [.NET BinaryReader string: 7-bit-varint byte length + UTF-8][Int32 LE]
    * until EOF; the range is derived like Vocab.Load
    * (/root/reference/Docodo.NET/Dict.cs:71-95). */
  def loadDocodo(in: java.io.InputStream, name: String): Vocab = {
    val data = in.readAllBytes()
    var p = 0
    val entries = Map.newBuilder[String, Int]
    var first = '\u0000'
    var last = '\u0000'
    var firstLetterSet = false
    while (p < data.length) {
      var len = 0
      var shift = 0
      var more = true
      while (more) {
        val b = data(p) & 0xFF; p += 1
        len |= (b & 0x7F) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      val s = new String(data, p, len, java.nio.charset.StandardCharsets.UTF_8)
      p += len
      val v = (data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8) |
        ((data(p + 2) & 0xFF) << 16) | ((data(p + 3) & 0xFF) << 24)
      p += 4
      entries += (s -> v)
      if (s.nonEmpty) {
        if (!firstLetterSet && s.charAt(0) >= 'a') { first = s.charAt(0); firstLetterSet = true }
        last = s.charAt(0)
      }
    }
    Vocab(name, entries.result(), (first, last), name)
  }
}

/** Tokenization + term-code expansion with the reference's observable
  * semantics:
  *
  *  - tokens = `\p{L}+|\p{N}+` over lowercased text, kept when
  *    3 ≤ len ≤ 32 (/root/reference/Docodo.NET/Build.cs:526-529);
  *  - every token indexes its full form; digit-initial tokens index raw
  *    only; stopwords drop (/root/reference/Docodo.NET/Build.cs:175-247);
  *  - if a vocab's range matches and the stem is a known group, a `#hex`
  *    group code is added (group = (vocIdx<<24)|groupNo,
  *    /root/reference/Docodo.NET/Build.cs:197);
  *  - otherwise a stemmer chosen by character-range gates the `$stem` code
  *    when stem ≠ word (/root/reference/Docodo.NET/Build.cs:207-238,
  *    ranges per /root/reference/Docodo.NET/Index.cs:175-183).
  */
final case class Analyzer(
    stopWords: Set[String] = Set.empty,
    vocabs: Seq[Vocab] = Nil,
    enableStemming: Boolean = true) extends Serializable {

  import Analyzer._

  /** (token, charOffset) over lowercased text; caller lowercases. */
  def tokenize(lowered: String): Iterator[(String, Int)] = {
    val m = tokenRe.matcher(lowered)
    new Iterator[(String, Int)] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): (String, Int) = {
        val r = (m.group(), m.start())
        has = m.find()
        r
      }
    }
  }

  /** tokens kept for body indexing (length gate) */
  def bodyTokens(lowered: String): Iterator[(String, Int)] =
    tokenize(lowered).filter { case (w, _) =>
      w.length >= Consts.MinWordLength && w.length <= Consts.MaxWordLength
    }

  /** Port of GetWordCodes (Build.cs:175-247), codes only. */
  def wordCodes(word: String): Seq[String] = {
    if (word.isEmpty) return Nil
    val c0 = word.charAt(0)
    if (c0 >= '0' && c0 <= '9') return Seq(word)
    if (stopWords.contains(word)) return Nil
    val out = new ArrayBuffer[String](2)
    out += word // full form always
    // Reference loop (Build.cs:192-204): every vocab is tried (no break);
    // `stemmed` starts as the word itself, is updated per range-matching
    // vocab, and `firststemmed` pins the first such stem for the `$stem`
    // fallback when no vocab knows the word.
    var nG = 0
    var stemmed = word
    var firstStemmed = ""
    var nVoc = 0
    vocabs.foreach { voc =>
      if (voc.inRange(c0)) {
        val st = voc.stem(word)
        if (st != null) {
          stemmed = st
          val g = voc.search(st)
          if (g != 0) {
            nG = g
            out += f"${Consts.KnownWordChar}${(nVoc << 24) | (g & 0xFFFFFF)}%X"
          }
        }
      }
      if (firstStemmed.isEmpty) firstStemmed = stemmed
      nVoc += 1
    }
    if (nG == 0 && enableStemming) {
      stemmed = if (vocabs.isEmpty) stemByRange(word) else firstStemmed
      if (stemmed.nonEmpty && stemmed != word)
        out += Consts.WordStemChar.toString + stemmed
    }
    out.toSeq
  }

  /** token counted towards BM25 doc length? (indexable, non-stop) */
  def countsForDocLen(word: String): Boolean = {
    val c0 = word.charAt(0)
    (c0 >= '0' && c0 <= '9') || !stopWords.contains(word)
  }
}

object Analyzer {
  /** identical pattern to Build.cs:526 — Java \p{L}/\p{N} are the Unicode
    * general categories, same as .NET */
  val tokenRe: java.util.regex.Pattern = java.util.regex.Pattern.compile("\\p{L}+|\\p{N}+")

  /** Stemmer range table, order-faithful to Index.cs:175-183. Languages
    * without a bundled stemmer are identity (their `$stem` code is simply
    * never emitted, which only disables morphological grouping for them).
    */
  val stemmerRanges: Seq[(String, String)] = Seq(
    "digit" -> "0-9",
    "ru" -> "а-яё",
    "en" -> "a-z",
    "de" -> "a-zẞäüö",
    "fr" -> "a-zéâàêèëçîïôûùüÿ")

  def stemmerByName(name: String): String => String = name match {
    case "en" => EnglishStemmer.stem
    case "ru" => RussianStemmer.stem
    case "de" => GermanStemmer.stem
    case "fr" => FrenchStemmer.stem
    case _ => identity
  }

  private val rangePatterns: Seq[(String, java.util.regex.Pattern)] =
    stemmerRanges.map { case (lang, r) =>
      lang -> java.util.regex.Pattern.compile("[^" + r + "]")
    }

  /** stem by the first range the word fully matches; digit range has no
    * stemmer (identity). Cf. Build.cs:214-231. Order matters exactly as in
    * the reference table: an umlaut-free German word falls into the en
    * range first (same behavior as the reference). */
  def stemByRange(word: String): String = {
    rangePatterns.find { case (_, p) => !p.matcher(word).find() } match {
      case Some(("en", _)) => EnglishStemmer.stem(word)
      case Some(("ru", _)) => RussianStemmer.stem(word)
      case Some(("de", _)) => GermanStemmer.stem(word)
      case Some(("fr", _)) => FrenchStemmer.stem(word)
      case _ => word // digit range → identity
    }
  }

  /** .NET \w-equivalent (Unicode letters, digits, underscore). */
  @inline def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Split at .NET `\b` boundaries: alternating runs of word/non-word chars
    * (leading empty piece omitted — it has length 0 and never indexes).
    * Cf. Build.cs:502 `Regex.Split(fields[1], "\\b")`.
    */
  def splitWordBoundaries(s: String): Seq[String] = {
    if (s.isEmpty) return Seq(s)
    val out = new ArrayBuffer[String]
    var start = 0
    var i = 1
    while (i < s.length) {
      if (isWordChar(s.charAt(i)) != isWordChar(s.charAt(i - 1))) {
        out += s.substring(start, i)
        start = i
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Load the reference stop-word file format: one word per line, lines
    * containing ';' are comments (Index.cs:226-235). */
  def parseStopWords(lines: Iterator[String]): Set[String] =
    lines.map(_.trim).filter(s => s.nonEmpty && !s.contains(';')).toSet
}
