package graft.text

/** Porter2 ("Snowball English") stemmer, implemented from the published
  * algorithm description (snowballstem.org/algorithms/english/stemmer.html).
  *
  * The reference engine stems with Iveonik's Snowball English port
  * (/root/reference/Docodo.NET/Index.cs:179-183); this is an independent
  * implementation of the same public algorithm. Stemmed forms are indexed
  * under the `$stem` term namespace
  * (/root/reference/Docodo.NET/Build.cs:236-237).
  */
object EnglishStemmer {

  private val vowels = "aeiouy".toSet
  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEndings = "cdeghkmnrt".toSet

  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  @inline private def isV(w: String, i: Int): Boolean =
    i >= 0 && i < w.length && vowels.contains(Character.toLowerCase(w.charAt(i))) && w.charAt(i) != 'Y'

  /** true vowel check treating 'Y' (marked consonant y) as consonant */
  @inline private def isVowel(c: Char): Boolean = vowels.contains(c) // lowercase only

  private def markYs(w0: String): String = {
    val sb = new StringBuilder(w0)
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    sb.toString
  }

  /** region start: position after the first non-vowel following a vowel,
    * scanning from `from`; length if none. */
  private def regionStart(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isV(w, i)) i += 1
    while (i < w.length && isV(w, i)) i += 1
    if (i < w.length) i + 1 else w.length
  }

  private def r1Start(w: String): Int = {
    if (w.startsWith("gener")) 5
    else if (w.startsWith("commun")) 6
    else if (w.startsWith("arsen")) 5
    else regionStart(w, 0)
  }

  /** ends in a short syllable */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isV(w, 0) && !isV(w, 1)
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      isV(w, n - 2) && !isV(w, n - 1) && c != 'w' && c != 'x' && c != 'Y' && !isV(w, n - 3)
    } else false
  }

  private def containsVowel(w: String, until: Int): Boolean = {
    var i = 0
    while (i < until) { if (isV(w, i)) return true; i += 1 }
    false
  }

  def stem(word0: String): String = {
    if (word0.length <= 2) return word0
    var w = word0.toLowerCase(java.util.Locale.ROOT)
    exceptions1.get(w) match {
      case Some(s) => return s
      case None =>
    }
    if (w.startsWith("'")) w = w.substring(1)
    w = markYs(w)
    val r1 = r1Start(w)
    val r2 = regionStart(w, r1)

    @inline def inR1(suffLen: Int): Boolean = w.length - suffLen >= r1
    @inline def inR2(suffLen: Int): Boolean = w.length - suffLen >= r2

    // Step 0
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("ss") || w.endsWith("us")) { /* nothing */ }
    else if (w.endsWith("s")) {
      // delete if the preceding word part contains a vowel not immediately
      // before the s
      if (containsVowel(w, w.length - 2)) w = w.dropRight(1)
    }

    if (exceptions2.contains(w)) return w.replace('Y', 'y')

    // Step 1b
    val s1b = Seq("eedly", "eed", "ingly", "edly", "ing", "ed")
    var done1b = false
    for (suf <- s1b if !done1b && w.endsWith(suf)) {
      done1b = true
      if (suf == "eed" || suf == "eedly") {
        if (inR1(suf.length)) w = w.dropRight(suf.length) + "ee"
      } else {
        val stemPart = w.dropRight(suf.length)
        if (containsVowel(stemPart, stemPart.length)) {
          w = stemPart
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
          else if (w.length >= 2 && doubles.contains(w.substring(w.length - 2))) w = w.dropRight(1)
          else if (endsShortSyllable(w) && w.length <= r1) w = w + "e" // short word: R1 empty
        }
      }
    }

    // Step 1c: replace y/Y by i if preceded by non-vowel which is not the
    // first letter of the word
    if (w.length > 2) {
      val c = w.charAt(w.length - 1)
      if ((c == 'y' || c == 'Y') && !isV(w, w.length - 2)) {
        w = w.dropRight(1) + "i"
      }
    }

    // Step 2 (longest suffix, in R1)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "OGI", "li" -> "LI")
    var done2 = false
    for ((suf, rep) <- step2 if !done2 && w.endsWith(suf)) {
      done2 = true
      if (inR1(suf.length)) {
        rep match {
          case "OGI" =>
            if (w.length > suf.length && w.charAt(w.length - suf.length - 1) == 'l')
              w = w.dropRight(suf.length) + "og"
          case "LI" =>
            if (w.length > suf.length && liEndings.contains(w.charAt(w.length - suf.length - 1)))
              w = w.dropRight(suf.length)
          case r => w = w.dropRight(suf.length) + r
        }
      }
    }

    // Step 3 (in R1)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic",
      "ative" -> "ATIVE", "ful" -> "", "ness" -> "")
    var done3 = false
    for ((suf, rep) <- step3 if !done3 && w.endsWith(suf)) {
      done3 = true
      if (inR1(suf.length)) {
        if (rep == "ATIVE") {
          if (inR2(suf.length)) w = w.dropRight(suf.length)
        } else w = w.dropRight(suf.length) + rep
      }
    }

    // Step 4 (in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
      "ion", "al", "er", "ic")
    var done4 = false
    for (suf <- step4 if !done4 && w.endsWith(suf)) {
      done4 = true
      if (inR2(suf.length)) {
        if (suf == "ion") {
          val pc = if (w.length > 3) w.charAt(w.length - 4) else ' '
          if (pc == 's' || pc == 't') w = w.dropRight(3)
        } else w = w.dropRight(suf.length)
      }
    }

    // Step 5
    if (w.endsWith("e")) {
      if (inR2(1)) w = w.dropRight(1)
      else if (inR1(1) && !endsShortSyllable(w.dropRight(1))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(1) && w.length > 1 && w.charAt(w.length - 2) == 'l') w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }
}
