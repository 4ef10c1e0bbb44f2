package graft.text

/** German Snowball stemmer, implemented from the published algorithm
  * description (snowballstem.org "German stemming algorithm"). Fills the
  * reference's de slot in the stemmer range table
  * (/root/reference/Docodo.NET/Index.cs:175-183, which bundles a German
  * Snowball port) — this is an independent implementation of the public
  * algorithm, not a translation of that library.
  */
object GermanStemmer {

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
      c == 'y' || c == 'ä' || c == 'ö' || c == 'ü'

  private val sEndings = "bdfghklmnrt".toSet
  private val stEndings = "bdfghklmnt".toSet

  def stem(word0: String): String = {
    if (word0.length < 2) return word0
    // ß → ss; mark u/y between vowels as consonants (upper case)
    val pre = word0.replace("ß", "ss")
    val chars = pre.toCharArray
    var i = 1
    while (i < chars.length - 1) {
      val c = chars(i)
      if ((c == 'u' || c == 'y') && isVowel(chars(i - 1)) && isVowel(chars(i + 1)))
        chars(i) = c.toUpper
      i += 1
    }
    var w = new String(chars)

    def regionAfterNonVowelAfterVowel(from: Int): Int = {
      var j = from
      // find a vowel
      while (j < w.length && !isVowel(w.charAt(j))) j += 1
      // then a non-vowel
      while (j < w.length && isVowel(w.charAt(j))) j += 1
      if (j >= w.length) w.length else j + 1
    }
    var r1 = regionAfterNonVowelAfterVowel(0)
    if (r1 < 3) r1 = 3 // region before R1 must contain ≥3 letters
    val r2 = regionAfterNonVowelAfterVowel(r1)

    def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2
    def drop(n: Int): Unit = w = w.substring(0, w.length - n)

    // step 1: longest of (a) em ern er | (b) e en es | (c) s (valid s-ending)
    locally {
      val s1a = Seq("ern", "em", "er")
      val s1b = Seq("en", "es", "e")
      val all = (s1a.map(_ -> 'a') ++ s1b.map(_ -> 'b') ++ Seq("s" -> 'c'))
        .sortBy(-_._1.length)
      all.find { case (suf, _) => w.endsWith(suf) } match {
        case Some((suf, grp)) =>
          grp match {
            case 'a' => if (inR1(suf.length)) drop(suf.length)
            case 'b' =>
              if (inR1(suf.length)) {
                drop(suf.length)
                if (w.endsWith("niss")) drop(1) // bedürfnissen → bedürfnis
              }
            case 'c' =>
              if (inR1(1) && w.length >= 2 && sEndings.contains(w.charAt(w.length - 2)))
                drop(1)
          }
        case None =>
      }
    }

    // step 2: longest of (a) en er est | (b) st (valid st-ending, ≥3 before)
    locally {
      val all = (Seq("est", "en", "er").map(_ -> 'a') :+ ("st" -> 'b'))
        .sortBy(-_._1.length)
      all.find { case (suf, _) => w.endsWith(suf) } match {
        case Some((suf, grp)) =>
          grp match {
            case 'a' => if (inR1(suf.length)) drop(suf.length)
            case 'b' =>
              if (inR1(2) && w.length >= 6 &&
                stEndings.contains(w.charAt(w.length - 3))) drop(2)
          }
        case None =>
      }
    }

    // step 3: d-suffixes
    if (w.endsWith("end") || w.endsWith("ung")) {
      if (inR2(3)) {
        drop(3)
        if (w.endsWith("ig") && inR2(2) &&
          !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) drop(2)
      }
    } else if (w.endsWith("isch")) {
      if (inR2(4) && !(w.length >= 5 && w.charAt(w.length - 5) == 'e')) drop(4)
    } else if (w.endsWith("ig") || w.endsWith("ik")) {
      if (inR2(2) && !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) drop(2)
    } else if (w.endsWith("lich") || w.endsWith("heit")) {
      if (inR2(4)) {
        drop(4)
        if ((w.endsWith("er") || w.endsWith("en")) && inR1(2)) drop(2)
      }
    } else if (w.endsWith("keit")) {
      if (inR2(4)) {
        drop(4)
        if (w.endsWith("lich") && inR2(4)) drop(4)
        else if (w.endsWith("ig") && inR2(2)) drop(2)
      }
    }

    // finally: unmark U/Y, strip umlauts
    val out = new StringBuilder(w.length)
    w.foreach {
      case 'U' => out.append('u')
      case 'Y' => out.append('y')
      case 'ä' => out.append('a')
      case 'ö' => out.append('o')
      case 'ü' => out.append('u')
      case c => out.append(c)
    }
    out.toString
  }
}
