package graft.text

/** French Snowball stemmer, implemented from the published algorithm
  * description (snowballstem.org "French stemming algorithm"). Fills the
  * reference's fr slot in the stemmer range table
  * (/root/reference/Docodo.NET/Index.cs:175-183) — an independent
  * implementation of the public algorithm.
  *
  * Longest-suffix-wins per step; a matched suffix whose region condition
  * fails removes nothing (no fallthrough to shorter suffixes), as in the
  * published algorithm.
  */
object FrenchStemmer {

  private val vowels = "aeiouyâàëéêèïîôûù".toSet
  private def isV(c: Char): Boolean = vowels.contains(c)

  def stem(word0: String): String = {
    if (word0.length < 2) return word0
    val src = word0.toCharArray
    val n = src.length
    // prelude: u/i between vowels → U/I; y next to a vowel → Y; u after q → U
    val marked = src.clone()
    var i = 0
    while (i < n) {
      val c = src(i)
      if ((c == 'u' || c == 'i') && i > 0 && i < n - 1 && isV(src(i - 1)) && isV(src(i + 1)))
        marked(i) = c.toUpper
      else if (c == 'y' && ((i > 0 && isV(src(i - 1))) || (i < n - 1 && isV(src(i + 1)))))
        marked(i) = 'Y'
      else if (c == 'u' && i > 0 && src(i - 1) == 'q')
        marked(i) = 'U'
      i += 1
    }
    var w = new String(marked)

    def vAt(s: String, j: Int): Boolean = j >= 0 && j < s.length && isV(s.charAt(j))

    // RV
    val rv: Int = {
      if (w.length >= 3 && vAt(w, 0) && vAt(w, 1)) 3
      else if (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap")) 3
      else {
        var j = 1
        while (j < w.length && !vAt(w, j)) j += 1
        if (j >= w.length) w.length else j + 1
      }
    }
    def regionAfter(from: Int): Int = {
      var j = from
      while (j < w.length && !vAt(w, j)) j += 1
      while (j < w.length && vAt(w, j)) j += 1
      if (j >= w.length) w.length else j + 1
    }
    val r1 = regionAfter(0)
    val r2 = regionAfter(r1)

    def endPos(sufLen: Int): Int = w.length - sufLen
    def inRV(sufLen: Int): Boolean = endPos(sufLen) >= rv
    def inR1(sufLen: Int): Boolean = endPos(sufLen) >= r1
    def inR2(sufLen: Int): Boolean = endPos(sufLen) >= r2
    def drop(k: Int): Unit = w = w.substring(0, w.length - k)
    def replaceSuffix(sufLen: Int, by: String): Unit =
      w = w.substring(0, w.length - sufLen) + by

    var changed = false
    var forceStep2a = false
    var step1Removed = false

    // ---- step 1: standard suffixes (longest match wins) ----
    locally {
      val cands: Seq[(String, Int)] = Seq(
        // (suffix, group)
        "issements" -> 12, "issement" -> 12,
        "atrices" -> 2, "atrice" -> 2, "ateurs" -> 2, "ateur" -> 2,
        "ations" -> 2, "ation" -> 2,
        "logies" -> 3, "logie" -> 3,
        "usions" -> 4, "usion" -> 4, "utions" -> 4, "ution" -> 4,
        "ences" -> 5, "ence" -> 5,
        "ements" -> 6, "ement" -> 6,
        "ités" -> 7, "ité" -> 7,
        "ives" -> 8, "ifs" -> 8, "ive" -> 8, "if" -> 8,
        "eaux" -> 9, "aux" -> 10,
        "euses" -> 11, "euse" -> 11,
        "amment" -> 13, "emment" -> 14,
        "ments" -> 15, "ment" -> 15,
        "ances" -> 1, "ance" -> 1, "iqUes" -> 1, "iqUe" -> 1,
        "ismes" -> 1, "isme" -> 1, "ables" -> 1, "able" -> 1,
        "istes" -> 1, "iste" -> 1, "eux" -> 1
      ).sortBy(-_._1.length)
      cands.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, grp) =>
        val L = suf.length
        grp match {
          case 1 => if (inR2(L)) { drop(L); changed = true; step1Removed = true }
          case 2 => if (inR2(L)) {
            drop(L); changed = true; step1Removed = true
            if (w.endsWith("ic")) {
              if (inR2(2)) drop(2) else replaceSuffix(2, "iqU")
            }
          }
          case 3 => if (inR2(L)) { replaceSuffix(L, "log"); changed = true; step1Removed = true }
          case 4 => if (inR2(L)) { replaceSuffix(L, "u"); changed = true; step1Removed = true }
          case 5 => if (inR2(L)) { replaceSuffix(L, "ent"); changed = true; step1Removed = true }
          case 6 => if (inRV(L)) {
            drop(L); changed = true; step1Removed = true
            if (w.endsWith("iv") && inR2(2)) {
              drop(2)
              if (w.endsWith("at") && inR2(2)) drop(2)
            } else if (w.endsWith("eus")) {
              if (inR2(3)) drop(3) else if (inR1(3)) replaceSuffix(3, "eux")
            } else if ((w.endsWith("abl") || w.endsWith("iqU")) && inR2(3)) drop(3)
            else if ((w.endsWith("ièr") || w.endsWith("Ièr")) && inRV(3)) replaceSuffix(3, "i")
          }
          case 7 => if (inR2(L)) {
            drop(L); changed = true; step1Removed = true
            if (w.endsWith("abil")) {
              if (inR2(4)) drop(4) else replaceSuffix(4, "abl")
            } else if (w.endsWith("ic")) {
              if (inR2(2)) drop(2) else replaceSuffix(2, "iqU")
            } else if (w.endsWith("iv") && inR2(2)) drop(2)
          }
          case 8 => if (inR2(L)) {
            drop(L); changed = true; step1Removed = true
            if (w.endsWith("at") && inR2(2)) {
              drop(2)
              if (w.endsWith("ic")) {
                if (inR2(2)) drop(2) else replaceSuffix(2, "iqU")
              }
            }
          }
          case 9 => { replaceSuffix(4, "eau"); changed = true; step1Removed = true }
          case 10 => if (inR1(3)) { replaceSuffix(3, "al"); changed = true; step1Removed = true }
          case 11 =>
            if (inR2(L)) { drop(L); changed = true; step1Removed = true }
            else if (inR1(L)) { replaceSuffix(L, "eux"); changed = true; step1Removed = true }
          case 12 =>
            if (inR1(L) && endPos(L) > 0 && !isV(w.charAt(endPos(L) - 1))) {
              drop(L); changed = true; step1Removed = true
            }
          case 13 => if (inRV(L)) {
            replaceSuffix(L, "ant"); changed = true; step1Removed = true; forceStep2a = true
          }
          case 14 => if (inRV(L)) {
            replaceSuffix(L, "ent"); changed = true; step1Removed = true; forceStep2a = true
          }
          case 15 =>
            // delete if preceded by a vowel in RV
            if (endPos(L) > 0 && isV(w.charAt(endPos(L) - 1)) && endPos(L) - 1 >= rv) {
              drop(L); changed = true; step1Removed = true; forceStep2a = true
            }
          case _ =>
        }
      }
    }

    // ---- steps 2a / 2b: verb suffixes (confined to RV) ----
    if (!step1Removed || forceStep2a) {
      var removed2a = false
      locally {
        val sufs = Seq(
          "issaIent", "issantes", "issions", "issante", "issants", "issons",
          "issais", "issait", "issant", "issent", "issiez", "irions",
          "iraIent", "isses", "issez", "irais", "irait", "irent", "iriez",
          "irons", "iront", "isse", "îmes", "îtes", "irai", "iras", "irez",
          "ies", "ira", "ît", "ie", "ir", "is", "it", "i"
        ).sortBy(-_.length)
        sufs.find(w.endsWith).foreach { suf =>
          val L = suf.length
          val p = endPos(L) - 1
          if (inRV(L) && p >= rv && p >= 0 && !isV(w.charAt(p))) {
            drop(L); changed = true; removed2a = true
          }
        }
      }
      if (!removed2a && step1Removed && forceStep2a) {
        // amment/emment/ment(s) handled in step 1; nothing further here
      }
      if (!removed2a) {
        // step 2b
        val listE = Set("é", "ée", "ées", "és", "èrent", "er", "era", "erai",
          "eraIent", "erais", "erait", "eras", "erez", "eriez", "erions",
          "erons", "eront", "ez", "iez")
        val listA = Set("âmes", "ât", "âtes", "a", "ai", "aIent", "ais",
          "ait", "ant", "ante", "antes", "ants", "as", "asse", "assent",
          "asses", "assiez", "assions")
        val all = (listE.map(_ -> 'e') ++ listA.map(_ -> 'a') + ("ions" -> 'i'))
          .toSeq.sortBy(-_._1.length)
        all.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, grp) =>
          val L = suf.length
          grp match {
            case 'i' => if (inR2(L)) { drop(L); changed = true }
            case 'e' => if (inRV(L)) { drop(L); changed = true }
            case 'a' => if (inRV(L)) {
              drop(L); changed = true
              if (w.endsWith("e") && inRV(1)) drop(1)
            }
          }
        }
      }
    }

    if (changed) {
      // step 3
      if (w.endsWith("Y")) replaceSuffix(1, "i")
      else if (w.endsWith("ç")) replaceSuffix(1, "c")
    } else {
      // step 4
      if (w.endsWith("s") && w.length >= 2 &&
        !"aiouès".contains(w.charAt(w.length - 2))) { drop(1); changed = true }
      locally {
        val cands = Seq("ière", "Ière", "ion", "ier", "Ier", "ë", "e").sortBy(-_.length)
        cands.find(w.endsWith).foreach { suf =>
          val L = suf.length
          suf match {
            case "ion" =>
              if (inR2(L) && endPos(L) > 0 &&
                (w.charAt(endPos(L) - 1) == 's' || w.charAt(endPos(L) - 1) == 't')) {
                drop(L); changed = true
              }
            case "ier" | "ière" | "Ier" | "Ière" =>
              if (inRV(L)) { replaceSuffix(L, "i"); changed = true }
            case "e" => if (inRV(1)) { drop(1); changed = true }
            case "ë" => if (w.endsWith("guë") && inRV(1)) { drop(1); changed = true }
            case _ =>
          }
        }
      }
    }

    // step 5: undouble
    if (w.endsWith("enn") || w.endsWith("onn") || w.endsWith("ett") ||
      w.endsWith("ell") || w.endsWith("eill")) drop(1)

    // step 6: un-accent é/è followed only by non-vowels at the end
    locally {
      var j = w.length - 1
      var sawNonVowel = false
      var done = false
      while (j >= 0 && !done) {
        val c = w.charAt(j)
        if (!isV(c)) { sawNonVowel = true; j -= 1 }
        else {
          if (sawNonVowel && (c == 'é' || c == 'è'))
            w = w.substring(0, j) + 'e' + w.substring(j + 1)
          done = true
        }
      }
    }

    // postlude
    w.map {
      case 'U' => 'u'
      case 'I' => 'i'
      case 'Y' => 'y'
      case c => c
    }
  }
}
