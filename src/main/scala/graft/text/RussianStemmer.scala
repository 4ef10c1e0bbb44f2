package graft.text

/** Snowball Russian stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/russian/stemmer.html). The reference stems
  * Russian with Iveonik's Snowball port (/root/reference/Docodo.NET/
  * Index.cs:178); this is an independent implementation of the same public
  * algorithm, used for the `$stem` namespace of `а-яё`-range tokens.
  */
object RussianStemmer {

  private val vowels = "аеиоуыэюя".toSet

  private val perfGerund1 = Seq("вшись", "вши", "в")            // preceded by а/я
  private val perfGerund2 = Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
  private val adjective = Seq(
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом",
    "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
  private val participle1 = Seq("ющ", "нн", "вш", "ем", "щ")    // preceded by а/я
  private val participle2 = Seq("ивш", "ывш", "ующ")
  private val reflexive = Seq("ся", "сь")
  private val verb1 = Seq(                                       // preceded by а/я
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н")
  private val verb2 = Seq(
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю")
  private val noun = Seq(
    "иями", "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам",
    "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")
  private val superlative = Seq("ейше", "ейш")

  def stem(word0: String): String = {
    var w = word0.toLowerCase(java.util.Locale.ROOT).replace('ё', 'е')
    if (w.length <= 2) return w

    // RV: after the first vowel; R2: standard second region
    var rv = w.length
    var i = 0
    var found = false
    while (i < w.length && !found) { if (vowels(w.charAt(i))) { rv = i + 1; found = true }; i += 1 }
    def regionAfter(from: Int): Int = {
      var j = from
      while (j < w.length && !vowels(w.charAt(j))) j += 1
      while (j < w.length && vowels(w.charAt(j))) j += 1
      if (j < w.length) j + 1 else w.length
    }
    val r1 = regionAfter(0)
    val r2 = regionAfter(r1)

    // ending must lie entirely within RV
    def tryRemove(suffixes: Seq[String], precededByAYa: Boolean = false): Boolean = {
      // longest match first
      suffixes.sortBy(-_.length).foreach { suf =>
        if (w.endsWith(suf) && w.length - suf.length >= rv) {
          if (!precededByAYa) { w = w.dropRight(suf.length); return true }
          else {
            // the preceding а/я is part of the matched pattern, so it must
            // itself lie within RV (знает: 'а' is RV's trigger vowel, not
            // inside RV → no removal; играет: 'а' is inside RV → remove)
            val p = w.length - suf.length - 1
            if (p >= rv && (w.charAt(p) == 'а' || w.charAt(p) == 'я')) {
              w = w.dropRight(suf.length); return true
            }
          }
        }
      }
      false
    }

    // Step 1: perfective gerund, else (reflexive?) + adjectival|verb|noun
    if (!(tryRemove(perfGerund2) || tryRemove(perfGerund1, precededByAYa = true))) {
      tryRemove(reflexive)
      val adj = tryRemove(adjective)
      if (adj) {
        if (!tryRemove(participle2)) tryRemove(participle1, precededByAYa = true)
      } else if (!(tryRemove(verb2) || tryRemove(verb1, precededByAYa = true))) {
        tryRemove(noun)
      }
    }

    // Step 2: trailing и
    if (w.endsWith("и") && w.length - 1 >= rv) w = w.dropRight(1)

    // Step 3: derivational ост/ость in R2
    Seq("ость", "ост").foreach { suf =>
      if (w.endsWith(suf) && w.length - suf.length >= r2) w = w.dropRight(suf.length)
    }

    // Step 4
    if (w.endsWith("нн") && w.length - 1 >= rv) w = w.dropRight(1)
    else {
      val sup = superlative.find(suf => w.endsWith(suf) && w.length - suf.length >= rv)
      sup match {
        case Some(suf) =>
          w = w.dropRight(suf.length)
          if (w.endsWith("нн") && w.length - 1 >= rv) w = w.dropRight(1)
        case None =>
          if (w.endsWith("ь") && w.length - 1 >= rv) w = w.dropRight(1)
      }
    }
    w
  }
}
