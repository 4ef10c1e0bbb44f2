package graft

import graft.text.{Analyzer, FrenchStemmer, GermanStemmer, VocBuilder, Vocab}
import org.scalatest.funsuite.AnyFunSuite

/** de/fr Snowball stemmers (the reference's remaining bundled-stemmer
  * slots, Index.cs:175-183) + vocab building (Dict.cs:109-270 counterpart).
  */
class StemmerSpec extends AnyFunSuite {

  test("german: suffix stripping, umlaut removal, paradigm grouping") {
    assert(GermanStemmer.stem("häuser") == "haus")
    assert(GermanStemmer.stem("haus") == "haus")
    assert(GermanStemmer.stem("katzen") == "katz")
    assert(GermanStemmer.stem("katze") == "katz")
    assert(GermanStemmer.stem("bücher") == "buch")
    assert(GermanStemmer.stem("buch") == "buch")
    assert(GermanStemmer.stem("aufeinander") == "aufeinand")
    // ß → ss
    assert(GermanStemmer.stem("straße") == GermanStemmer.stem("strasse"))
    // step-2 st after valid st-ending
    assert(GermanStemmer.stem("schönsten") == GermanStemmer.stem("schön"))
    // paradigms collapse
    assert(GermanStemmer.stem("arbeiten") == GermanStemmer.stem("arbeitest"))
    assert(GermanStemmer.stem("kindern") == GermanStemmer.stem("kinder"))
  }

  test("french: verb/noun suffixes, accents, paradigm grouping") {
    assert(FrenchStemmer.stem("chanter") == "chant")
    assert(FrenchStemmer.stem("chantais") == "chant")
    assert(FrenchStemmer.stem("chantant") == "chant")
    assert(FrenchStemmer.stem("chante") == "chant")
    assert(FrenchStemmer.stem("nationaux") == FrenchStemmer.stem("nationale"))
    assert(FrenchStemmer.stem("continuité") == "continu")
    assert(FrenchStemmer.stem("continue") == "continu")
    // prelude Y marking + step 3
    assert(FrenchStemmer.stem("employer") == "emploi")
    // eaux → eau
    assert(FrenchStemmer.stem("châteaux") == FrenchStemmer.stem("château"))
  }

  test("analyzer ranges route de/fr words to their stemmers") {
    val an = Analyzer()
    // ä forces the de range (en range a-z rejects it)
    assert(an.wordCodes("häuser") == Seq("häuser", "$haus"))
    // é forces the fr range
    assert(an.wordCodes("continuité") == Seq("continuité", "$continu"))
  }

  test("vocab build → .voc binary → load → #group codes round-trip") {
    val lemmas = Seq(
      "run\trunning runs ran",
      "house\thouses housing",
      "; comment line",
      "game\tgames gaming").iterator
    val entries = VocBuilder.fromLemmaLines(lemmas, "en")
    // stems of all forms of one lemma share its group
    val tmp = java.nio.file.Files.createTempFile("graft-voc", ".voc")
    val os = java.nio.file.Files.newOutputStream(tmp)
    try VocBuilder.writeDocodo(entries, os) finally os.close()
    val in = java.nio.file.Files.newInputStream(tmp)
    val voc = try Vocab.loadDocodo(in, "en") finally in.close()
    assert(voc.entries == entries)
    // forms of "house" resolve to the same group through the vocab
    val gHouse = voc.search(voc.stem("houses"))
    assert(gHouse != 0 && gHouse == voc.search(voc.stem("house")))
    val gRun = voc.search(voc.stem("running"))
    assert(gRun != 0 && gRun != gHouse)
    // an analyzer with the built vocab emits #group codes
    val an = Analyzer(vocabs = Seq(voc))
    val codes = an.wordCodes("houses")
    assert(codes.exists(_.startsWith("#")), codes.toString)
    assert(an.wordCodes("house").filter(_.startsWith("#")) ==
      codes.filter(_.startsWith("#")))
    java.nio.file.Files.delete(tmp)
  }
}
