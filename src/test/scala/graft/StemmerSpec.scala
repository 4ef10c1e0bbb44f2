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

  test("all four stemmers match official Snowball vectors exactly") {
    // fixtures generated from PostgreSQL's bundled upstream Snowball
    // dictionaries (see each file's header) — en/de/fr/ru pinned to the
    // published reference behavior, 400+ words covering plurals, -eaux,
    // -issement, -iqUe, -emment/-amment, umlauts, RV-boundary verb cases
    for (lang <- Seq("en", "de", "fr", "ru")) {
      val stem = Analyzer.stemmerByName(lang)
      val in = getClass.getResourceAsStream(s"/golden/stemmer/$lang.tsv")
      assert(in != null, s"missing fixture $lang.tsv")
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      val mismatches = try {
        src.getLines().filterNot(l => l.startsWith("#") || l.isEmpty).flatMap { l =>
          val Array(w, exp) = l.split("\t")
          val got = stem(w)
          if (got != exp) Some(s"$lang: $w → $got (official: $exp)") else None
        }.toList
      } finally src.close()
      assert(mismatches.isEmpty, mismatches.mkString("\n"))
    }
  }

  test("analyzer ranges route de/fr words to their stemmers") {
    val an = Analyzer()
    // ä forces the de range (en range a-z rejects it)
    assert(an.wordCodes("häuser") == Seq("häuser", "$haus"))
    // é forces the fr range
    assert(an.wordCodes("continuité") == Seq("continuité", "$continu"))
  }

  test("OpenCorpora XML dump → .voc → #group codes through the analyzer") {
    // minimal OpenCorpora-shaped dump (mirror of Dict.cs:214-255's reader:
    // every `t` attribute inside a <lemma> joins that lemma's group)
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<dictionary version="0.92" revision="1">
        |<lemmata>
        |<lemma id="1" rev="1"><l t="дом"><g v="NOUN"/></l><f t="дома"/><f t="дому"/><f t="домов"/></lemma>
        |<lemma id="2" rev="1"><l t="игра"><g v="NOUN"/></l><f t="игры"/><f t="игре"/><f t="игрой"/></lemma>
        |</lemmata>
        |</dictionary>""".stripMargin
    val entries = VocBuilder.fromOpenCorporaXml(
      new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")), "ru")
    assert(entries.nonEmpty)
    // forms of one lemma share a group; distinct lemmas get distinct groups
    val tmp = java.nio.file.Files.createTempFile("graft-ocvoc", ".voc")
    val os = java.nio.file.Files.newOutputStream(tmp)
    try VocBuilder.writeDocodo(entries, os) finally os.close()
    val in = java.nio.file.Files.newInputStream(tmp)
    val voc = try Vocab.loadDocodo(in, "ru") finally in.close()
    val gDom = voc.search(voc.stem("дома"))
    assert(gDom != 0 && gDom == voc.search(voc.stem("дом")))
    val gIgra = voc.search(voc.stem("игры"))
    assert(gIgra != 0 && gIgra != gDom)
    val an = Analyzer(vocabs = Seq(voc))
    val codes = an.wordCodes("дома")
    assert(codes.exists(_.startsWith("#")), codes.toString)
    assert(an.wordCodes("дом").filter(_.startsWith("#")) ==
      codes.filter(_.startsWith("#")))
    java.nio.file.Files.delete(tmp)
  }

  test("FreeLib folder → word-pair groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-freelib")
    java.nio.file.Files.write(dir.resolve("a.txt"),
      "running run\nhouses house\nbadline\n".getBytes("UTF-8"))
    val entries = VocBuilder.fromFreeLibFolder(dir.toString, "en")
    // both words of a pair stem into the same group
    val stem = graft.text.Analyzer.stemmerByName("en")
    assert(entries(stem("running")) == entries(stem("run")))
    assert(entries(stem("houses")) == entries(stem("house")))
    assert(entries(stem("houses")) != entries(stem("running")))
    dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
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
