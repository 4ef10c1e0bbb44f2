package graft

import graft.core.Varint
import graft.text.{Analyzer, EnglishStemmer, HtmlExtract}
import org.scalatest.funsuite.AnyFunSuite

/** Codec roundtrip (≙ reference ConvertTest/LoadSaveTest,
  * /root/reference/XUnitDocodoTest/IndexSequenceTest.cs:17-26,118-134),
  * stemmer vectors, tokenizer and HTML extraction unit tests.
  */
class CoreSpec extends AnyFunSuite {

  test("varint roundtrip: random ascending sequences (N up to 10^6)") {
    val rnd = new scala.util.Random(42)
    Seq(1, 10, 100, 1000000).foreach { n =>
      var last = 0L
      val xs = Array.fill(n) { last += rnd.nextInt(0x10000).toLong; last }
      assert(Varint.decode(Varint.encode(xs), xs.length).toSeq == xs.toSeq, s"n=$n")
    }
  }

  test("varint edge gaps: 15-bit boundary and >2^32") {
    val xs = Array(0L, 0x7FFFL, 0x7FFF + 0x8000L, 0x17FFFL, 0x100000000L, 0x100000000L + 0xFFFFFL)
    assert(Varint.decode(Varint.encode(xs), xs.length).toSeq == xs.toSeq)
    // deltas of exactly 0 and 1
    val ys = Array(5L, 5L, 6L)
    assert(Varint.decode(Varint.encode(ys), ys.length).toSeq == ys.toSeq)
  }

  test("varint raw (tf) roundtrip") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(5000)(rnd.nextLong(1000000L))
    assert(Varint.decodeRaw(Varint.encodeRaw(xs), xs.length).toSeq == xs.toSeq)
  }

  test("porter2 stemmer vectors") {
    val vectors = Seq(
      "lady" -> "ladi", "ladies" -> "ladi", "old" -> "old",
      "running" -> "run", "generously" -> "generous", "happily" -> "happili",
      "skies" -> "sky", "sky" -> "sky", "dying" -> "die", "news" -> "news",
      "agreed" -> "agre", "disabled" -> "disabl",
      "meetings" -> "meet", "cats" -> "cat", "tied" -> "tie",
      "caresses" -> "caress", "ponies" -> "poni", "conflated" -> "conflat",
      "hopping" -> "hop", "hoping" -> "hope", "national" -> "nation",
      "rational" -> "ration", "everybody" -> "everybodi",
      "tupman" -> "tupman", "and" -> "and")
    vectors.foreach { case (in, want) =>
      assert(EnglishStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("tokenizer: regex, offsets, length gate") {
    val an = Analyzer()
    val toks = an.bodyTokens("a tupman, 42 and 1234 old-ladies x".toLowerCase).toSeq
    assert(toks == Seq(("tupman", 2), ("and", 13), ("1234", 17), ("old", 22), ("ladies", 26)))
  }

  test("wordCodes: full form, stem, digits, stopwords") {
    val an = Analyzer(stopWords = Set("the"))
    assert(an.wordCodes("ladies") == Seq("ladies", "$ladi"))
    assert(an.wordCodes("old") == Seq("old"))
    assert(an.wordCodes("190") == Seq("190"))
    assert(an.wordCodes("the") == Seq())
  }

  test("wordCodes: vocab group codes") {
    val voc = graft.text.Vocab("en", Map("and" -> 1, "old" -> 2, "ladi" -> 7), ('a', 'z'))
    val an = Analyzer(vocabs = Seq(voc))
    assert(an.wordCodes("and") == Seq("and", "#1"))
    assert(an.wordCodes("ladies") == Seq("ladies", "#7")) // via stem
    assert(an.wordCodes("zzzq") == Seq("zzzq", "$zzzq").take(1) ++
      (if (EnglishStemmer.stem("zzzq") == "zzzq") Seq() else Seq("$" + EnglishStemmer.stem("zzzq"))))
  }

  test("html extract: script/style excluded, img alt, whitespace collapse") {
    val e1 = HtmlExtract.extract("<html><body><p>hello world</p></body></html>")
    assert(e1.text == "hello world")
    val e2 = HtmlExtract.extract(
      "<html><head><script>var x=1;</script><style>.a{}</style></head><body>keep this</body></html>")
    assert(e2.text == "keep this")
    val e3 = HtmlExtract.extract("""<body><img src="x.png" alt="alt words here">tail</body>""")
    assert(e3.text == "alt words here tail")
    val e4 = HtmlExtract.extract("<body>a \n\n  b \r\n c</body>")
    assert(e4.text == "a\r\nb\r\nc")
  }

  test("html extract: title and meta author headers") {
    val e = HtmlExtract.extract(
      """<html><head><title>Doc = Title</title><meta Author="A&B"></head><body>b</body></html>""")
    assert(e.title == "Doc   Title")
    assert(e.author == "A&amp;B")
    val h = e.headers("http://u/1", "web")
    assert(h == "Name=http://u/1\nSource=web\nTitle=Doc   Title\nAuthor=A&amp;B\n")
    // title text participates in body text (document order)
    assert(e.text.startsWith("Doc = Title"))
  }

  test("html extract: comments and doctype excluded") {
    val e = HtmlExtract.extract("<!DOCTYPE html><!-- secret -->\n<body>visible</body>")
    assert(e.text == "visible")
  }
}
