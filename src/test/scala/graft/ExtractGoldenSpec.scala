package graft

import graft.fixtures.{ExtractGoldens, PagesGen}
import graft.text.HtmlExtract
import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact extraction contract, pinned by the committed golden manifest
  * (src/test/resources/golden/extract/GOLDENS.tsv). Fails on ANY drift of
  * HtmlExtract output over the T1–T5 template corpus or the hostile-HTML
  * fixtures — independent of the Spark path (FIXTURES.md §1,
  * WebDataSource.cs:213-269). */
class ExtractGoldenSpec extends AnyFunSuite {

  private val dir = new java.io.File(ExtractGoldens.fixtureDir)

  private val manifest: Map[String, (String, String)] = {
    val src = scala.io.Source.fromFile(ExtractGoldens.manifestPath, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(n, t, h) = line.split("\t")
      n -> (t, h)
    }.toMap
    finally src.close()
  }

  test("golden manifest covers the generated corpus and every hostile fixture") {
    assert(manifest.size == ExtractGoldens.generatedIds.size + ExtractGoldens.hostileFiles(dir).size)
    ExtractGoldens.hostileFiles(dir).foreach(f => assert(manifest.contains(f.getName), f.getName))
  }

  test("extraction matches committed SHA-256 goldens (text + headers)") {
    ExtractGoldens.compute(dir).foreach { case (name, tHash, hHash) =>
      val (gT, gH) = manifest.getOrElse(name, fail(s"missing golden for $name"))
      assert(tHash == gT, s"[$name] extracted text drifted from golden")
      assert(hHash == gH, s"[$name] header page drifted from golden")
    }
  }

  private def ex(name: String): HtmlExtract.Extracted = {
    val f = new java.io.File(dir, name)
    HtmlExtract.extract(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
  }

  test("hostile fixtures extract sensible content (behavioral pins)") {
    // unclosed tags: all text nodes still surface in document order
    val h1 = ex("hostile1_unclosed.html")
    assert(h1.text.contains("alpha") && h1.text.contains("beta") &&
      h1.text.contains("gamma") && h1.text.contains("delta never closed"))
    // entities stay raw in body text (reference appends raw InnerText)
    val h2 = ex("hostile2_entities.html")
    assert(h2.text.contains("fish &amp; chips") && h2.text.contains("&#65;"))
    // script/style content excluded even when it contains markup-ish strings
    val h3 = ex("hostile3_nested_script.html")
    assert(h3.text.contains("visible one") && h3.text.contains("visible two"))
    assert(!h3.text.contains("not body text") && !h3.text.contains("content:"))
    // alt text of img indexed (quoted or not); other attributes are not text
    val h4 = ex("hostile4_attrs.html")
    assert(h4.text.contains("unquoted") && h4.text.contains("single quoted alt"))
    assert(h4.text.contains("anchor text") && !h4.text.contains("x.html"))
    // comments/doctype contribute nothing
    val h5 = ex("hostile5_comments.html")
    assert(h5.text.contains("before") && h5.text.contains("after"))
    assert(!h5.text.contains("a comment"))
    // first title wins; '='/newline sanitized; author html-encoded
    val h6 = ex("hostile6_title.html")
    assert(h6.title.startsWith("First   Title &amp;amp; more"))
    assert(!h6.title.contains("Second"))
    assert(h6.author.contains("&#39;Quote&#39;"))
    // whitespace runs collapse to \r\n; ends trimmed
    val h7 = ex("hostile7_whitespace.html")
    assert(h7.text.startsWith("a") && h7.text.contains("a\r\nb\r\nc"))
    // empty body → empty text (doc would be skipped at index time)
    assert(ex("hostile8_empty.html").text.isEmpty)
  }

  test("generated T1-T5 corpus behavioral pins") {
    // T2: script/style excluded
    val t2 = HtmlExtract.extract(PagesGen.htmlFor(1))
    assert(!t2.text.contains("var x=1") && !t2.text.contains(".a{}"))
    // T3: alt text present
    assert(HtmlExtract.extract(PagesGen.htmlFor(2)).text.contains("alt words here"))
    // T4: title + author captured
    val t4 = HtmlExtract.extract(PagesGen.htmlFor(3))
    assert(t4.title == "Doc Title 3" && t4.author == "Author 3")
    // T5: whitespace runs collapse
    assert(HtmlExtract.extract(PagesGen.htmlFor(4)).text.contains("\r\n"))
  }
}
