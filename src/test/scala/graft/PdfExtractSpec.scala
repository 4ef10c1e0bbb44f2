package graft

import graft.text.PdfExtract
import org.scalatest.funsuite.AnyFunSuite
import PdfFixtures._

class PdfExtractSpec extends AnyFunSuite {

  test("minimal one-page PDF extracts its text") {
    val doc = PdfExtract.extract(onePage("BT /F1 12 Tf 72 720 Td (Hello World) Tj ET"))
    assert(doc.pages.size == 1)
    assert(doc.pages.head == "Hello World")
  }

  test("multi-page PDF with Info dict: per-page text + title/author") {
    val b = pdf(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R 5 0 R 7 0 R] /Count 3 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 9 0 R >> >> /Contents 4 0 R >>"),
      4 -> stream("", bytes("BT /F1 12 Tf (first page text) Tj ET")),
      5 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 9 0 R >> >> /Contents 6 0 R >>"),
      6 -> stream("", bytes("BT /F1 12 Tf (second page) Tj 0 -14 Td (two lines) Tj ET")),
      7 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 9 0 R >> >> /Contents 8 0 R >>"),
      8 -> stream("", bytes("BT /F1 12 Tf (third) Tj ET")),
      9 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      10 -> bytes("<< /Title (A Test Doc) /Author <FEFF004A0061006E0065> >>")),
      trailerExtra = "/Info 10 0 R")
    val doc = PdfExtract.extract(b)
    assert(doc.pages == Vector("first page text", "second page\ntwo lines", "third"))
    assert(doc.title == "A Test Doc")
    assert(doc.author == "Jane")
    assert(doc.body == "first page text\fsecond page\ntwo lines\fthird")
  }

  test("FlateDecode content stream") {
    val content = bytes("BT /F1 10 Tf (compressed payload) Tj ET")
    val doc = PdfExtract.extract(onePage("",
      contentObj = stream("/Filter /FlateDecode", flate(content))))
    assert(doc.pages.head == "compressed payload")
  }

  test("LZWDecode content stream (9->10-bit code boundary crossed)") {
    // >253 literal codes force the 9->10-bit early-change transition
    val text = (0 until 60).map(i => s"lex$i").mkString(" ")
    val content = bytes(s"BT /F1 10 Tf ($text) Tj ET")
    assert(content.length > 300)
    val doc = PdfExtract.extract(onePage("",
      contentObj = stream("/Filter /LZWDecode", lzwLiteral(content))))
    assert(doc.pages.head == text)
  }

  test("ASCIIHexDecode and chained filters") {
    val content = bytes("BT /F1 10 Tf (hex payload) Tj ET")
    val viaHex = PdfExtract.extract(onePage("",
      contentObj = stream("/Filter /ASCIIHexDecode", asciiHex(content))))
    assert(viaHex.pages.head == "hex payload")
    // chained: AHx then Flate (applied in order: unhex, then inflate)
    val chained = PdfExtract.extract(onePage("",
      contentObj = stream("/Filter [/ASCIIHexDecode /FlateDecode]", asciiHex(flate(content)))))
    assert(chained.pages.head == "hex payload")
  }

  test("literal string escapes, hex strings, TJ kerning word gaps") {
    val doc = PdfExtract.extract(onePage(
      """BT /F1 12 Tf [(Hel) 20 (lo) -250 (World)] TJ (: a\(b\)c\\d\101) Tj <2148455821> Tj ET"""))
    // 20 (small kern) joins; -250 (wide gap) becomes a space; octal \101='A';
    // hex <21 48 45 58 21> = "!HEX!"
    assert(doc.pages.head == "Hello World: a(b)c\\dA!HEX!")
  }

  test("line operators: Td/TD/T*/'/Tm produce newlines") {
    val doc = PdfExtract.extract(onePage(
      "BT /F1 12 Tf (one) Tj 0 -14 Td (two) Tj T* (three) Tj (four) ' 1 0 0 1 72 600 Tm (five) Tj ET"))
    assert(doc.pages.head == "one\ntwo\nthree\nfour\nfive")
  }

  test("WinAnsiEncoding name form decodes high-byte codes via cp1252") {
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
    // 0xE9 = é, 0x80 = € (cp1252-only), 0x93/0x94 = smart quotes
    val doc = PdfExtract.extract(onePage(
      "BT /F1 12 Tf (caf\\351 \\200 \\223ok\\224) Tj ET", fontDict = font))
    assert(doc.pages.head == "café € “ok”")
  }

  test("/Differences encoding maps custom codes through glyph names") {
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
      "/Encoding << /Differences [65 /eacute /space /germandbls] >> >>"
    val doc = PdfExtract.extract(onePage("BT /F1 12 Tf (ABCd) Tj ET", fontDict = font))
    // A(65)→é, B(66)→' ', C(67)→ß, d stays ASCII
    assert(doc.pages.head == "é ßd")
  }

  test("ToUnicode CMap overrides simple-font bytes (bfchar + bfrange)") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <00> <ff> endcodespacerange
        |2 beginbfchar
        |<41> <0393>
        |<42> <03A9>
        |endbfchar
        |1 beginbfrange
        |<61> <63> <03B1>
        |endbfrange
        |endcmap
        |end""".stripMargin
    val b = pdf(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> stream("", bytes("BT /F1 12 Tf (AB abc) Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /X /ToUnicode 6 0 R >>"),
      6 -> stream("", bytes(cmap))))
    val doc = PdfExtract.extract(b)
    // A→Γ, B→Ω, a..c→α..γ via the range
    assert(doc.pages.head == "ΓΩ αβγ")
  }

  test("Type0/Identity-H two-byte codes decode through ToUnicode") {
    val cmap =
      """begincmap
        |1 begincodespacerange <0000> <ffff> endcodespacerange
        |1 beginbfrange
        |<0048> <004B> <0041>
        |endbfrange
        |endcmap""".stripMargin
    val b = pdf(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> stream("", bytes("BT /F1 12 Tf <00480049004A004B> Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-H /ToUnicode 6 0 R >>"),
      6 -> stream("", bytes(cmap))))
    val doc = PdfExtract.extract(b)
    // codes 0x48..0x4B → A..D
    assert(doc.pages.head == "ABCD")
  }

  test("xref stream + object stream + PNG-predicted xref decode") {
    val doc = PdfExtract.extract(
      xrefStreamPdf("BT /F1 12 Tf (modern xref layout) Tj ET"))
    assert(doc.pages.size == 1)
    assert(doc.pages.head == "modern xref layout")
  }

  test("form XObject text is recursed into") {
    val b = pdf(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> " +
        "/XObject << /Fm1 6 0 R >> >> /Contents 4 0 R >>"),
      4 -> stream("", bytes("BT /F1 12 Tf (before) Tj ET /Fm1 Do BT (after) Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      6 -> stream("/Type /XObject /Subtype /Form",
        bytes("BT /F1 10 Tf (inside the form) Tj ET"))))
    val doc = PdfExtract.extract(b)
    assert(doc.pages.head == "before\ninside the form\nafter")
  }

  test("inline images are skipped without corrupting text") {
    val doc = PdfExtract.extract(onePage(
      "BT /F1 12 Tf (pre) Tj ET BI /W 2 /H 2 /BPC 8 /CS /G ID qÿAB EI BT /F1 12 Tf (post) Tj ET"))
    assert(doc.pages.head == "pre\npost")
  }

  test("encrypted PDFs are rejected; tryExtract returns None") {
    val b = pdf(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [] /Count 0 >>"),
      3 -> bytes("<< /Filter /Standard /V 1 /R 2 >>")),
      trailerExtra = "/Encrypt 3 0 R")
    assert(PdfExtract.tryExtract(b).isEmpty)
    intercept[Exception](PdfExtract.extract(b))
  }

  test("self-referencing /XRefStm does not recurse (hostile hybrid-ref cycle)") {
    // a classic xref trailer whose /XRefStm points back at the classic
    // section itself: without cycle detection this recurses unboundedly
    // (StackOverflowError escapes tryExtract's Exception catch)
    val objs = Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      4 -> stream("", bytes("BT /F1 12 Tf (cycle safe) Tj ET")))
    val plain = pdf(objs)
    val s = new String(plain, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xrefOff = s.substring(s.lastIndexOf("startxref\n") + 10).trim.takeWhile(_.isDigit)
    val cyclic = pdf(objs, trailerExtra = s"/XRefStm $xrefOff")
    val doc = PdfExtract.extract(cyclic)
    assert(doc.pages == Vector("cycle safe"))
    assert(PdfExtract.tryExtract(cyclic).nonEmpty)
  }

  test("malformed input: tryExtract is None, never throws") {
    assert(PdfExtract.tryExtract(Array[Byte](1, 2, 3)).isEmpty)
    assert(PdfExtract.tryExtract(bytes("%PDF-1.4 garbage with no xref")).isEmpty)
    assert(PdfExtract.tryExtract(null).isEmpty)
    // truncated valid pdf
    val whole = onePage("BT /F1 12 Tf (x) Tj ET")
    assert(PdfExtract.tryExtract(whole.take(whole.length / 2)).isEmpty)
  }

  test("indirect /Length and content array concatenation") {
    val c1 = "BT /F1 12 Tf (part one) Tj ET"
    val c2 = "BT /F1 12 Tf (part two) Tj ET"
    val b = pdf(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 7 0 R >> >> /Contents [4 0 R 5 0 R] >>"),
      4 -> (bytes(s"<< /Length 6 0 R >>\nstream\n$c1\nendstream")),
      5 -> stream("", bytes(c2)),
      6 -> bytes(c1.length.toString),
      7 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")))
    val doc = PdfExtract.extract(b)
    assert(doc.pages.head == "part one\npart two")
  }

  test("fuzz: tryExtract never throws on mutated or random input") {
    val rnd = new scala.util.Random(42)
    val valid = onePage("BT /F1 12 Tf (fuzz seed page) Tj ET")
    // random byte mutations of a valid pdf
    (0 until 300).foreach { i =>
      val b = valid.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      PdfExtract.tryExtract(b) // must not throw
    }
    // random truncations
    (0 until 100).foreach { _ =>
      PdfExtract.tryExtract(valid.take(1 + rnd.nextInt(valid.length)))
    }
    // random garbage behind a %PDF magic
    (0 until 100).foreach { _ =>
      val g = new Array[Byte](64 + rnd.nextInt(512))
      rnd.nextBytes(g)
      System.arraycopy("%PDF-1.4".getBytes, 0, g, 0, 8)
      PdfExtract.tryExtract(g)
    }
    // hostile deep nesting must hit the depth guard, not the JVM stack
    val deep = bytes("%PDF-1.4\n1 0 obj\n" + "[" * 100000)
    assert(PdfExtract.tryExtract(deep).isEmpty)
    val deepContent = "[" * 100000
    val viaPage = onePage(deepContent + " BT (x) Tj ET")
    PdfExtract.tryExtract(viaPage) // content-stream side of the guard
    succeed
  }

  test("decompression bomb aborts the document instead of OOMing the task") {
    // 4 MB of zeros deflates to ~4 KB; with the cap forced to 64 KB the
    // stream decode must abort and the document skip
    val bomb = flate(new Array[Byte](4 << 20))
    val b = onePage("", contentObj = stream("/Filter /FlateDecode", bomb))
    sys.props("graft.pdf.maxstream") = (64 << 10).toString
    try {
      assert(PdfExtract.tryExtract(b).isEmpty)
    } finally sys.props.remove("graft.pdf.maxstream")
    // under the default cap the same pdf parses (its "text" is empty)
    assert(PdfExtract.tryExtract(b).isDefined)
  }

  test("page text never contains form-feed (reserved as the page separator)") {
    // simple fonts drop unmapped control codes entirely
    val doc = PdfExtract.extract(onePage("BT /F1 12 Tf (a\\fb) Tj ET"))
    assert(!doc.pages.head.contains('\f'))
    assert(doc.pages.head == "ab")
    // a ToUnicode map that emits U+000C still can't leak '\f' into the page
    val cmap = "begincmap 1 begincodespacerange <00> <ff> endcodespacerange " +
      "1 beginbfchar <41> <000C> endbfchar endcmap"
    val b = pdf(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> stream("", bytes("BT /F1 12 Tf (xAy) Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /X /ToUnicode 6 0 R >>"),
      6 -> stream("", bytes(cmap))))
    val viaMap = PdfExtract.extract(b)
    assert(!viaMap.pages.head.contains('\f'))
    assert(viaMap.pages.head == "x y")
  }
}
