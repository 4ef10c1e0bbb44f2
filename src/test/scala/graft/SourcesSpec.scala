package graft

import graft.query.SearchOptions
import graft.sources.{DbSource, XmlManifestSource}
import graft.spark.{IndexBuilder, SparkSearcher}
import graft.text.Analyzer
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S8/S9: XML-manifest and database sources feed the same build and keep
  * the reference's header-field semantics (fields queryable via
  * `{field=value}`). DB test uses embedded Derby through spark.read.jdbc.
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("XML manifest source: files + fields → index → field query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xmlsrc")
    java.nio.file.Files.writeString(dir.resolve("doc1.txt"),
      "the merriment of the old lady was considerable indeed")
    java.nio.file.Files.writeString(dir.resolve("doc2.txt"),
      "vector spaces and inner products for ranking functions")
    val manifest = dir.resolve("manifest.xml")
    java.nio.file.Files.writeString(manifest,
      """<?xml version="1.0"?>
        |<documents>
        |  <basepath>.</basepath>
        |  <document><file>doc1.txt</file><author>dickens</author><year>1837</year></document>
        |  <document><file>doc2.txt</file><author>banach</author></document>
        |  <document><author>orphan-no-file</author></document>
        |</documents>""".stripMargin)

    val pages = XmlManifestSource.pages(spark, manifest.toString)
    assert(pages.count() == 2) // the no-file document is skipped (reference behavior)

    val idx = java.nio.file.Files.createTempDirectory("graft-xmlidx").toString
    IndexBuilder.build(spark, pages, idx, IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "xml"))
    val sr = new SparkSearcher(spark, idx, Analyzer())

    val byWord = sr.search("merriment", SearchOptions())
    assert(byWord.docs.map(_.name) == Seq("xml:doc1.txt"))
    // manifest fields are header fields: {author=...} selects the doc
    val byField = sr.search("considerable {author=dickens}", SearchOptions())
    assert(byField.docs.size == 1)
    val miss = sr.search("considerable {author=banach}", SearchOptions())
    assert(miss.docs.isEmpty)
    // typed header coercion applies to manifest fields too
    assert(byWord.docs.head.typedHeaders.get("year").contains(1837L))
  }

  test("DB source (embedded Derby over spark.read.jdbc) → index → search") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE docs (name VARCHAR(64), body VARCHAR(512), author VARCHAR(64))")
      st.execute("INSERT INTO docs VALUES ('a-001', 'distributed indexing with salted partitions', 'alice')")
      st.execute("INSERT INTO docs VALUES ('b-002', 'streaming appends commit snapshot manifests', 'bob')")
      st.close()
    } finally conn.close()

    val pages = DbSource.pages(spark, url,
      "SELECT name, body, author FROM docs",
      nameCol = "NAME", textCol = "BODY", headerCols = Seq("AUTHOR"), sourceName = "db")
    assert(pages.count() == 2)

    val idx = java.nio.file.Files.createTempDirectory("graft-dbidx").toString
    IndexBuilder.build(spark, pages, idx, IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "db"))
    val sr = new SparkSearcher(spark, idx, Analyzer())

    val hit = sr.search("salted", SearchOptions())
    assert(hit.docs.map(_.name) == Seq("db:a-001"))
    assert(hit.docs.head.headers.get("AUTHOR").contains("alice"))
    val byField = sr.search("snapshot {AUTHOR=bob}", SearchOptions())
    assert(byField.docs.size == 1)
  }

  test("DB blob mode: sniff dispatches html/text/pdf blobs (Derby e2e)") {
    val url = "jdbc:derby:memory:graftblobdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val create = conn.createStatement()
      create.execute("CREATE TABLE blobdocs (name VARCHAR(64), payload BLOB)")
      create.close()
      val st = conn.prepareStatement("INSERT INTO blobdocs VALUES (?, ?)")
      def put(name: String, bytes: Array[Byte]): Unit = {
        st.setString(1, name)
        st.setBytes(2, bytes)
        st.executeUpdate()
      }
      put("h-001",
        "<html><head><title>Salted partitions</title></head><body>distributed indexing with salted partitions</body></html>"
          .getBytes("UTF-8"))
      put("t-002", "plain text about snapshot manifests".getBytes("UTF-8"))
      put("p-003", "%PDF-1.4 zorkmid payload".getBytes("UTF-8")) // malformed pdf
      put("p-004", PdfFixtures.onePage("BT /F1 12 Tf (tabulated frobnosticate results) Tj ET"))
      st.close()
    } finally conn.close()

    val pages = DbSource.blobPages(spark, url,
      "SELECT name, payload FROM blobdocs",
      nameCol = "NAME", blobCol = "PAYLOAD", sourceName = "db")
    // the malformed PDF blob is skipped; html + text + real pdf survive
    assert(pages.count() == 3)

    val idx = java.nio.file.Files.createTempDirectory("graft-blobidx").toString
    IndexBuilder.build(spark, pages, idx, IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "db"))
    val sr = new SparkSearcher(spark, idx, Analyzer())

    // the html blob went through extraction: body text is searchable and
    // markup is not
    val hit = sr.search("salted", SearchOptions())
    assert(hit.docs.map(_.name) == Seq("db:h-001"))
    assert(sr.search("head", SearchOptions()).docs.isEmpty)
    // the text blob indexed as UTF-8 text
    assert(sr.search("manifests", SearchOptions()).docs.map(_.name) == Seq("db:t-002"))
    // the malformed pdf blob is absent; the real one extracted + indexed
    assert(sr.search("zorkmid", SearchOptions()).docs.isEmpty)
    assert(sr.search("frobnosticate", SearchOptions()).docs.map(_.name) == Seq("db:p-004"))
  }

  test("charset sniff: BOMs, strict UTF-8, cp1252 fallback") {
    import graft.text.CharsetSniff
    // UTF-8 BOM stripped
    val bom8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "héllo".getBytes("UTF-8")
    assert(CharsetSniff.decode(bom8) == "héllo")
    // UTF-16LE BOM
    val b16 = "héllo".getBytes("UTF-16LE")
    assert(CharsetSniff.decode(Array[Byte](0xFF.toByte, 0xFE.toByte) ++ b16) == "héllo")
    // BOM-less valid UTF-8 (multibyte) detected as UTF-8
    assert(CharsetSniff.decode("naïve café — привет".getBytes("UTF-8")) == "naïve café — привет")
    // invalid-UTF8 single-byte text falls back to windows-1252
    val cp = "café résumé".getBytes("windows-1252")
    assert(!CharsetSniff.isValidUtf8(cp))
    assert(CharsetSniff.decode(cp) == "café résumé")
    // overlong / truncated sequences rejected
    assert(!CharsetSniff.isValidUtf8(Array[Byte](0xC0.toByte, 0xAF.toByte)))
    assert(!CharsetSniff.isValidUtf8(Array[Byte](0xE2.toByte, 0x82.toByte)))
  }

  test("DB blob mode decodes non-UTF8 text blobs via charset sniff (e2e)") {
    val url = "jdbc:derby:memory:graftcpdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val create = conn.createStatement()
      create.execute("CREATE TABLE cpdocs (name VARCHAR(64), payload BLOB)")
      create.close()
      val st = conn.prepareStatement("INSERT INTO cpdocs VALUES (?, ?)")
      st.setString(1, "cp-001")
      st.setBytes(2, "the café serves zorkberry cordials".getBytes("windows-1252"))
      st.executeUpdate()
      st.close()
    } finally conn.close()
    val pages = DbSource.blobPages(spark, url,
      "SELECT name, payload FROM cpdocs",
      nameCol = "NAME", blobCol = "PAYLOAD", sourceName = "db")
    val row = pages.collect().head
    assert(row.getAs[String]("text").contains("café"))
    val idx = java.nio.file.Files.createTempDirectory("graft-cpidx").toString
    IndexBuilder.build(spark, pages, idx, IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "db"))
    val sr = new SparkSearcher(spark, idx, Analyzer())
    assert(sr.search("zorkberry", SearchOptions()).docs.map(_.name) == Seq("db:cp-001"))
  }

  test("DB file mode: paths resolve against basePath with sniffing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dbfiles")
    java.nio.file.Files.writeString(dir.resolve("one.html"),
      "<html><body>ranking functions over inner products</body></html>")
    java.nio.file.Files.writeString(dir.resolve("two.txt"),
      "sessionization joins over event streams")
    java.nio.file.Files.write(dir.resolve("three.pdf"),
      PdfFixtures.onePage("BT /F1 12 Tf (quantized embeddings ledger) Tj ET"))
    val url = "jdbc:derby:memory:graftfiledb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE filedocs (name VARCHAR(64), relpath VARCHAR(256))")
      st.execute("INSERT INTO filedocs VALUES ('f-001', 'one.html')")
      st.execute("INSERT INTO filedocs VALUES ('f-002', 'two.txt')")
      st.execute("INSERT INTO filedocs VALUES ('f-003', 'three.pdf')")
      st.execute("INSERT INTO filedocs VALUES ('f-004', 'missing.txt')")
      st.close()
    } finally conn.close()

    val pages = DbSource.filePages(spark, url,
      "SELECT name, relpath FROM filedocs",
      nameCol = "NAME", fileCol = "RELPATH", basePath = dir.toString, sourceName = "db")
    // the missing file is skipped; the pdf extracts per-page text
    assert(pages.count() == 3)
    val rows = pages.collect()
    val html = rows.find(_.getAs[String]("url") == "f-001").get
    assert(html.getAs[Array[Byte]]("html") != null)
    val txt = rows.find(_.getAs[String]("url") == "f-002").get
    assert(txt.getAs[String]("text").contains("sessionization"))
    val pdf = rows.find(_.getAs[String]("url") == "f-003").get
    assert(pdf.getAs[String]("text") == "quantized embeddings ledger")
  }

  test("documents folder source: txt/html/pdf dispatch, dscr headers, pdf pages") {
    val root = java.nio.file.Files.createTempDirectory("graft-docsrc")
    java.nio.file.Files.createDirectories(root.resolve("sub"))
    java.nio.file.Files.writeString(root.resolve("a.txt"),
      "plain narrative about glimmering estuaries")
    java.nio.file.Files.writeString(root.resolve("b.html"),
      "<html><head><title>Paged Title</title></head><body>hypertext about brackish lagoons</body></html>")
    // three-page pdf: term on page 2 must address PDF page 2 in results
    java.nio.file.Files.write(root.resolve("sub/c.pdf"), PdfFixtures.pdf(Seq(
      1 -> PdfFixtures.bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> PdfFixtures.bytes("<< /Type /Pages /Kids [3 0 R 5 0 R 7 0 R] /Count 3 >>"),
      3 -> PdfFixtures.bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 9 0 R >> >> /Contents 4 0 R >>"),
      4 -> PdfFixtures.stream("", PdfFixtures.bytes("BT /F1 12 Tf (opening remarks) Tj ET")),
      5 -> PdfFixtures.bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 9 0 R >> >> /Contents 6 0 R >>"),
      6 -> PdfFixtures.stream("", PdfFixtures.bytes("BT /F1 12 Tf (the saltmarsh chronicle begins) Tj ET")),
      7 -> PdfFixtures.bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 9 0 R >> >> /Contents 8 0 R >>"),
      8 -> PdfFixtures.stream("", PdfFixtures.bytes("BT /F1 12 Tf (closing matter) Tj ET")),
      9 -> PdfFixtures.bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      10 -> PdfFixtures.bytes("<< /Title (Marsh Study) /Author (Drax) >>")),
      trailerExtra = "/Info 10 0 R"))
    // dscr companions: per-file beats directory; directory applies to all
    java.nio.file.Files.writeString(root.resolve("a.txt.dscr"), "genre=narrative\n")
    java.nio.file.Files.writeString(root.resolve(".dscr"),
      "; comment line\ncollection=tidewater\ngenre=ignored-first-seen-wins\n")

    val pages = graft.sources.DocumentsSource.pages(spark, root.toString, sourceName = "doc")
    assert(pages.count() == 3)

    val idx = java.nio.file.Files.createTempDirectory("graft-docidx").toString
    IndexBuilder.build(spark, pages, idx,
      IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "doc", formFeedPages = true))
    val sr = new SparkSearcher(spark, idx, Analyzer())

    // txt doc: dscr headers merged, file dscr beats directory dscr
    val t = sr.search("estuaries", SearchOptions())
    assert(t.docs.map(_.name) == Seq("doc:a.txt"))
    assert(t.docs.head.headers.get("genre").contains("narrative"))
    assert(t.docs.head.headers.get("collection").contains("tidewater"))
    // html doc went through extraction (markup unsearchable, title header)
    val h = sr.search("brackish", SearchOptions())
    assert(h.docs.map(_.name) == Seq("doc:b.html"))
    assert(sr.search("head", SearchOptions()).docs.isEmpty)
    // pdf: Info-dict headers, hit addresses PDF page 2, snippet from page 2
    val p = sr.search("saltmarsh", SearchOptions())
    assert(p.docs.map(_.name).head.endsWith("c.pdf"))
    assert(p.docs.head.headers.get("Title").contains("Marsh Study"))
    assert(p.docs.head.headers.get("Author").contains("Drax"))
    assert(p.docs.head.pages.map(_.pageId) == Seq("2"))
    assert(p.docs.head.pages.head.text.contains("saltmarsh"))
    // dscr applies to pdfs in subdirs too (ancestor walk)
    assert(p.docs.head.headers.get("collection").contains("tidewater"))
    // field query over a dscr header
    assert(sr.search("estuaries {collection=tidewater}", SearchOptions()).docs.nonEmpty)
  }

  test("multi-source union build: one index over folder + manifest sources") {
    // reference Program.cs:90-134 combines several -source specs into one
    // index; here the same union via unionByName(allowMissingColumns)
    val root = java.nio.file.Files.createTempDirectory("graft-multisrc")
    java.nio.file.Files.writeString(root.resolve("d.txt"),
      "granite breakwaters shelter the marina")
    val xdir = java.nio.file.Files.createTempDirectory("graft-multixml")
    java.nio.file.Files.writeString(xdir.resolve("m.txt"),
      "archival ledgers of harbormasters")
    val manifest = xdir.resolve("manifest.xml")
    java.nio.file.Files.writeString(manifest,
      """<documents><basepath>.</basepath>
        |<document><file>m.txt</file><curator>ames</curator></document>
        |</documents>""".stripMargin)

    val union = graft.sources.DocumentsSource.pages(spark, root.toString, sourceName = "doc")
      .unionByName(XmlManifestSource.pages(spark, manifest.toString), allowMissingColumns = true)
    assert(union.count() == 2)

    val idx = java.nio.file.Files.createTempDirectory("graft-multiidx").toString
    IndexBuilder.build(spark, union, idx,
      IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "multi", formFeedPages = true))
    val sr = new SparkSearcher(spark, idx, Analyzer())
    assert(sr.search("breakwaters", SearchOptions()).docs.map(_.name) == Seq("doc:d.txt"))
    assert(sr.search("harbormasters", SearchOptions()).docs.map(_.name) == Seq("xml:m.txt"))
    // each source's header semantics survive the union
    assert(sr.search("harbormasters {curator=ames}", SearchOptions()).docs.nonEmpty)
  }
}
