package graft

import graft.query.SearchOptions
import graft.sources.WebCrawler
import graft.spark.{IndexBuilder, SparkSearcher}
import graft.text.Analyzer
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** S5: crawler over a loopback HTTP site — BFS rounds, TryAddUrl admission
  * rules, content-type dispatch (html/plain/pdf), e2e index + search. */
class WebCrawlerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private var server: com.sun.net.httpserver.HttpServer = _
  private var base: String = _

  private def page(path: String, ct: String, body: Array[Byte]): Unit =
    server.createContext(path, exchange => {
      exchange.getResponseHeaders.add("Content-Type", ct)
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })

  override def beforeAll(): Unit = {
    server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    base = s"http://127.0.0.1:$port/"
    // 404 default for anything unregistered
    server.createContext("/", exchange => {
      if (exchange.getRequestURI.getPath == "/") {
        val body =
          (s"""<html><head><title>Root</title></head><body>
              |the lighthouse keeper counted gannets
              |<a href="a.html">a</a>
              |<a href='/b.html'>b</a>
              |<a href=sub/c.html>c</a>
              |<a href="/plain.txt">txt</a>
              |<a href="/doc.pdf">pdf</a>
              |<a href="#frag">frag-only</a>
              |<a href="/logo.png">img</a>
              |<a href="/banner.svg?v=2">img-query</a>
              |<a href="http://elsewhere.example/x.html">offsite</a>
              |<a href="mailto:k@example.org">mail</a>
              |<a href="/">self</a>
              |</body></html>""").stripMargin.getBytes("UTF-8")
        exchange.getResponseHeaders.add("Content-Type", "text/html")
        exchange.sendResponseHeaders(200, body.length)
        exchange.getResponseBody.write(body)
      } else exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    page("/a.html", "text/html",
      """<html><body>migrating shearwaters over the shoals
        |<a href="/">home-cycle</a><a href="/b.html">b-again</a>
        |<meta http-equiv="refresh" content="0; url=/refreshed.html">
        |</body></html>""".stripMargin.getBytes("UTF-8"))
    page("/b.html", "text/html",
      "<html><body>the cormorant census ledger</body></html>".getBytes("UTF-8"))
    page("/sub/c.html", "text/html",
      "<html><body>kelp forests shelter otters</body></html>".getBytes("UTF-8"))
    page("/refreshed.html", "text/html",
      "<html><body>volcanic plumage witnessed</body></html>".getBytes("UTF-8"))
    page("/plain.txt", "text/plain",
      "a plain ledger of puffin sightings".getBytes("UTF-8"))
    page("/doc.pdf", "application/pdf", PdfFixtures.pdf(Seq(
      1 -> PdfFixtures.bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> PdfFixtures.bytes("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
      3 -> PdfFixtures.bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 7 0 R >> >> /Contents 4 0 R >>"),
      4 -> PdfFixtures.stream("", PdfFixtures.bytes("BT /F1 12 Tf (albatross telemetry summary) Tj ET")),
      5 -> PdfFixtures.bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 7 0 R >> >> /Contents 6 0 R >>"),
      6 -> PdfFixtures.stream("", PdfFixtures.bytes("BT /F1 12 Tf (petrel appendix tables) Tj ET")),
      7 -> PdfFixtures.bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      8 -> PdfFixtures.bytes("<< /Title (Seabird Survey) >>")),
      trailerExtra = "/Info 8 0 R"))
    page("/logo.png", "image/png", Array[Byte](1, 2, 3))
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("link admission mirrors TryAddUrl") {
    val host = "h.example"
    def n(raw: String, pageUrl: String = "http://h.example/dir/p.html") =
      WebCrawler.normalize(raw, pageUrl, host, "")
    assert(n("") === None)
    assert(n("#top") === None)
    assert(n("x.html") === Some("http://h.example/dir/x.html")) // page-relative
    assert(n("/abs.html") === Some("http://h.example/abs.html"))
    assert(n("HTTP://H.EXAMPLE/UPPER.HTML") === Some("http://h.example/upper.html"))
    assert(n("http://other.example/p.html") === None)  // cross-host
    assert(n("pic.png") === None)                       // image ext
    assert(n("pic.png?v=3") === None)                   // ext behind query
    assert(n("mailto:x@y") === None)
    assert(n("a".repeat(1100) + ".html") === None)      // >1024 chars
    assert(n("frag.html#sec") === Some("http://h.example/dir/frag.html")) // fragment stripped
    // indexTypes admission regex
    assert(WebCrawler.normalize("keep.html", "http://h.example/", host, "\\.html$").isDefined)
    assert(WebCrawler.normalize("drop.txt", "http://h.example/", host, "\\.html$").isEmpty)
  }

  test("raw link extraction: hrefs in all quote styles + meta refresh") {
    val links = WebCrawler.rawLinks(
      """<a href="dq.html">1</a> <A HREF='sq.html'>2</A> <a id=z href=bare.html>3</a>
        |<meta http-equiv="REFRESH" content="5; url=target.html">""".stripMargin)
    assert(links == Seq("dq.html", "sq.html", "bare.html", "target.html"))
  }

  test("crawl: BFS rounds, dedup, dispatch, e2e index + search") {
    val work = java.nio.file.Files.createTempDirectory("graft-crawl").toString
    val pages = WebCrawler.pages(spark, base, work,
      WebCrawler.Config(maxDepth = 5), sourceName = "web")
    val rows = pages.collect()
    val urls = rows.map(_.getAs[String]("url")).toSet
    // everything same-host reachable, nothing excluded; 404 + png absent
    assert(urls == Set("", "a.html", "b.html", "sub/c.html", "refreshed.html",
      "plain.txt", "doc.pdf"))

    val idx = java.nio.file.Files.createTempDirectory("graft-crawlidx").toString
    IndexBuilder.build(spark, pages, idx,
      IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "web", formFeedPages = true))
    val sr = new SparkSearcher(spark, idx, Analyzer())

    // html docs: extracted text searchable, markup not
    assert(sr.search("gannets", SearchOptions()).docs.map(_.name) == Seq("web:"))
    assert(sr.search("shearwaters", SearchOptions()).docs.map(_.name) == Seq("web:a.html"))
    assert(sr.search("cormorant", SearchOptions()).docs.map(_.name) == Seq("web:b.html"))
    assert(sr.search("otters", SearchOptions()).docs.map(_.name) == Seq("web:sub/c.html"))
    // the meta-refresh target was followed
    assert(sr.search("plumage", SearchOptions()).docs.map(_.name) == Seq("web:refreshed.html"))
    // text/plain dispatch
    assert(sr.search("puffin", SearchOptions()).docs.map(_.name) == Seq("web:plain.txt"))
    // pdf dispatch: page-2 hit with Info-dict title header
    val p = sr.search("petrel", SearchOptions())
    assert(p.docs.map(_.name) == Seq("web:doc.pdf"))
    assert(p.docs.head.headers.get("Title").contains("Seabird Survey"))
    assert(p.docs.head.headers.get("Source").contains("web"))
    assert(p.docs.head.pages.map(_.pageId) == Seq("2"))
  }

  test("maxItems caps admissions; maxDepth bounds rounds") {
    val work = java.nio.file.Files.createTempDirectory("graft-crawl2").toString
    val few = WebCrawler.pages(spark, base, work,
      WebCrawler.Config(maxItems = 3, maxDepth = 5))
    assert(few.count() <= 3)
    val shallow = WebCrawler.pages(spark, base,
      java.nio.file.Files.createTempDirectory("graft-crawl3").toString,
      WebCrawler.Config(maxDepth = 1))
    // depth 1 = the base page only
    assert(shallow.collect().map(_.getAs[String]("url")).toSet == Set(""))
  }

  test("base href redirects relative resolution; robots disallows parse") {
    assert(WebCrawler.baseHref(
      """<html><head><base href="http://h.example/deep/"></head></html>""")
      .contains("http://h.example/deep/"))
    assert(WebCrawler.baseHref("<html><head></head></html>").isEmpty)
    val robots =
      """# comment
        |User-agent: Googlebot
        |Disallow: /only-google
        |
        |User-agent: *
        |Disallow: /private/
        |Disallow: /tmp # trailing comment
        |Allow: /private/ok
        |User-agent: other
        |Disallow: /other-only
        |""".stripMargin
    assert(WebCrawler.robotsDisallows(robots, "DOCODO") == Seq("/private/", "/tmp"))
    assert(WebCrawler.robotsDisallows(robots, "Googlebot") == Seq("/only-google"))
    // admission applies the path-prefix filter
    assert(WebCrawler.normalize("/private/x.html", "http://h.example/", "h.example",
      "", Seq("/private/")).isEmpty)
    assert(WebCrawler.normalize("/public/x.html", "http://h.example/", "h.example",
      "", Seq("/private/")).isDefined)
  }

  test("crawl honors robots.txt when respectRobots is on") {
    // /hidden/secret.html is linked from /sub2/ but disallowed at host root
    page("/robots.txt", "text/plain",
      "User-agent: *\nDisallow: /hidden/\n".getBytes("UTF-8"))
    page("/hidden/secret.html", "text/html",
      "<html><body>restricted bunker plans</body></html>".getBytes("UTF-8"))
    page("/sub2/", "text/html",
      """<html><body><a href="/hidden/secret.html">s</a>
        |<a href="/b.html">b</a>restricted linker page</body></html>""".stripMargin.getBytes("UTF-8"))
    val work = java.nio.file.Files.createTempDirectory("graft-crawl5").toString
    val pages = WebCrawler.pages(spark, base + "sub2/", work,
      WebCrawler.Config(maxDepth = 3, respectRobots = true))
    val urls = pages.collect().map(_.getAs[String]("url")).toSet
    assert(urls.exists(_.endsWith("b.html")))
    assert(!urls.exists(_.contains("hidden")))
    // without the flag the disallowed page is crawled (reference behavior)
    val work2 = java.nio.file.Files.createTempDirectory("graft-crawl6").toString
    val pages2 = WebCrawler.pages(spark, base + "sub2/", work2,
      WebCrawler.Config(maxDepth = 3))
    assert(pages2.collect().map(_.getAs[String]("url")).exists(_.contains("hidden")))
  }

  test("oversized responses truncate at maxFetchBytes instead of buffering") {
    val big = new Array[Byte](512 * 1024)
    java.util.Arrays.fill(big, 'x'.toByte)
    val html = ("<html><body>capped colossus page " +
      new String(big, "UTF-8") + "</body></html>").getBytes("UTF-8")
    page("/huge.html", "text/html", html)
    page("/sub3/", "text/html",
      "<html><body><a href=\"/huge.html\">h</a>tiny hub</body></html>".getBytes("UTF-8"))
    val work = java.nio.file.Files.createTempDirectory("graft-crawl7").toString
    val pages = WebCrawler.pages(spark, base + "sub3/", work,
      WebCrawler.Config(maxDepth = 2, maxFetchBytes = 64 * 1024))
    val rows = pages.collect()
    val huge = rows.find(_.getAs[String]("url").endsWith("huge.html")).get
    val fetched = huge.getAs[Array[Byte]]("html")
    assert(fetched.length == 64 * 1024, s"got ${fetched.length}")
    // truncated html still extracts its (prefix) text
    assert(new String(fetched, "UTF-8").contains("capped colossus"))
  }

  test("indexTypes regex restricts admissions like the reference") {
    val work = java.nio.file.Files.createTempDirectory("graft-crawl4").toString
    val pages = WebCrawler.pages(spark, base, work,
      WebCrawler.Config(maxDepth = 3, indexTypes = "\\.html$"))
    val urls = pages.collect().map(_.getAs[String]("url")).toSet
    assert(urls.contains("a.html") && urls.contains("b.html"))
    assert(!urls.contains("plain.txt") && !urls.contains("doc.pdf"))
  }

  test("politeness bounds the crawl to one in-flight request per host globally") {
    // a dedicated server whose handler CAN serve concurrently (thread
    // pool) and tracks the max number of simultaneous requests — with the
    // per-task delay of rounds 1-3 a 12-url frontier on local[4] would
    // overlap; the global politeness rule must keep it strictly serial
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    val n = 12
    val rootHtml = ("<html><body>hub" +
      (0 until n).map(i => s"""<a href="/leaf$i.html">l$i</a>""").mkString +
      "</body></html>").getBytes("UTF-8")
    srv.createContext("/", exchange => {
      maxSeen.accumulateAndGet(inFlight.incrementAndGet(), math.max(_, _))
      try {
        Thread.sleep(30) // widen the overlap window parallel fetches would hit
        val p = exchange.getRequestURI.getPath
        val body = if (p == "/") rootHtml
          else s"<html><body>leaf page $p</body></html>".getBytes("UTF-8")
        exchange.getResponseHeaders.add("Content-Type", "text/html")
        exchange.sendResponseHeaders(200, body.length)
        exchange.getResponseBody.write(body)
        exchange.close()
      } finally inFlight.decrementAndGet()
    })
    srv.start()
    try {
      val b = s"http://127.0.0.1:${srv.getAddress.getPort}/"
      val work = java.nio.file.Files.createTempDirectory("graft-crawl5").toString
      val pages = WebCrawler.pages(spark, b, work,
        WebCrawler.Config(maxDepth = 3, politenessMs = 20))
      assert(pages.count() == n + 1)
      assert(maxSeen.get() == 1,
        s"polite crawl must be globally serial per host, saw ${maxSeen.get()} in flight")
    } finally srv.stop(0)
  }
}
