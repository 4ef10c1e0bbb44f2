package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Web crawler source (≙ reference WebDataSource,
  * /root/reference/Docodo.NET/DataSources/WebDataSource.cs): starting from
  * a base url, follow `<a href>` and `<meta http-equiv=refresh>` links
  * within the same host and index each fetched document by content type —
  * `application/pdf` → per-page PDF extraction, `text/plain` → paged text,
  * everything else → the byte-exact HTML extraction pipeline
  * (WebDataSource.cs:174-211 FromUrl dispatch).
  *
  * Link admission mirrors TryAddUrl (WebDataSource.cs:100-165): lowercase,
  * fragment-only and empty hrefs dropped, image extensions
  * (.png/.svg/.jpg/.bmp/.gif, query string stripped) dropped, same-host
  * only, ≤1024 chars, optional `indexTypes` regex filter, global dedup,
  * MaxItems cap. One documented deviation: relative hrefs resolve against
  * the PAGE url (RFC 3986) rather than the reference's source-root
  * concatenation, which mis-resolves links from nested pages.
  *
  * Architecture is Spark-first instead of the reference's driver-side
  * recursive walk + producer queue: the crawl is BFS ROUNDS. Each round
  * fetches the whole frontier distributed (`mapPartitions`, one HTTP
  * client per task, politeness delay between requests), writes the fetched
  * rows to a round-scoped parquet (so nothing is ever refetched by
  * downstream lineage re-evaluation, and a crashed crawl can resume from
  * its completed rounds), then derives the next frontier as
  * `discovered-links EXCEPT visited` — a distributed anti-join, so the
  * visited set lives in the cluster, not driver memory. Depth is bounded
  * by `maxDepth` rounds; the reference's MaxItems cap applies as a
  * deterministic (url-ordered) limit on each round's admissions.
  */
object WebCrawler {

  final case class Config(
      maxItems: Int = 1000000,      // reference MaxItems, WebDataSource.cs:98
      maxDepth: Int = 16,
      indexTypes: String = "",      // admission regex, WebDataSource.cs:150
      fetchTimeoutMs: Int = 10000,
      politenessMs: Int = 0,        // reference sleeps 100 ms/link (cs:88)
      userAgent: String = "DOCODO", // reference UA (cs:45,177)
      respectRobots: Boolean = false, // beyond the reference: robots.txt Disallow
      maxFetchBytes: Int = 16 << 20 // response-size cap: a huge/hostile body
                                    // must not buffer unbounded in the task
  )

  /** One fetched document, dispatched by content type. */
  final case class FetchRow(
      url: String,
      html: Array[Byte],   // non-null for html content
      text: String,        // non-null for text/plain + pdf
      header: String,      // non-null for pdf (Title/Name/Author/Source)
      links: Seq[String])  // admitted outlinks (normalized)

  private val HrefRe =
    """(?is)<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""".r
  private val MetaRefreshRe =
    """(?is)<meta\b[^>]*http-equiv\s*=\s*["']?refresh["']?[^>]*?content\s*=\s*["']?([^"'>]*)""".r
  private val RefreshUrlRe = """(?i)url=([\w\.\\_\+\?\&/:-]+)""".r
  private val BaseHrefRe =
    """(?is)<base\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""".r
  private val ImageExts = Set(".png", ".svg", ".jpg", ".bmp", ".gif")

  /** `<base href>` of a page, if present — relative links resolve against
    * it instead of the page url (HTML spec; common on real sites). */
  def baseHref(html: String): Option[String] =
    BaseHrefRe.findFirstMatchIn(html).map { m =>
      Option(m.group(1)).orElse(Option(m.group(2))).orElse(Option(m.group(3))).getOrElse("")
    }.filter(_.nonEmpty)

  /** Disallowed path prefixes for `*` / our user agent from a robots.txt
    * body (minimal common subset: User-agent groups + Disallow lines;
    * Allow and wildcards are not interpreted — a disallowed prefix wins). */
  def robotsDisallows(body: String, userAgent: String): Seq[String] = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    // group = consecutive User-agent lines + the Disallow lines that follow;
    // a specific matching group OVERRIDES the `*` group (robots semantics)
    final case class Group(agents: Seq[String], disallows: Seq[String])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = Seq.newBuilder[String]
    var dis = Seq.newBuilder[String]
    var inAgents = false
    def close(): Unit = {
      val a = agents.result()
      if (a.nonEmpty) groups += Group(a, dis.result())
      agents = Seq.newBuilder; dis = Seq.newBuilder
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val lower = line.toLowerCase(java.util.Locale.ROOT)
      if (lower.startsWith("user-agent:")) {
        if (!inAgents) close()
        inAgents = true
        agents += line.substring("user-agent:".length).trim.toLowerCase(java.util.Locale.ROOT)
      } else {
        inAgents = false
        if (lower.startsWith("disallow:")) {
          val path = line.substring("disallow:".length).trim
          if (path.nonEmpty) dis += path
        }
      }
    }
    close()
    val specific = groups.filter(_.agents.exists(a => a != "*" && ua.contains(a)))
    val chosen = if (specific.nonEmpty) specific else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.disallows).toSeq
  }

  /** Raw candidate link strings of an html page (hrefs + meta refresh). */
  def rawLinks(html: String): Seq[String] = {
    val hrefs = HrefRe.findAllMatchIn(html).map { m =>
      Option(m.group(1)).orElse(Option(m.group(2))).orElse(Option(m.group(3))).getOrElse("")
    }
    val refresh = MetaRefreshRe.findAllMatchIn(html).flatMap { m =>
      RefreshUrlRe.findFirstMatchIn(m.group(1)).map(_.group(1))
    }
    (hrefs ++ refresh).toSeq
  }

  /** TryAddUrl admission: normalized absolute url, or None. */
  def normalize(raw: String, pageUrl: String, baseHost: String,
                indexTypes: String): Option[String] =
    normalize(raw, pageUrl, baseHost, indexTypes, Nil)

  def normalize(raw: String, pageUrl: String, baseHost: String,
                indexTypes: String, disallows: Seq[String]): Option[String] = {
    val s0 = raw.trim.toLowerCase(java.util.Locale.ROOT)
    if (s0.isEmpty || s0.startsWith("#")) return None
    if (s0.startsWith("javascript:") || s0.startsWith("mailto:")) return None
    val abs =
      try {
        val u = new java.net.URI(pageUrl).resolve(new java.net.URI(s0))
        if (u.getScheme == null || !(u.getScheme == "http" || u.getScheme == "https")) return None
        // drop the fragment, keep the query (the reference's UriBuilder round-trip)
        new java.net.URI(u.getScheme, u.getAuthority, u.getPath, u.getQuery, null)
          .normalize().toString
      } catch { case _: Exception => return None }
    if (abs.length > 1024) return None
    val host = try new java.net.URI(abs).getHost catch { case _: Exception => null }
    if (host == null || host != baseHost) return None
    // extension check with query string stripped (WebDataSource.cs:125-135)
    val noQuery = { val q = abs.indexOf('?'); if (q >= 0) abs.substring(0, q) else abs }
    val dot = noQuery.lastIndexOf('.')
    val slash = noQuery.lastIndexOf('/')
    if (dot > slash && ImageExts.contains(noQuery.substring(dot))) return None
    if (indexTypes.nonEmpty && !java.util.regex.Pattern.compile(indexTypes).matcher(abs).find())
      return None
    if (disallows.nonEmpty) {
      val path = try Option(new java.net.URI(abs).getPath).getOrElse("/")
      catch { case _: Exception => "/" }
      if (disallows.exists(path.startsWith)) return None
    }
    Some(abs)
  }

  /** Fetch one partition of frontier urls. `base` is the normalized source
    * root; pdf Name= headers are emitted base-relative like the reference's
    * url.Substring(parent.Path.Length). */
  private def fetchPartition(urls: Iterator[String], base: String, baseHost: String,
                             indexTypes: String, timeoutMs: Int,
                             politenessMs: Int, ua: String,
                             disallows: Seq[String], maxBytes: Int): Iterator[FetchRow] = {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()
    urls.flatMap { url =>
      if (politenessMs > 0) Thread.sleep(politenessMs)
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("User-Agent", ua)
          .header("Accept", "text/html, text/plain, application/pdf")
          .GET().build()
        val res = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofInputStream())
        if (res.statusCode() != 200) { res.body().close(); None }
        else {
          val ct = res.headers().firstValue("Content-Type").orElse("text/html")
            .split(";")(0).trim.toLowerCase(java.util.Locale.ROOT)
          // bounded read: truncate at the cap (truncated html still
          // indexes; a truncated pdf fails extraction and skips cleanly)
          val body = {
            val in = res.body()
            try {
              val out = new java.io.ByteArrayOutputStream(8192)
              val buf = new Array[Byte](8192)
              var n = in.read(buf)
              while (n >= 0 && out.size() < maxBytes) {
                out.write(buf, 0, math.min(n, maxBytes - out.size()))
                n = in.read(buf)
              }
              out.toByteArray
            } finally in.close()
          }
          ct match {
            case "application/pdf" =>
              graft.text.PdfExtract.tryExtract(body).filter(_.body.nonEmpty).map { doc =>
                val name = if (url.startsWith(base)) url.substring(base.length) else url
                val hdr =
                  (if (doc.title.nonEmpty) s"Title=${doc.title}\n" else "") +
                    s"Name=$name\n" +
                    (if (doc.author.nonEmpty) s"Author=${doc.author}\n" else "")
                FetchRow(url, null, doc.body, hdr, Nil)
              }
            case "text/plain" =>
              Some(FetchRow(url, null, graft.text.CharsetSniff.decode(body), null, Nil))
            case _ =>
              val htmlStr = graft.text.CharsetSniff.decode(body)
              // <base href> (absolute or page-relative) redirects relative
              // link resolution for the whole page
              val resolveFrom = baseHref(htmlStr).flatMap { b =>
                try Some(new java.net.URI(url)
                  .resolve(new java.net.URI(b.trim.toLowerCase(java.util.Locale.ROOT))).toString)
                catch { case _: Exception => None }
              }.getOrElse(url)
              val links = rawLinks(htmlStr)
                .flatMap(normalize(_, resolveFrom, baseHost, indexTypes, disallows)).distinct
              Some(FetchRow(url, body, null, null, links))
          }
        }
      } catch { case _: Exception => None } // unreachable url: skip (cs:186-189)
    }
  }

  /** Run the crawl; returns the fetched-round parquet paths under workDir. */
  def crawlRounds(spark: SparkSession, baseUrl: String, workDir: String,
                  cfg: Config = Config()): Seq[String] = {
    import spark.implicits._
    val base = if (baseUrl.endsWith("/")) baseUrl else baseUrl + "/" // cs:29
    val baseNorm = base.toLowerCase(java.util.Locale.ROOT)
    val baseHost = new java.net.URI(baseNorm).getHost
    val it = cfg.indexTypes
    val (tmo, pol, ua) = (cfg.fetchTimeoutMs, cfg.politenessMs, cfg.userAgent)

    // robots.txt (opt-in; beyond the reference): fetched once, driver-side
    val disallows: Seq[String] =
      if (!cfg.respectRobots) Nil
      else try {
        val client = java.net.http.HttpClient.newBuilder()
          .connectTimeout(java.time.Duration.ofMillis(cfg.fetchTimeoutMs)).build()
        val bu = new java.net.URI(baseNorm)
        val robotsUrl = s"${bu.getScheme}://${bu.getAuthority}/robots.txt"
        val res = client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(robotsUrl))
            .timeout(java.time.Duration.ofMillis(cfg.fetchTimeoutMs))
            .header("User-Agent", cfg.userAgent).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (res.statusCode() == 200) robotsDisallows(res.body(), cfg.userAgent) else Nil
      } catch { case _: Exception => Nil }

    var frontier: Dataset[String] = spark.createDataset(Seq(baseNorm))
    var scheduled = 1L
    val roundPaths = Seq.newBuilder[String]
    var depth = 0
    var done = false
    while (!done && depth < cfg.maxDepth) {
      // Per-host politeness must be GLOBAL: admission is same-host
      // (TryAddUrl), so the whole frontier is one host, and P parallel
      // fetch tasks would hit it at P/politenessMs — P times the intended
      // rate. With a politeness delay the fetch runs in ONE partition
      // (exactly the reference's single navigate thread + fixed sleep,
      // WebDataSource.cs:60-67); crawl throughput is rate-bound anyway, so
      // parallelism buys nothing a polite crawl may use. politenessMs=0
      // keeps the distributed fetch.
      val parts =
        if (pol > 0) 1
        else math.max(1, math.min(
          frontier.count(), spark.sparkContext.defaultParallelism.toLong).toInt)
      val maxB = cfg.maxFetchBytes
      val fetched = frontier.repartition(parts)
        .mapPartitions(it0 =>
          fetchPartition(it0, baseNorm, baseHost, it, tmo, pol, ua, disallows, maxB))
      val fetchedPath = s"$workDir/fetched-$depth"
      fetched.write.mode("overwrite").parquet(fetchedPath)
      roundPaths += fetchedPath
      // frontier snapshot → visited set (reading parquet, never refetching)
      frontier.toDF("url").write.mode("overwrite").parquet(s"$workDir/frontier-$depth")

      val visited = spark.read.parquet(
        (0 to depth).map(d => s"$workDir/frontier-$d"): _*)
      val discovered = spark.read.parquet(fetchedPath)
        .select(explode($"links").as("url")).distinct()
      var next = discovered.join(visited, Seq("url"), "left_anti")
      val room = cfg.maxItems - scheduled
      if (room <= 0) next = next.limit(0)
      else if (next.count() > room)
        next = next.orderBy($"url").limit(room.toInt) // deterministic cap
      val nextDs = next.as[String]
      val nNext = nextDs.count()
      scheduled += nNext
      if (nNext == 0) done = true else frontier = nextDs
      depth += 1
    }
    roundPaths.result()
  }

  /** Crawl and shape into the engine's pages schema. Urls are emitted
    * relative to the base (reference Name = url minus source path,
    * WebDataSource.cs:200,205); html rows flow through the builder's
    * extraction + header synthesis. */
  def pages(spark: SparkSession, baseUrl: String, workDir: String,
            cfg: Config = Config(), sourceName: String = "web"): DataFrame = {
    val rounds = crawlRounds(spark, baseUrl, workDir, cfg)
    val base = (if (baseUrl.endsWith("/")) baseUrl else baseUrl + "/")
      .toLowerCase(java.util.Locale.ROOT)
    val rel = when(col("url").startsWith(base),
      col("url").substr(lit(base.length + 1), lit(Int.MaxValue))).otherwise(col("url"))
    // pdf headers carry Title/Name/Author from the Info dict; Source= is
    // appended here like the reference's GetHeaders (DocumentDataSource.cs:71)
    val hdr = when(col("header").isNotNull,
      concat(col("header"), lit(s"Source=$sourceName\n"))).otherwise(lit(null).cast("string"))
    spark.read.parquet(rounds: _*)
      .select(
        rel.as("url"),
        lit(null).cast("timestamp").as("warc_ts"),
        col("html"),
        col("text"),
        lit(null).cast("string").as("lang"),
        hdr.as("header"))
  }
}
