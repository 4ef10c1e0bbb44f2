package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.query.{SearchOptions, SearchOut}
import graft.spark.SparkSearcher
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** REST host (≙ reference server.cs:61-117): `GET /search?req=<query>` →
  * `{"found": N, "result": [docs...]}` JSON. Uses the JDK's built-in HTTP
  * server — the search work itself runs on the Spark driver, exactly like
  * the reference's shared static index.
  */
object Server {

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** JSON number: NaN/Infinity are not valid JSON — emit null (a
    * standards-compliant client would otherwise fail to parse the WHOLE
    * response over one degenerate score). */
  private def jnum(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "null"

  def toJson(out: SearchOut): String = {
    val docs = out.docs.map { d =>
      val pages = d.pages.map { p =>
        s"""{"id": ${jstr(p.pageId)}, "rank": ${jnum(p.rank)}, "pos": [${p.pos.mkString(",")}], "text": ${jstr(p.text)}}"""
      }.mkString("[", ",", "]")
      val headers = d.headers.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
      s"""{"docId": ${d.docId}, "name": ${jstr(d.name)}, "rank": ${jnum(d.rank)}, "bm25": ${jnum(d.bm25)}, "summary": ${jstr(d.summary)}, "headers": $headers, "foundWords": [${d.foundWords.map(jstr).mkString(",")}], "pages": $pages}"""
    }.mkString("[", ",", "]")
    s"""{"found": ${out.docs.size}, "foundPages": ${out.nFoundPages}, "words": [${out.words.map(w => s"""{"word": ${jstr(w.word)}, "nFound": ${w.nFound}}""").mkString(",")}], "result": $docs}"""
  }

  /** Client-input error marker: only THESE map to HTTP 400. Scala's
    * require() throws bare IllegalArgumentException, so an internal
    * invariant failure deep in the searcher during a valid request must
    * NOT read as a client error — handlers wrap parameter decoding and
    * request-syntax validation in [[clientScope]], and everything else
    * (including engine invariants) maps to 500. */
  private final class ClientError(msg: String, cause: Throwable)
    extends IllegalArgumentException(msg, cause)

  /** Run `body` with IllegalArgumentException (malformed int params,
    * query-parse rejections) reclassified as a client error. */
  private def clientScope[A](body: => A): A =
    try body catch {
      case e: ClientError => throw e
      case e: IllegalArgumentException => throw new ClientError(e.getMessage, e)
    }

  /** Shared endpoint wrapper: parse the query string, run the handler,
    * send (status, json). Status codes are REAL — 400 for missing/
    * malformed parameters or unparseable request syntax (the handler's
    * clientScope), 500 for internal failures — so standard clients
    * (curl -f, load-balancer health checks) can detect errors without
    * parsing bodies; previously every error went out as 200. */
  private def endpoint(f: Map[String, String] => (Int, String)): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (status, resp) =
          try {
            val q = Option(ex.getRequestURI.getQuery).getOrElse("")
            val params = clientScope {
              q.split('&').iterator.map(_.split("=", 2))
                .collect { case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
            }
            f(params)
          } catch {
            case e: ClientError =>
              (400, s"""{"error": ${jstr(String.valueOf(e.getMessage))}}""")
            case e: Throwable =>
              (500, s"""{"error": ${jstr(String.valueOf(e.getMessage))}}""")
          }
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json; charset=utf-8")
        ex.sendResponseHeaders(status, bytes.length)
        val os = ex.getResponseBody
        os.write(bytes)
        os.close()
      }
    }

  private val missingReq = (400, """{"error": "missing req parameter"}""")

  def serve(searcher: SparkSearcher, port: Int, block: Boolean): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    // Concurrent dispatch (≙ reference server.cs:38-41, one worker per
    // client): without setExecutor the JDK HttpServer runs every handler
    // on its single dispatcher thread, so one slow /search stalls every
    // /suggest autocomplete behind it — while the searcher itself is
    // proven safe under concurrent search/searchBatch (ConcurrentServeSpec).
    // Bounded pool of daemon threads: the driver is the scarce resource
    // (each request may launch Spark jobs), so cap concurrency instead of
    // thread-per-connection; daemon so an abandoned server never pins the
    // JVM.
    val nThreads = sys.env.get("GRAFT_SERVER_THREADS").map(_.toInt).getOrElse(
      math.min(16, math.max(2, Runtime.getRuntime.availableProcessors() / 2)))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      nThreads,
      (r: Runnable) => {
        val t = new Thread(r, "graft-server-worker")
        t.setDaemon(true)
        t
      }))
    server.createContext("/search", endpoint { params =>
      params.get("req") match {
        case Some(req) =>
          val dist = clientScope {
            val d = params.get("dist").map(_.toInt).getOrElse(graft.core.Consts.DefaultDist)
            // request-syntax validation is a client concern: reject an
            // unparseable query here, so a require() tripping inside the
            // engine afterwards still surfaces as the 500 it is
            graft.query.QueryParser.parse(req, searcher.analyzer.stopWords)
            d
          }
          (200, toJson(searcher.search(req, SearchOptions(dist = dist))))
        case None => missingReq
      }
    })
    server.createContext("/suggest", endpoint { params =>
      val req = params.getOrElse("req", "")
      (200, searcher.suggest(req).map(jstr).mkString("[", ",", "]"))
    })
    server.createContext("/bm25", endpoint { params =>
      params.get("req") match {
        case Some(req) =>
          val k = clientScope(params.get("k").map(_.toInt).getOrElse(10))
          val words = req.split("\\s+").toSeq.filter(_.nonEmpty)
          val top = searcher.bm25TopK(words, k)
          (200, top.map { case (d, sc) => s"""{"docId": $d, "score": ${jnum(sc)}}""" }
            .mkString("[", ",", "]"))
        case None => missingReq
      }
    })
    server.createContext("/close", endpoint { params =>
      params.get("req").filter(_.nonEmpty) match {
        case Some(req) => (200, searcher.closeWords(req).map(jstr).mkString("[", ",", "]"))
        case None => missingReq
      }
    })
    server.start()
    System.err.println(s"[graft-server] listening on :$port " +
      "(GET /search?req=..., /suggest?req=..., /bm25?req=...&k=10, /close?req=...)")
    if (block) Thread.currentThread().join()
    server
  }
}
