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

  def toJson(out: SearchOut): String = {
    val docs = out.docs.map { d =>
      val pages = d.pages.map { p =>
        s"""{"id": ${jstr(p.pageId)}, "rank": ${p.rank}, "pos": [${p.pos.mkString(",")}], "text": ${jstr(p.text)}}"""
      }.mkString("[", ",", "]")
      val headers = d.headers.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
      s"""{"docId": ${d.docId}, "name": ${jstr(d.name)}, "rank": ${d.rank}, "bm25": ${d.bm25}, "summary": ${jstr(d.summary)}, "headers": $headers, "foundWords": [${d.foundWords.map(jstr).mkString(",")}], "pages": $pages}"""
    }.mkString("[", ",", "]")
    s"""{"found": ${out.docs.size}, "foundPages": ${out.nFoundPages}, "words": [${out.words.map(w => s"""{"word": ${jstr(w.word)}, "nFound": ${w.nFound}}""").mkString(",")}], "result": $docs}"""
  }

  def serve(searcher: SparkSearcher, port: Int, block: Boolean): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/search", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val resp =
          try {
            val q = Option(ex.getRequestURI.getQuery).getOrElse("")
            val params = q.split('&').iterator.map(_.split("=", 2))
              .collect { case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
            params.get("req") match {
              case Some(req) =>
                val dist = params.get("dist").map(_.toInt).getOrElse(graft.core.Consts.DefaultDist)
                toJson(searcher.search(req, SearchOptions(dist = dist)))
              case None => """{"error": "missing req parameter"}"""
            }
          } catch {
            case e: Throwable => s"""{"error": ${jstr(String.valueOf(e.getMessage))}}"""
          }
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        os.write(bytes)
        os.close()
      }
    })
    server.createContext("/suggest", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val resp =
          try {
            val q = Option(ex.getRequestURI.getQuery).getOrElse("")
            val req = q.split('&').iterator.map(_.split("=", 2))
              .collectFirst { case Array("req", v) => java.net.URLDecoder.decode(v, "UTF-8") }.getOrElse("")
            searcher.suggest(req).map(jstr).mkString("[", ",", "]")
          } catch {
            case e: Throwable => s"""{"error": ${jstr(String.valueOf(e.getMessage))}}"""
          }
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        os.write(bytes)
        os.close()
      }
    })
    server.createContext("/bm25", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val resp =
          try {
            val q = Option(ex.getRequestURI.getQuery).getOrElse("")
            val params = q.split('&').iterator.map(_.split("=", 2))
              .collect { case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
            params.get("req") match {
              case Some(req) =>
                val k = params.get("k").map(_.toInt).getOrElse(10)
                val words = req.split("\\s+").toSeq.filter(_.nonEmpty)
                val top = searcher.bm25TopK(words, k)
                top.map { case (d, s) => s"""{"docId": $d, "score": $s}""" }
                  .mkString("[", ",", "]")
              case None => """{"error": "missing req parameter"}"""
            }
          } catch {
            case e: Throwable => s"""{"error": ${jstr(String.valueOf(e.getMessage))}}"""
          }
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        os.write(bytes)
        os.close()
      }
    })
    server.createContext("/close", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val resp =
          try {
            val q = Option(ex.getRequestURI.getQuery).getOrElse("")
            val req = q.split('&').iterator.map(_.split("=", 2))
              .collectFirst { case Array("req", v) => java.net.URLDecoder.decode(v, "UTF-8") }.getOrElse("")
            if (req.isEmpty) """{"error": "missing req parameter"}"""
            else searcher.closeWords(req).map(jstr).mkString("[", ",", "]")
          } catch {
            case e: Throwable => s"""{"error": ${jstr(String.valueOf(e.getMessage))}}"""
          }
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        os.write(bytes)
        os.close()
      }
    })
    server.start()
    System.err.println(s"[graft-server] listening on :$port " +
      "(GET /search?req=..., /suggest?req=..., /bm25?req=...&k=10, /close?req=...)")
    if (block) Thread.currentThread().join()
    server
  }
}
