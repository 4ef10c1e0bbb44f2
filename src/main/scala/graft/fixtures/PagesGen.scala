package graft.fixtures

import graft.spark.PageRowIn
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic Common-Crawl-style `pages` corpus
  * (FIXTURES.md §1): seeded per-row generation, so any row count yields the
  * same prefix and tests/benches are hermetic. Generated distributed via
  * `spark.range` — no driver-side materialization, scales to any sf.
  *
  * Body text mixes: (1) the Pickwick golden paragraph on every `i % 7 == 0`
  * doc (so reference golden counts transfer), (2) Zipf-ish synthetic
  * sentences over a 10k-word vocabulary (hot terms for skew tests),
  * (3) digit tokens / short words / long words exercising the gates.
  * HTML templates T1–T5 exercise the extraction contract.
  */
object PagesGen {

  val pickwick: String = {
    val in = getClass.getResourceAsStream("/testtext1.txt")
    val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    s
  }

  /** 10k-word deterministic vocabulary: w0000..w9999 with a few hand-picked
    * real words mixed in so stemming paths run. */
  private val realWords = Array("running", "ladies", "national", "games",
    "merriment", "partnership", "winkle", "laughter", "matrimony", "company")

  def vocabWord(j: Int): String =
    if (j < realWords.length) realWords(j) else f"w$j%04d"

  /** Zipf-ish rank sampler: rank ~ floor(exp(u * ln(V))) gives a heavy head. */
  private def zipfRank(rnd: java.util.Random, v: Int): Int = {
    val u = rnd.nextDouble()
    math.min(v - 1, math.exp(u * math.log(v.toDouble)).toInt - 1)
  }

  def bodyFor(i: Long): String = {
    if (i % 7 == 0) pickwick
    else {
      val rnd = new java.util.Random(42L + i)
      val nWords = 120 + rnd.nextInt(280)
      val sb = new StringBuilder(nWords * 8)
      var w = 0
      while (w < nWords) {
        sb.append(vocabWord(zipfRank(rnd, 10000)))
        w += 1
        if (w % 12 == 0) {
          // sprinkle gate-exercising tokens
          rnd.nextInt(4) match {
            case 0 => sb.append(". ").append(1000 + rnd.nextInt(9000)).append(' ')
            case 1 => sb.append(" ab ") // 2-char, dropped
            case 2 => sb.append(' ').append("x" * 40).append(' ') // >32, dropped
            case _ => sb.append(".\n")
          }
        } else sb.append(' ')
      }
      sb.toString
    }
  }

  def htmlFor(i: Long): String = {
    val body = bodyFor(i)
    val escapedTitle = s"Doc Title $i"
    (i % 5) match {
      case 0 => s"<html><body><p>$body</p></body></html>"
      case 1 => s"<html><head><script>var x=1;</script><style>.a{}</style></head><body>$body</body></html>"
      case 2 => s"""<html><body><img src="p.png" alt="alt words here">$body</body></html>"""
      case 3 => s"""<html><head><title>$escapedTitle</title><meta Author="Author ${i % 13}"></head><body>$body</body></html>"""
      case _ => s"<html><body>$body \n\n  tail words \r\n here</body></html>"
    }
  }

  def urlFor(i: Long): String = f"https://site${i % 97}.example/p/$i%08d.html"

  /** Distributed generator. `withText=false` leaves `text` NULL so the
    * engine must run extractText(html) (the input_hint contract). */
  def pages(spark: SparkSession, n: Long, parts: Int = 32): Dataset[PageRowIn] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map { i =>
      val ts = new java.sql.Timestamp(1767225600000L + i * 37000L) // 2026-01-01 + i*37s
      val lang = if (i % 20 == 19) "ru" else "en"
      PageRowIn(urlFor(i), ts, htmlFor(i).getBytes(java.nio.charset.StandardCharsets.UTF_8), null, lang)
    }
  }

  /** Driver-side tiny corpus for unit tests (no Spark). */
  def localPages(n: Int): Seq[(String, String)] =
    (0 until n).map(i => (urlFor(i.toLong), htmlFor(i.toLong)))
}
