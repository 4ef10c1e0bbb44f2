package graft.fixtures

import graft.text.HtmlExtract

/** The committed golden-extraction manifest (FIXTURES.md §1): pins the
  * byte-exact HtmlExtract contract (WebDataSource.cs:213-269 semantics)
  * independent of the Spark path. Each entry is
  * `name <TAB> sha256(text) <TAB> sha256(headers(name, "web"))`.
  *
  * Inputs come from two places:
  *  - the deterministic T1–T5 template corpus (PagesGen.htmlFor, i = 0..9),
  *    recomputed by the spec, and
  *  - hand-written hostile-HTML files committed next to the manifest
  *    (unclosed tags, entities, script/style with markup-looking strings,
  *    quirky attributes, comments/doctype, duplicate titles, whitespace
  *    runs, empty body).
  *
  * Regenerate ONLY after an intentional contract change:
  *   sbt "runMain graft.fixtures.ExtractGoldens"
  * (writes src/test/resources/golden/extract/GOLDENS.tsv; review the diff).
  */
object ExtractGoldens {

  val manifestPath = "src/test/resources/golden/extract/GOLDENS.tsv"
  val fixtureDir = "src/test/resources/golden/extract"

  def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  val generatedIds: Seq[Long] = 0L until 10L

  def hostileFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("hostile") && f.getName.endsWith(".html"))
      .sortBy(_.getName).toSeq

  /** name → (sha256(text), sha256(headers)) over all golden inputs. */
  def compute(resourceDir: java.io.File): Seq[(String, String, String)] = {
    val gen = generatedIds.map { i =>
      val url = PagesGen.urlFor(i)
      val ex = HtmlExtract.extract(PagesGen.htmlFor(i))
      (url, sha256(ex.text), sha256(ex.headers(url, "web")))
    }
    val hostile = hostileFiles(resourceDir).map { f =>
      val html = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val ex = HtmlExtract.extract(html)
      (f.getName, sha256(ex.text), sha256(ex.headers(f.getName, "web")))
    }
    gen ++ hostile
  }

  def main(args: Array[String]): Unit = {
    val rows = compute(new java.io.File(fixtureDir))
    val out = rows.map { case (n, t, h) => s"$n\t$t\t$h" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(manifestPath),
      out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[extract-goldens] wrote ${rows.size} entries to $manifestPath")
  }
}
