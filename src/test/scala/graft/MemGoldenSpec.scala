package graft

import graft.mem.MemIndex
import graft.query.SearchOptions
import graft.text.{Analyzer, Vocab}
import org.scalatest.funsuite.AnyFunSuite

/** The reference xUnit golden query set, ported count-for-count from
  * /root/reference/XUnitDocodoTest/IndexTest.cs (CoordTest:126-162,
  * RequestSyntaxTest:164-226, VocabTest:228-270, PageTextTest:321-338),
  * over the same 2-doc × N-page Pickwick corpus. These counts pin the
  * whole chain: tokenizer → postings → query parser → positional kernel →
  * result assembly.
  */
class MemGoldenSpec extends AnyFunSuite {

  val testText1: String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/testtext1.txt").toURI)),
    java.nio.charset.StandardCharsets.UTF_8)

  val testHeaders1 = "Size=190\nSource=Test\nTitle=Charles Diskense Pickwick Club\n"

  /** TestDataSource equivalent: docs "Sample" and "Dump", nPages copies of
    * TestText1 each (IndexTest.cs:87-124). */
  def buildIndex(nPages: Int, an: Analyzer = Analyzer()): MemIndex = {
    val idx = new MemIndex(an)
    Seq("Sample", "Dump").foreach { name =>
      idx.addDoc("Test:" + name, testHeaders1 + s"Name=$name\n",
        (1 to nPages).map(q => (q.toString, testText1)))
    }
    idx
  }

  def regexPositions(word: String): Seq[Int] = {
    val m = java.util.regex.Pattern.compile("\\b" + word + "\\b")
      .matcher(testText1.toLowerCase(java.util.Locale.ROOT))
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (m.find()) out += m.start()
    out.toSeq
  }

  // page pos arrays across docs in docId order (≙ res.foundPages)
  def allPages(out: graft.query.SearchOut): Seq[(String, Array[Int])] =
    out.docs.sortBy(_.docId).flatMap(_.pages.map(p => (p.pageId, p.pos)))

  test("CoordTest: per-page positions equal regex oracle (2 docs x 1000 pages)") {
    val n = 1000
    val idx = buildIndex(n)
    Seq("and", "tupman", "everybody", "old").foreach { word =>
      val pos = regexPositions(word)
      val res = idx.search(word)
      assert(res.nFoundPages == 2 * n, s"$word pages")
      val pages = allPages(res)
      assert(pages.head._2.length == pos.length, s"$word count")
      pages.foreach { case (_, ps) => assert(ps.toSeq == pos, s"$word positions") }
    }
  }

  lazy val idx100: MemIndex = buildIndex(100)

  test("RequestSyntaxTest: and (tupman|old)") {
    val res = idx100.search("and (tupman|old)")
    assert(res.docs.size == 2)
    assert(res.docs.forall(_.pages.size == 100))
    val pages = allPages(res)
    assert(pages.forall(_._2.length == 42), s"got ${pages.head._2.length}")
    assert(pages(0)._2.toSeq == pages(1)._2.toSeq)
  }

  test("RequestSyntaxTest: field filter {Name=Dump}") {
    val res = idx100.search("and (tupman|old) {Name=Dump}")
    assert(res.docs.size == 1)
    assert(res.docs.head.pages.size == 100)
    assert(res.nFoundPages == 200) // body pages of both docs still count
  }

  val d40 = SearchOptions(dist = 40)

  test("RequestSyntaxTest: proximity and phrases") {
    assert(allPages(idx100.search("lady old", d40)).head._2.length == 10)
    assert(allPages(idx100.search("\"lady\" old", d40)).head._2.length == 8)
    assert(allPages(idx100.search("\"old lady\"", d40)).head._2.length == 8)
    assert(idx100.search("\"lady old\"", d40).nFoundPages == 0)
    assert(allPages(idx100.search("lady (old | young)", d40)).head._2.length == 12)
    assert(allPages(idx100.search("\"old ladies were\"", d40)).head._2.length == 3)
    assert(idx100.search("\"old lady were\"", d40).nFoundPages == 0)
    assert(allPages(idx100.search("\"old (lady|ladies) (who|were|looked)\"", d40)).head._2.length == 9)
  }

  test("RequestSyntaxTest: wildcard ?an?") {
    val m = java.util.regex.Pattern.compile("\\w*an\\w*")
      .matcher(testText1.toLowerCase(java.util.Locale.ROOT))
    var expected = 0
    while (m.find()) expected += 1
    assert(allPages(idx100.search("?an?", d40)).head._2.length == expected)
  }

  test("VocabTest: group postings count and voc/no-voc search equivalence") {
    val voc = Vocab("en", Map("and" -> 1, "end" -> 3, "old" -> 2, "the" -> 6,
      "them" -> 5, "then" -> 4), ('a', 'z'))
    val vocIdx = buildIndex(100, Analyzer(vocabs = Seq(voc)))
    val nAnd = regexPositions("and").length
    assert(vocIdx.cf("#1") == nAnd.toLong * 2 * 100)
    Seq("Tupman", "and", "Tupman and").foreach { q =>
      val a = allPages(vocIdx.search(q))
      val b = allPages(idx100.search(q))
      assert(a.map(_._2.toSeq) == b.map(_._2.toSeq), s"query $q")
    }
  }

  test("PageTextTest: snippet markers and header highlight") {
    val idx = new MemIndex(Analyzer())
    idx.addDoc("Test:Test", "Name=Test\n", Seq(("1", testText1)))
    val res = idx.search("\"old lady\"")
    assert(res.docs.head.pages.head.text.contains("ˋoldˊ"))
    val res2 = idx.search("Test")
    assert(res2.docs.head.headers("Name").contains("ˋTestˊ"))
  }

  test("suggestions order by cf desc") {
    val s = idx100.suggest("go old")
    assert(s.isEmpty || s.forall(_.nonEmpty))
    val s2 = idx100.suggest("lad")
    assert(s2.nonEmpty) // ladies, lady, ...
  }

  test("doc rank: header-page hits get x10 and rank formula holds") {
    val idx = new MemIndex(Analyzer())
    idx.addDoc("Test:T", "Name=zebra\n", Seq(("1", "plain words only here")))
    val res = idx.search("zebra")
    assert(res.docs.size == 1)
    val d = res.docs.head
    // single header hit: page rank = 1 + ln(1) = 1; doc rank = (1+ln(1))*10
    assert(math.abs(d.rank - 10.0f) < 1e-5, s"rank=${d.rank}")
  }
}
