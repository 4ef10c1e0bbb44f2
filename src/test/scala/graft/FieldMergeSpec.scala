package graft.spark

import graft.fixtures.PagesGen
import graft.mem.MemIndex
import graft.query.SearchOptions
import graft.text.{Analyzer, HtmlExtract}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The batch field-membership pass must bound what reaches the driver by
  * the QUERY count, never the scan partition count: at 10^12 docs a
  * snapshot has 10^5–10^6 posting files, and a per-partition collect of a
  * broad field query ({Source=web} ≈ every doc) is gigabytes of docIds.
  * `mergeFieldHits` is the distributed bounded merge that replaced it —
  * these pins are on its output SHAPE (what `.collect()` ships) as well as
  * its values.
  */
class FieldMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("fieldmerge-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("boundedFirstK: globally smallest cap ids, O(cap) memory, any partition count") {
    val cap = 7
    val nParts = 96 // the shape: one capped ascending array per scan partition
    val arrays = (0 until nParts).map(p => Array.tabulate(cap)(i => p * 1000L + i))
    val got = SparkSearcher.boundedFirstK(arrays.iterator, cap)
    val want = arrays.flatten.sorted.take(cap)
    assert(got.toSeq == want.toSeq, "merged ids diverge from global sorted take(cap)")
    assert(got.length <= cap)
  }

  test("boundedFirstK: uneven and empty contributions merge to the global first-cap set") {
    val cap = 5
    val in = Seq(Array(10L, 20L, 30L), Array.emptyLongArray, Array(5L, 15L), Array(1L, 2L, 3L, 4L))
    assert(SparkSearcher.boundedFirstK(in.iterator, cap).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(SparkSearcher.boundedFirstK(Iterator.empty, cap).isEmpty)
    assert(SparkSearcher.boundedFirstK(Iterator(Array(9L, 8L)), 1).toSeq == Seq(8L))
  }

  test("batch field query identical to sequential search (end-to-end through the merge)") {
    val n = 150
    val dir = java.nio.file.Files.createTempDirectory("graftfm").toString
    val pages = PagesGen.pages(spark, n, parts = 5)
    IndexBuilder.build(spark, pages.toDF(), dir, IndexBuilder.BuildConfig(bucketBits = 4))
    val searcher = new SparkSearcher(spark, dir, Analyzer())
    val mem = new MemIndex(Analyzer())
    PagesGen.localPages(n).sortBy(_._1).foreach { case (url, html) =>
      val ex = HtmlExtract.extract(html)
      if (ex.text.nonEmpty) mem.addDoc("web:" + url, ex.headers(url, "web"), Seq(("1", ex.text)))
    }
    val reqs: Seq[(String, SearchOptions)] = Seq(
      ("merriment {Source=web}", SearchOptions()),
      ("old {Source=web}", SearchOptions()), // broad body AND broad field
      ("lady old", SearchOptions(dist = 40)))
    val batch = searcher.searchBatch(reqs, withWordInfo = true)
    reqs.zip(batch).foreach { case ((q, opt), b) =>
      val a = mem.search(q, opt)
      assert(a.nFoundPages == b.nFoundPages, s"[$q] nFoundPages")
      assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"[$q] docIds")
      assert(a.docs.map(_.bm25) == b.docs.map(_.bm25), s"[$q] bm25")
      assert(a.docs.map(d => d.pages.map(p => (p.pageId, p.pos.toSeq))) ==
        b.docs.map(d => d.pages.map(p => (p.pageId, p.pos.toSeq))), s"[$q] pages")
    }
  }
}
