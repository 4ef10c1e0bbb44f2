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

  test("driver receives one row of ≤cap ids per query, regardless of partition count") {
    val cap = 7
    val nQis = 3
    val nParts = 96 // far above defaultParallelism — the old collect() scaled with this
    // partition p contributes docIds in [p*1000, p*1000+cap) for every qi —
    // disjoint across partitions, like real doc shards
    val perPart = spark.sparkContext
      .parallelize(0 until nParts, nParts)
      .flatMap(p => (0 until nQis).map(qi => (qi, Array.tabulate(cap)(i => p * 1000L + i))))
    val out = SparkSearcher.mergeFieldHits(perPart, cap, nQis)
    assert(out.length <= nQis, s"driver received ${out.length} rows for $nQis queries")
    out.foreach { case (_, ids) => assert(ids.length <= cap, "per-query row exceeds cap") }
    // values: the globally smallest cap docIds per query, ascending
    val want = (0 until nParts).flatMap(p => (0 until cap).map(i => p * 1000L + i))
      .sorted.take(cap)
    out.foreach { case (qi, ids) =>
      assert(ids.toSeq == want, s"qi=$qi merged ids diverge from global sorted take(cap)")
    }
    assert(out.map(_._1).toSet == (0 until nQis).toSet, "a query's hits were dropped")
  }

  test("uneven and empty contributions merge to the global first-cap set") {
    val cap = 5
    val perPart = spark.sparkContext.parallelize(Seq(
      (0, Array(10L, 20L, 30L)),
      (0, Array(5L, 15L)),
      (0, Array(1L, 2L, 3L, 4L)),
      (1, Array(100L))), 17)
    val out = SparkSearcher.mergeFieldHits(perPart, cap, 2).toMap
    assert(out(0).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out(1).toSeq == Seq(100L))
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
