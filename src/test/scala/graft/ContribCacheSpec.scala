package graft

import graft.fixtures.PagesGen
import graft.mem.MemIndex
import graft.spark.{ContribCache, IndexBuilder, SparkSearcher}
import graft.text.{Analyzer, HtmlExtract}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The executor-resident batch-scorer cache must be invisible to results:
  * hot batches bit-identical to cold, rebuilds into the same directory can
  * never serve the previous build's postings (content-hashed tags), and a
  * tiny budget (evicted / unpublished shards) degrades to the uncached
  * decode with identical output.
  */
class ContribCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("contribcache-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def memOf(n: Int): MemIndex = {
    val m = new MemIndex(Analyzer())
    PagesGen.localPages(n).sortBy(_._1).foreach { case (url, html) =>
      val ex = HtmlExtract.extract(html)
      if (ex.text.nonEmpty) m.addDoc("web:" + url, ex.headers(url, "web"), Seq(("1", ex.text)))
    }
    m
  }

  private def buildInto(dir: String, n: Int): Unit = {
    val pages = PagesGen.pages(spark, n, parts = 5)
    IndexBuilder.build(spark, pages.toDF(), dir, IndexBuilder.BuildConfig(bucketBits = 4))
  }

  private val queries: Seq[Seq[String]] = Seq(
    Seq("old", "lady"), Seq("tupman"), Seq("merriment", "laughter", "game"),
    Seq("w0007", "old"), Seq("w0001", "w0002", "w0003"))

  test("hot batch bit-identical to cold; cache populates and is version-pinned") {
    ContribCache.clear()
    // force-enable: the suite must stay green under GRAFT_CONTRIB_CACHE_MB=0
    // (serving-mode independence run) and this test is ABOUT the cache
    ContribCache.maxBytesOverride = Some(4096L << 20)
    try {
    val dir = java.nio.file.Files.createTempDirectory("graftcc1").toString
    buildInto(dir, 150)
    val searcher = new SparkSearcher(spark, dir, Analyzer())
    val ref = memOf(150)
    val cold = searcher.bm25TopKBatch(queries, 10)
    assert(ContribCache.totalBytes > 0, "cache did not populate on the cold batch")
    val t1 = ContribCache.totalBytes
    val hot = searcher.bm25TopKBatch(queries, 10)
    assert(hot == cold, "hot batch diverged from cold")
    queries.zipWithIndex.foreach { case (q, i) =>
      assert(hot(i) == ref.bm25TopK(q, 10), s"cached scores diverge from reference [$q]")
    }
    // a new query set promotes more codes post-publish; the global budget
    // accounting must see that growth (it drives eviction honesty)
    val extra = Seq(Seq("running", "ladies"), Seq("laughter", "company"))
    val r2 = searcher.bm25TopKBatch(extra, 10)
    extra.zipWithIndex.foreach { case (q, i) =>
      assert(r2(i) == ref.bm25TopK(q, 10), s"post-publish promotion diverges [$q]")
    }
    assert(ContribCache.totalBytes >= t1, "promotion growth not accounted")
    } finally ContribCache.maxBytesOverride = None
  }

  test("rebuild into the same directory never serves stale cache entries") {
    ContribCache.clear()
    ContribCache.maxBytesOverride = Some(4096L << 20)
    try {
    val dir = java.nio.file.Files.createTempDirectory("graftcc2").toString
    buildInto(dir, 150)
    val s1 = new SparkSearcher(spark, dir, Analyzer())
    s1.bm25TopKBatch(queries, 10) // fill the cache with the 150-doc build
    // wipe and rebuild a DIFFERENT corpus into the same path: same version
    // number, different parquet part UUIDs — the bench/test pattern that a
    // (dir, version)-only tag would silently alias
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(dir))
    buildInto(dir, 70)
    val s2 = new SparkSearcher(spark, dir, Analyzer())
    val got = s2.bm25TopKBatch(queries, 10)
    val ref = memOf(70)
    queries.zipWithIndex.foreach { case (q, i) =>
      assert(got(i) == ref.bm25TopK(q, 10), s"stale cache entry served after rebuild [$q]")
    }
    } finally ContribCache.maxBytesOverride = None
  }

  test("tiny budget (residency auto-fallback) degrades to the pruned scan, identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graftcc3").toString
    buildInto(dir, 150)
    val ref = memOf(150)
    try {
      ContribCache.clear()
      // smaller than the driver-side residency estimate → the batch takes
      // the InSet-pruned scan path and never touches the cache
      ContribCache.maxBytesOverride = Some(4096L)
      val searcher = new SparkSearcher(spark, dir, Analyzer())
      val got = searcher.bm25TopKBatch(queries, 10)
      queries.zipWithIndex.foreach { case (q, i) =>
        assert(got(i) == ref.bm25TopK(q, 10), s"tiny-budget results diverge [$q]")
      }
      assert(ContribCache.totalBytes == 0L, "cache touched despite failing the residency estimate")
      // zero budget = cache disabled entirely (the isin scan path)
      ContribCache.maxBytesOverride = Some(0L)
      val s2 = new SparkSearcher(spark, dir, Analyzer())
      val got2 = s2.bm25TopKBatch(queries, 10)
      queries.zipWithIndex.foreach { case (q, i) =>
        assert(got2(i) == ref.bm25TopK(q, 10), s"cache-off results diverge [$q]")
      }
    } finally {
      ContribCache.maxBytesOverride = None
      ContribCache.clear()
    }
  }

  test("slot-chunked hot batches (wave smoothing) are bit-identical to unchunked and reference") {
    ContribCache.clear()
    ContribCache.maxBytesOverride = Some(4096L << 20)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graftcc4").toString
      buildInto(dir, 150)
      val searcher = new SparkSearcher(spark, dir, Analyzer())
      val ref = memOf(150)
      // widen the batch so the slot space has something to split (distinct
      // code sets = distinct slots), including duplicates (slot fan-out)
      val wide = queries ++ Seq(Seq("running"), Seq("ladies", "game"),
        Seq("company", "old"), Seq("tupman", "lady"), Seq("old", "lady"))
      val cold = searcher.bm25TopKBatch(wide, 10) // fills cache, marks tag warm
      for (chunks <- Seq(2, 3, 7)) {
        SparkSearcher.slotChunksOverride = Some(chunks)
        val hot = searcher.bm25TopKBatch(wide, 10)
        assert(hot == cold, s"chunked hot batch (g=$chunks) diverged from cold")
      }
      SparkSearcher.slotChunksOverride = None
      wide.zipWithIndex.foreach { case (q, i) =>
        assert(cold(i) == ref.bm25TopK(q, 10), s"reference diverges [$q]")
      }
    } finally {
      SparkSearcher.slotChunksOverride = None
      ContribCache.maxBytesOverride = None
      ContribCache.clear()
    }
  }

  test("LRU eviction across competing snapshots keeps results exact") {
    // two snapshots of the SAME corpus in different dirs: distinct cache
    // keys, equal footprints — under a budget equal to ONE snapshot's
    // residency estimate, serving both forces evictions and re-decodes,
    // all of which must stay bit-identical to the reference
    val dirA = java.nio.file.Files.createTempDirectory("graftccA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graftccB").toString
    buildInto(dirA, 150)
    buildInto(dirB, 150)
    val ref = memOf(150)
    val snap = graft.spark.IndexStore.readSnapshot(dirA).get
    val est = 12L * snap.totalPostings + 48L * snap.nDocs
    try {
      ContribCache.clear()
      ContribCache.maxBytesOverride = Some(est)
      val sA = new SparkSearcher(spark, dirA, Analyzer())
      val sB = new SparkSearcher(spark, dirB, Analyzer())
      val gotA = sA.bm25TopKBatch(queries, 10)
      val gotB = sB.bm25TopKBatch(queries, 10)
      val gotA2 = sA.bm25TopKBatch(queries, 10) // after B pushed A out (or not — either is legal)
      queries.zipWithIndex.foreach { case (q, i) =>
        val want = ref.bm25TopK(q, 10)
        assert(gotA(i) == want, s"A under budget pressure diverges [$q]")
        assert(gotB(i) == want, s"B under budget pressure diverges [$q]")
        assert(gotA2(i) == want, s"A re-decode after eviction diverges [$q]")
      }
      // STRICT bound since round 5: notePublishedGrowth itself evicts when
      // promote growth pushes the total over budget (previously eviction
      // ran only at publish time, so post-publish growth made this a soft
      // bound with a 1.5x test margin)
      assert(ContribCache.totalBytes <= est, "growth-triggered eviction did not enforce the budget")
    } finally {
      ContribCache.maxBytesOverride = None
      ContribCache.clear()
    }
  }
}
