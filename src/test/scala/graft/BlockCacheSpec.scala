package graft

import graft.fixtures.PagesGen
import graft.mem.MemIndex
import graft.query.SearchOptions
import graft.spark.{BlockCache, IndexBuilder, SparkSearcher}
import graft.text.{Analyzer, HtmlExtract}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The executor-resident positional block cache must be invisible to
  * results: hot batches identical to cold AND to the single-threaded
  * reference engine, rebuilds into the same directory can never serve the
  * previous build's blocks (content-hashed tags), and a tiny/zero budget
  * degrades to the filtered parquet scan with identical output.
  */
class BlockCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("blockcache-spec")
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

  private val queries: Seq[(String, SearchOptions)] = Seq(
    ("\"old lady\"", SearchOptions(dist = 40)),
    ("lady old", SearchOptions(dist = 40)),
    ("and (tupman|old)", SearchOptions()),
    ("merriment {Source=web}", SearchOptions()),
    ("w0001 w0002", SearchOptions()),
    ("?ady?", SearchOptions(dist = 40)))

  private def canon(outs: Seq[graft.query.SearchOut]): Seq[String] =
    outs.map(graft.tools.SearchProbe.canonical)

  private def assertVsRef(got: Seq[graft.query.SearchOut], ref: MemIndex, label: String): Unit =
    queries.zip(got).foreach { case ((q, o), b) =>
      val a = ref.search(q, o)
      assert(a.nFoundPages == b.nFoundPages, s"$label [$q] nFoundPages")
      assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"$label [$q] docIds")
      assert(a.docs.map(_.rank) == b.docs.map(_.rank), s"$label [$q] ranks")
      a.docs.zip(b.docs).foreach { case (da, db) =>
        assert(da.pages.map(p => (p.pageId, p.pos.toSeq)) ==
          db.pages.map(p => (p.pageId, p.pos.toSeq)), s"$label [$q] pages doc ${da.docId}")
      }
    }

  test("hot searchBatch identical to cold and to the reference; cache populates") {
    BlockCache.clear()
    // force-enable: the suite must stay green under GRAFT_BLOCK_CACHE_MB=0
    // (serving-mode independence run) and this test is ABOUT the cache
    BlockCache.maxBytesOverride = Some(4096L << 20)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graftbc1").toString
      buildInto(dir, 150)
      val searcher = new SparkSearcher(spark, dir, Analyzer())
      val ref = memOf(150)
      val cold = searcher.searchBatch(queries, withWordInfo = false)
      assert(BlockCache.totalBytes > 0, "block cache did not populate on the cold batch")
      val hot = searcher.searchBatch(queries, withWordInfo = false)
      assert(canon(hot) == canon(cold), "hot searchBatch diverged from cold")
      assertVsRef(hot, ref, "cache-served")
      // single-query path shares the cache
      val single = queries.map { case (q, o) => searcher.search(q, o, withWordInfo = false) }
      assertVsRef(single, ref, "single cache-served")
    } finally BlockCache.maxBytesOverride = None
  }

  test("rebuild into the same directory never serves stale block entries") {
    BlockCache.clear()
    BlockCache.maxBytesOverride = Some(4096L << 20)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graftbc2").toString
      buildInto(dir, 150)
      val s1 = new SparkSearcher(spark, dir, Analyzer())
      s1.searchBatch(queries, withWordInfo = false) // fill with the 150-doc build
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(dir))
      buildInto(dir, 70)
      val s2 = new SparkSearcher(spark, dir, Analyzer())
      assertVsRef(s2.searchBatch(queries, withWordInfo = false), memOf(70), "post-rebuild")
    } finally BlockCache.maxBytesOverride = None
  }

  test("tiny/zero budget degrades to the filtered scan, identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graftbc3").toString
    buildInto(dir, 150)
    val ref = memOf(150)
    try {
      BlockCache.clear()
      // smaller than the residency estimate → filtered parquet scan, cache untouched
      BlockCache.maxBytesOverride = Some(4096L)
      val s1 = new SparkSearcher(spark, dir, Analyzer())
      assertVsRef(s1.searchBatch(queries, withWordInfo = false), ref, "tiny budget")
      assert(BlockCache.totalBytes == 0L, "cache touched despite failing the residency estimate")
      assertVsRef(queries.map { case (q, o) => s1.search(q, o, withWordInfo = false) },
        ref, "tiny budget single")
      // zero budget = disabled entirely
      BlockCache.maxBytesOverride = Some(0L)
      val s2 = new SparkSearcher(spark, dir, Analyzer())
      assertVsRef(s2.searchBatch(queries, withWordInfo = false), ref, "cache off")
      // withWordInfo on the SCAN path (the streaming-decode ingest branch
      // only runs when the cache is off — tests default cache-on, so pin
      // it here): per-leaf counts must equal the cache-served batch's
      BlockCache.maxBytesOverride = Some(4096L << 20)
      val s3 = new SparkSearcher(spark, dir, Analyzer())
      val wiCached = s3.searchBatch(queries, withWordInfo = true)
      BlockCache.maxBytesOverride = Some(0L)
      val s4 = new SparkSearcher(spark, dir, Analyzer())
      val wiScan = s4.searchBatch(queries, withWordInfo = true)
      wiCached.zip(wiScan).zip(queries).foreach { case ((a, b), (q, _)) =>
        assert(a.words.map(w => (w.word, w.nFound)) ==
          b.words.map(w => (w.word, w.nFound)), s"wordInfo scan-vs-cache [$q]")
        assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"wordInfo docs [$q]")
      }
    } finally {
      BlockCache.maxBytesOverride = None
      BlockCache.clear()
    }
  }

  test("LRU eviction across competing snapshots keeps results exact") {
    val dirA = java.nio.file.Files.createTempDirectory("graftbcA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graftbcB").toString
    buildInto(dirA, 150)
    buildInto(dirB, 150)
    val ref = memOf(150)
    // budget = one snapshot's worth: serving both alternately forces
    // evictions and refills, all of which must stay identical
    val oneSnapshot = {
      BlockCache.clear()
      BlockCache.maxBytesOverride = Some(4096L << 20)
      val s = new SparkSearcher(spark, dirA, Analyzer())
      s.searchBatch(queries.take(1), withWordInfo = false)
      BlockCache.totalBytes
    }
    try {
      BlockCache.clear()
      // budget must admit each snapshot individually (≥ the driver's
      // disk-based residency estimate) while forcing eviction when both
      // are resident (< 2× one snapshot's decoded footprint)
      val diskEst = {
        val d = IndexBuilder.listParquetFiles(spark, s"$dirA/postings").map(_._2).sum
        d + (d >> 1) + (d >> 3)
      }
      val budget = math.max(oneSnapshot + (oneSnapshot >> 2), diskEst)
      BlockCache.maxBytesOverride = Some(budget)
      val sA = new SparkSearcher(spark, dirA, Analyzer())
      val sB = new SparkSearcher(spark, dirB, Analyzer())
      assertVsRef(sA.searchBatch(queries, withWordInfo = false), ref, "A under pressure")
      assertVsRef(sB.searchBatch(queries, withWordInfo = false), ref, "B under pressure")
      assertVsRef(sA.searchBatch(queries, withWordInfo = false), ref, "A after eviction")
      assert(BlockCache.totalBytes <= budget, "eviction did not enforce the budget")
    } finally {
      BlockCache.maxBytesOverride = None
      BlockCache.clear()
    }
  }

  test("two-touch position decode: selective, upgrading and decoded batches identical") {
    // r6: the first batch touching a term decodes positions SELECTIVELY
    // (bootstrap pays only its candidates), the second touch upgrades to
    // the cached fully-decoded form, the third serves it — all three
    // paths must be result-identical to each other and to the reference.
    BlockCache.clear()
    BlockCache.maxBytesOverride = Some(4096L << 20)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graftbc2t").toString
      buildInto(dir, 150)
      val searcher = new SparkSearcher(spark, dir, Analyzer())
      val ref = memOf(150)
      val b1 = searcher.searchBatch(queries, withWordInfo = false) // selective decode
      val b2 = searcher.searchBatch(queries, withWordInfo = false) // upgrade touch
      val b3 = searcher.searchBatch(queries, withWordInfo = false) // decoded-served
      assert(canon(b2) == canon(b1), "upgrade batch diverged from selective batch")
      assert(canon(b3) == canon(b1), "decoded batch diverged from selective batch")
      assertVsRef(b3, ref, "two-touch")
    } finally {
      BlockCache.maxBytesOverride = None
      BlockCache.clear()
    }
  }

  test("text fetch past the In-list threshold: broadcast-set path identical") {
    // r6: searchBatch's snippet-text fetch switches from an In-literal
    // filter to a docId-range + broadcast hash-set filter past
    // graft.textFetchInListMax ids (VERDICT #5); forcing the threshold to
    // 0 must leave every result — snippets included — identical.
    val dir = java.nio.file.Files.createTempDirectory("graftbctf").toString
    buildInto(dir, 150)
    val prev = sys.props.get("graft.textFetchInListMax")
    try {
      // separate searchers so the text LRU cannot mask the fetch path;
      // text memo off via a 0-budget? keep default: use distinct searchers
      sys.props.remove("graft.textFetchInListMax")
      val sIn = new SparkSearcher(spark, dir, Analyzer())
      val inList = sIn.searchBatch(queries, withWordInfo = false)
      sys.props.put("graft.textFetchInListMax", "0")
      val sBc = new SparkSearcher(spark, dir, Analyzer())
      val bcast = sBc.searchBatch(queries, withWordInfo = false)
      assert(canon(bcast) == canon(inList), "broadcast text-fetch path diverged")
      inList.zip(bcast).foreach { case (a, b) =>
        assert(a.docs.map(_.summary) == b.docs.map(_.summary), "summaries diverged")
        assert(a.docs.map(_.pages.map(_.text)) == b.docs.map(_.pages.map(_.text)),
          "snippet texts diverged")
      }
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.textFetchInListMax", v)
        case None => sys.props.remove("graft.textFetchInListMax")
      }
    }
  }
}
