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
  }

  test("rebuild into the same directory never serves stale cache entries") {
    ContribCache.clear()
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
  }

  test("tiny budget (unpublished / evicted shards) degrades to uncached, identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graftcc3").toString
    buildInto(dir, 150)
    val ref = memOf(150)
    try {
      ContribCache.clear()
      ContribCache.maxBytesOverride = Some(4096L) // smaller than any shard
      val searcher = new SparkSearcher(spark, dir, Analyzer())
      val got = searcher.bm25TopKBatch(queries, 10)
      queries.zipWithIndex.foreach { case (q, i) =>
        assert(got(i) == ref.bm25TopK(q, 10), s"tiny-budget results diverge [$q]")
      }
      assert(ContribCache.totalBytes <= 4096L, "budget exceeded")
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
}
