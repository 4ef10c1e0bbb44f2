package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.query.{SearchOptions, SearchOut}
import graft.spark.{BlockCache, IndexBuilder, SparkSearcher}
import graft.text.Analyzer
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** REST serves batches CONCURRENTLY on one searcher, so every serving
  * memo (plan memo + its df map, snippet-text LRU, block cache fills)
  * must be safe under simultaneous first-touch from many threads. The
  * round-5 review found the plan-memo fill reading document frequencies
  * from the shared `lastLookup` field AFTER `existing()` — a racing
  * batch's own lookup in between would memoize df=0 for every code of
  * the request permanently (wrong BM25 ranks forever). This spec pins
  * the fix the only way a race can be pinned: many threads, each with
  * queries NOBODY else runs (all take the memo-miss path at once), plus
  * shared queries, results asserted identical to the sequential answers
  * both on the first (racing) round and on a later (memo-served) round.
  */
class ConcurrentServeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("concurrent-serve-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(outs: Seq[SearchOut]): Seq[String] =
    outs.map(graft.tools.SearchProbe.canonical)

  test("concurrent searchBatch first-touch: results == sequential, memo not poisoned") {
    BlockCache.clear()
    val dir = java.nio.file.Files.createTempDirectory("graftconc").toString
    val pages = graft.fixtures.PagesGen.pages(spark, 150, parts = 5)
    IndexBuilder.build(spark, pages.toDF(), dir, IndexBuilder.BuildConfig(bucketBits = 4))
    val searcher = new SparkSearcher(spark, dir, Analyzer())

    // per-thread DISTINCT query sets (distinct dist values → distinct memo
    // keys even for shared words) + one query shared by all threads
    val nThreads = 4
    val perThread: IndexedSeq[Seq[(String, SearchOptions)]] =
      (0 until nThreads).map { t =>
        Seq(
          ("old lady", SearchOptions(dist = 10 + t)),
          (s"w000$t w000${t + 1}", SearchOptions(dist = 5 + t)),
          ("and (tupman|old)", SearchOptions(dist = 20 + t)),
          ("merriment {Source=web}", SearchOptions()) // shared across threads
        )
      }

    // sequential ground truth on a FRESH searcher (its own memos, no
    // cross-contamination with the concurrent run)
    val refSearcher = new SparkSearcher(spark, dir, Analyzer())
    val expected = perThread.map(qs => canon(refSearcher.searchBatch(qs, withWordInfo = true)))

    val pool = Executors.newFixedThreadPool(nThreads)
    try {
      for (round <- 0 until 3) { // round 0 races the memo FILL; 1-2 the hits
        val start = new CountDownLatch(1)
        val results = new Array[Either[Throwable, Seq[String]]](nThreads)
        val done = new CountDownLatch(nThreads)
        (0 until nThreads).foreach { t =>
          pool.execute { () =>
            start.await()
            results(t) =
              try Right(canon(searcher.searchBatch(perThread(t), withWordInfo = true)))
              catch { case e: Throwable => Left(e) }
            done.countDown()
          }
        }
        start.countDown() // all threads enter searchBatch together
        assert(done.await(300, TimeUnit.SECONDS), s"round $round: concurrent batches hung")
        (0 until nThreads).foreach { t =>
          results(t) match {
            case Left(e) => fail(s"round $round thread $t threw", e)
            case Right(got) =>
              assert(got == expected(t),
                s"round $round thread $t: concurrent result diverged from sequential " +
                  "(df-memo poisoning or serving-memo race)")
          }
        }
      }
    } finally {
      pool.shutdownNow()
      BlockCache.clear()
    }
  }
}
