package graft

import graft.mem.MemIndex
import graft.query.SearchOptions
import graft.spark.{IndexBuilder, IndexStore, SparkSearcher}
import graft.streaming.StreamingIndexer
import graft.text.{Analyzer, HtmlExtract}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Crash-replay holes in the append path (round-5 review): a batch that
  * crashes BETWEEN `writeSnapshot` and `commitStage` leaves CURRENT
  * pointing at its own complete snapshot while the stream marker (or no
  * marker at all, for a first append) still describes the pre-batch
  * state. The manifest is the authoritative commit point (it embeds the
  * full continuation state in its stream stage record), so the replay
  * must REPAIR the marker from it and dedup — basing a re-run on CURRENT
  * would double-merge the batch's termstats, double-count its docs, and
  * orphan its docIds; basing a re-run on a lagging marker against a
  * post-batch/compacted CURRENT double-appends. And `vacuum` must never
  * expire the marker-pinned base version.
  */
class StreamRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cfg = IndexBuilder.BuildConfig(bucketBits = 4)

  private def pagesRange(lo: Int, hi: Int) = {
    import org.apache.spark.sql.functions.col
    graft.fixtures.PagesGen.pages(spark, hi, parts = 2)
      .filter(col("url").isin((lo until hi).map(i => graft.fixtures.PagesGen.urlFor(i.toLong)): _*))
      .toDF()
  }

  /** Reference engine fed the SAME ingest order as the batches: docIds
    * assign per batch in batch-local url-sorted order (a global sort over
    * the union would interleave differently). */
  private def memBatches(ranges: Seq[Range]): MemIndex = {
    val m = new MemIndex(Analyzer())
    ranges.foreach { ids =>
      ids.map(i => (graft.fixtures.PagesGen.urlFor(i.toLong), graft.fixtures.PagesGen.htmlFor(i.toLong)))
        .sortBy(_._1).foreach { case (url, html) =>
          val ex = HtmlExtract.extract(html)
          if (ex.text.nonEmpty) m.addDoc("web:" + url, ex.headers(url, "web"), Seq(("1", ex.text)))
        }
    }
    m
  }

  private val probes = Seq("old lady", "tupman", "merriment {Source=web}")

  private def assertMatchesRef(dir: String, batches: Seq[Range], label: String): Unit = {
    val sr = new SparkSearcher(spark, dir, Analyzer())
    val ref = memBatches(batches)
    probes.foreach { q =>
      val a = ref.search(q, SearchOptions())
      val b = sr.search(q, SearchOptions())
      assert(a.nFoundPages == b.nFoundPages, s"$label [$q] nFoundPages")
      assert(a.docs.map(d => (d.docId, d.rank, d.bm25)) ==
        b.docs.map(d => (d.docId, d.rank, d.bm25)), s"$label [$q] docs/ranks/bm25")
    }
  }

  test("marker-less crashed FIRST append: replay repairs the marker from the manifest and dedups") {
    val dir = java.nio.file.Files.createTempDirectory("graftrec1").toString + "/idx"
    IndexBuilder.build(spark, pagesRange(0, 40), dir, cfg)
    assert(StreamingIndexer.appendBatch(spark, pagesRange(40, 60), dir, cfg, batchId = 0L) == 20L)
    // simulate the crash window: writeSnapshot(v2) committed, commitStage
    // never ran → no stream marker, CURRENT = the attempt's own snapshot
    java.nio.file.Files.delete(IndexStore.stageMarkerPath(dir, "stream"))
    assert(IndexStore.currentVersion(dir).contains(2))
    // checkpoint replays batch 0: the manifest IS the commit (every data
    // write precedes writeSnapshot), so the replay must reconstruct the
    // marker from it and return 0 — not re-run and double-count
    assert(StreamingIndexer.appendBatch(spark, pagesRange(40, 60), dir, cfg, batchId = 0L) == 0L,
      "replay re-ran a batch whose snapshot had already committed")
    assert(IndexStore.currentVersion(dir).contains(2), "replay must not write a new version")
    assert(IndexStore.readStageDetail(dir, "stream", "lastBatchId").contains("0"),
      "marker not repaired from the manifest")
    val snap = IndexStore.readSnapshot(dir).get
    assert(snap.nDocs == 60L,
      s"replay double-counted the batch (nDocs ${snap.nDocs}, want 60)")
    // df/cf and ranks must equal a single-ingest reference — a double
    // termstats merge shows up in bm25 even when nDocs happens to be right
    assertMatchesRef(dir, Seq(0 until 40, 40 until 60), "after marker-less replay")
    // and the NEXT batch continues the docId space seamlessly
    assert(StreamingIndexer.appendBatch(spark, pagesRange(60, 70), dir, cfg, batchId = 1L) == 10L)
    assert(IndexStore.readSnapshot(dir).get.nDocs == 70L)
    assertMatchesRef(dir, Seq(0 until 40, 40 until 60, 60 until 70), "after follow-on batch")
  }

  test("vacuum retains the marker-pinned base; crashed LATER append dedups on replay") {
    val dir = java.nio.file.Files.createTempDirectory("graftrec2").toString + "/idx"
    IndexBuilder.build(spark, pagesRange(0, 40), dir, cfg)
    assert(StreamingIndexer.appendBatch(spark, pagesRange(40, 50), dir, cfg, batchId = 0L) == 10L)
    val markerPath = IndexStore.stageMarkerPath(dir, "stream")
    val committedMarker = java.nio.file.Files.readAllBytes(markerPath) // pins v2
    // batch 1 "crashes" after writeSnapshot(v3): run it fully, then restore
    // the pre-batch marker — exactly the on-disk state of that crash window
    assert(StreamingIndexer.appendBatch(spark, pagesRange(50, 60), dir, cfg, batchId = 1L) == 10L)
    java.nio.file.Files.write(markerPath, committedMarker)
    // an operator vacuums aggressively while the stream is down: the pinned
    // base (v2) must survive even though keep=1 would only retain CURRENT
    IndexStore.vacuum(dir, keep = 1)
    assert(IndexStore.readSnapshot(dir, Some(2)).nonEmpty,
      "vacuum expired the marker-pinned base snapshot")
    // checkpoint replays batch 1 on restart: batch 1's snapshot (v3) is
    // already committed → marker repaired to v3, replay dedups
    assert(StreamingIndexer.appendBatch(spark, pagesRange(50, 60), dir, cfg, batchId = 1L) == 0L,
      "replay re-ran a batch whose snapshot had already committed")
    assert(IndexStore.readStageDetail(dir, "stream", "version").contains("3"),
      "marker not fast-forwarded to the committed batch's version")
    val snap = IndexStore.readSnapshot(dir).get
    assert(snap.nDocs == 60L, s"replay corrupted the doc count (${snap.nDocs}, want 60)")
    assertMatchesRef(dir, Seq(0 until 40, 40 until 50, 50 until 60), "after pinned-base replay")
  }

  test("compact after a crashed append fast-forwards the lagging marker (no double-append)") {
    val dir = java.nio.file.Files.createTempDirectory("graftrec4").toString + "/idx"
    IndexBuilder.build(spark, pagesRange(0, 40), dir, cfg)
    assert(StreamingIndexer.appendBatch(spark, pagesRange(40, 50), dir, cfg, batchId = 0L) == 10L)
    val markerPath = IndexStore.stageMarkerPath(dir, "stream")
    val committedMarker = java.nio.file.Files.readAllBytes(markerPath)
    assert(StreamingIndexer.appendBatch(spark, pagesRange(50, 60), dir, cfg, batchId = 1L) == 10L)
    java.nio.file.Files.write(markerPath, committedMarker) // crash window: marker lags at batch 0
    // maintenance compaction runs before the stream restarts: it must NOT
    // re-point the LAGGING marker onto the compacted base (whose rewrite
    // contains batch 1 already) — the replay would then re-append batch 1
    graft.spark.Compactor.compact(spark, dir)
    assert(StreamingIndexer.appendBatch(spark, pagesRange(50, 60), dir, cfg, batchId = 1L) == 0L,
      "replayed batch re-appended after compaction (marker was not fast-forwarded)")
    val snap = IndexStore.readSnapshot(dir).get
    assert(snap.nDocs == 60L, s"double-append after compact (nDocs ${snap.nDocs}, want 60)")
    assertMatchesRef(dir, Seq(0 until 40, 40 until 50, 50 until 60), "after compact + replay")
    // and new batches continue on the compacted snapshot
    assert(StreamingIndexer.appendBatch(spark, pagesRange(60, 70), dir, cfg, batchId = 2L) == 10L)
    assert(IndexStore.readSnapshot(dir).get.nDocs == 70L)
    assertMatchesRef(dir, Seq(0 until 40, 40 until 50, 50 until 60, 60 until 70),
      "batch after compact")
  }

  test("append paginates with the INDEX's persisted props, not the caller's config") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftrec3").toString + "/idx"
    val paged = IndexBuilder.BuildConfig(bucketBits = 4, pageSize = 40)
    val filler = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    val buildDoc = Seq(("http://s/a", null: Array[Byte], filler + "abcde " + "xylophone quest"))
      .toDF("url", "html", "text")
    IndexBuilder.build(spark, buildDoc, dir, paged)
    // `Main append` passes a DEFAULT config (no --page-size flag); the
    // persisted buildcfg.properties (pageSize=40) must win or this doc is
    // tokenized as ONE page while the query side re-splits at 40 chars
    val appendDoc = Seq(("http://s/b", null: Array[Byte], filler + "abcde " + "zanzibar quokka"))
      .toDF("url", "html", "text")
    assert(StreamingIndexer.appendBatch(spark, appendDoc, dir,
      IndexBuilder.BuildConfig(bucketBits = 4), batchId = 0L) == 1L)
    val sr = new SparkSearcher(spark, dir, Analyzer())
    val out = sr.search("zanzibar")
    assert(out.docs.nonEmpty && out.docs.head.pages.nonEmpty, "appended doc not found")
    val hit = out.docs.head.pages.head
    assert(hit.pageId.toInt >= 2,
      s"appended doc paginated with the caller's pageSize=0 (page ${hit.pageId}, want >= 2)")
    assert(hit.text.nonEmpty, "snippet for a page >= 2 of an appended doc must resolve")
    assert(hit.text.contains("zanzibar"), s"snippet text mismatches page table: '${hit.text}'")
  }
}
