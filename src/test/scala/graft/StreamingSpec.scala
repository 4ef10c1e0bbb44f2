package graft

import graft.mem.MemIndex
import graft.query.SearchOptions
import graft.spark.{IndexBuilder, IndexStore, SparkSearcher}
import graft.streaming.StreamingIndexer
import graft.text.{Analyzer, HtmlExtract}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ingestion: file-source Structured Streaming batches append
  * index deltas; results after each commit equal a from-scratch reference
  * engine over the union of all ingested docs; replayed batches dedup.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream-only index persists pagination config (page >= 2 snippets resolve)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftstreamcfg").toString + "/idx"
    val cfg = IndexBuilder.BuildConfig(bucketBits = 4, pageSize = 40)
    // body longer than one 40-char page; the probe term sits past page 1
    // 57*2 + 6 = 120 chars of filler, so the probe term starts exactly at a
    // 40-char page boundary (a term straddling a boundary splits its token)
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2 + "abcde " + "zanzibar quokka"
    val pages = Seq(("http://s/x", null: Array[Byte], body)).toDF("url", "html", "text")
    assert(StreamingIndexer.appendBatch(spark, pages, dir, cfg, batchId = 0L) == 1L)
    // the regression: appendBatch into a FRESH dir never wrote
    // buildcfg.properties, so the query side re-derived a single page "1"
    // and snippets for pages >= 2 came back empty
    assert(IndexBuilder.readBuildProps(dir) == ((40, false)))
    val sr = new SparkSearcher(spark, dir, Analyzer())
    val out = sr.search("zanzibar")
    assert(out.docs.nonEmpty && out.docs.head.pages.nonEmpty)
    val hit = out.docs.head.pages.head
    assert(hit.pageId.toInt >= 2, s"probe term should land past page 1, got page ${hit.pageId}")
    assert(hit.text.nonEmpty, "snippet for a page >= 2 must resolve")
  }

  test("lineage continuity: appended versions carry complete lineage; vacuum keeps referenced lineage") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graftlin").toString + "/idx"
    val cfg = IndexBuilder.BuildConfig(bucketBits = 4)
    // full build v1 over 40 docs
    IndexBuilder.build(spark, graft.fixtures.PagesGen.pages(spark, 40, parts = 3).toDF(),
      dir, cfg)
    // append 20 new docs as batch 0 → v2 (adopts v1's postings files)
    val delta = graft.fixtures.PagesGen.pages(spark, 60, parts = 2)
      .filter(col("url").isin((40 until 60).map(i => graft.fixtures.PagesGen.urlFor(i.toLong)): _*))
      .toDF()
    assert(StreamingIndexer.appendBatch(spark, delta, dir, cfg, batchId = 0L) == 20L)
    val snap2 = IndexStore.readSnapshot(dir).get
    val lin2 = IndexStore.readLineage(dir, snap2.version)
    val postFiles = snap2.files("postings").toSet
    // the appended version's lineage covers every NON-EMPTY postings file
    // it serves (retained build-v1 entries + the batch's own files; a
    // 0-row part file carries no metrics, same as full-build lineage), and
    // the metric sums conserve the snapshot totals — i.e. nothing that
    // holds data is missing
    assert(lin2.keySet.subsetOf(postFiles), "lineage names files outside the manifest")
    assert(lin2.keys.exists(_.startsWith("postings/build-v1/")), "retained v1 entries missing")
    assert(lin2.keys.exists(_.startsWith("postings/batch-0/")), "batch entries missing")
    assert(lin2.values.forall(m => m.blocks > 0 && m.bytes > 0), "degenerate lineage metrics")
    assert(lin2.values.map(_.docs).sum == snap2.nDocs,
      s"lineage doc sum ${lin2.values.map(_.docs).sum} != snapshot nDocs ${snap2.nDocs}")
    assert(lin2.values.map(_.postings).sum == snap2.totalPostings,
      s"lineage postings sum != snapshot totalPostings ${snap2.totalPostings}")
    // simulate a pre-change append (no per-version lineage): delete v2's
    // lineage file, then vacuum keep=1 — v1's manifest expires but its
    // lineage must SURVIVE because v2 still references build-v1's postings
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, s"lineage-v${snap2.version}.json"))
    IndexStore.vacuum(dir, keep = 1)
    assert(IndexStore.readLineage(dir, 1).nonEmpty,
      "v1 lineage deleted while a live snapshot still references its postings files")
  }

  test("streaming batches append; queries match reference over the union") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftstream").toString
    val srcDir = s"$tmp/in"
    val indexDir = s"$tmp/idx"
    val ckpt = s"$tmp/ckpt"
    new java.io.File(srcDir).mkdirs()
    val cfg = IndexBuilder.BuildConfig(bucketBits = 4)

    import org.apache.spark.sql.functions.col
    // flat parquet files in srcDir (the file streaming source lists a dir)
    def writeBatch(ids: Range, sub: String): Unit = {
      val stage = s"$tmp/stage-$sub"
      graft.fixtures.PagesGen.pages(spark, ids.end, parts = 2)
        .filter(col("url").isin(ids.map(i => graft.fixtures.PagesGen.urlFor(i.toLong)): _*))
        .write.parquet(stage)
      new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(srcDir, s"$sub-$i.parquet"))
        }
    }
    writeBatch(0 until 40, "b0")

    val schema = graft.fixtures.PagesGen.pages(spark, 1, parts = 1).schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingIndexer.ingest(stream, indexDir, cfg, ckpt)
      q.awaitTermination()
    }
    runOnce()

    val mem = new MemIndex(Analyzer())
    def memAdd(ids: Range): Unit =
      ids.map(i => (graft.fixtures.PagesGen.urlFor(i.toLong), graft.fixtures.PagesGen.htmlFor(i.toLong)))
        .sortBy(_._1).foreach { case (url, html) =>
          val ex = HtmlExtract.extract(html)
          if (ex.text.nonEmpty) mem.addDoc("web:" + url, ex.headers(url, "web"), Seq(("1", ex.text)))
        }
    memAdd(0 until 40)

    def check(tag: String): Unit = {
      val sr = new SparkSearcher(spark, indexDir, Analyzer())
      assert(sr.nDocs == mem.nDocs, s"$tag nDocs")
      assert(math.abs(sr.avgdl - mem.avgdl) < 1e-9, s"$tag avgdl")
      Seq("old", "\"old lady\"", "running ladies").foreach { q =>
        val a = mem.search(q, SearchOptions(dist = 40))
        val b = sr.search(q, SearchOptions(dist = 40))
        assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"$tag [$q] docs")
        assert(a.docs.map(_.bm25) == b.docs.map(_.bm25), s"$tag [$q] bm25")
      }
      val bq = Seq("running", "merriment")
      assert(sr.bm25TopK(bq, 5) == mem.bm25TopK(bq, 5), s"$tag wand topk")
    }
    check("after-batch-0")

    // second batch of NEW docs arrives; stream picks up only the delta
    writeBatch(40 until 70, "b1")
    runOnce()
    memAdd(40 until 70)
    check("after-batch-1")

    // time travel: a reader pinned to the batch-0 snapshot still sees ONLY
    // batch-0 docs even though batch-1 files were appended since
    val v1 = 1 // first streaming commit wrote manifest v1
    val pinned = SparkSearcher.open(spark, indexDir, Some(v1))
    assert(pinned.nDocs == 40, s"pinned nDocs ${pinned.nDocs}")
    val memV1 = new MemIndex(Analyzer())
    (0 until 40).map(i => (graft.fixtures.PagesGen.urlFor(i.toLong), graft.fixtures.PagesGen.htmlFor(i.toLong)))
      .sortBy(_._1).foreach { case (url, html) =>
        val ex = HtmlExtract.extract(html)
        if (ex.text.nonEmpty) memV1.addDoc("web:" + url, ex.headers(url, "web"), Seq(("1", ex.text)))
      }
    val pq = Seq("running", "merriment")
    assert(pinned.bm25TopK(pq, 5) == memV1.bm25TopK(pq, 5), "pinned snapshot bm25")
    assert(pinned.search("old", SearchOptions(dist = 40)).docs.map(_.docId) ==
      memV1.search("old", SearchOptions(dist = 40)).docs.map(_.docId), "pinned search")

    // replaying an already-committed batchId is a no-op
    val before = IndexStore.readSnapshot(indexDir).get
    val n = StreamingIndexer.appendBatch(spark,
      graft.fixtures.PagesGen.pages(spark, 10, parts = 1).toDF(), indexDir, cfg, batchId = 0L)
    assert(n == 0L, "replayed batch must dedup")
    assert(IndexStore.readSnapshot(indexDir).get.nDocs == before.nDocs)

    // crash-replay exactly-once: simulate a batch that wrote its data dirs
    // and snapshot but crashed BEFORE the stream marker committed. The
    // manifest is the authoritative commit point (it embeds the stream
    // state), so the replay must REPAIR the marker from it and dedup —
    // returning 0, writing no new version, leaving counts identical
    val batch2 = graft.fixtures.PagesGen.pages(spark, 90, parts = 2)
      .filter(col("url").isin((70 until 90).map(i => graft.fixtures.PagesGen.urlFor(i.toLong)): _*))
      .toDF()
    val marker = IndexStore.stageMarkerPath(indexDir, "stream")
    val preBatchMarker = java.nio.file.Files.readAllBytes(marker)
    val added = StreamingIndexer.appendBatch(spark, batch2, indexDir, cfg, batchId = 2L)
    assert(added > 0)
    val committed = IndexStore.readSnapshot(indexDir).get
    // roll the stream marker back to its pre-batch content — exactly the
    // state a crash before commitStage leaves behind (data dirs + snapshot
    // written, marker not yet advanced)
    java.nio.file.Files.write(marker, preBatchMarker)
    val replayed = StreamingIndexer.appendBatch(spark, batch2, indexDir, cfg, batchId = 2L)
    assert(replayed == 0L,
      s"replay must dedup against the committed manifest (re-appended $replayed)")
    val after = IndexStore.readSnapshot(indexDir).get
    assert(after.version == committed.version, "replay must not write a new version")
    assert(after.nDocs == committed.nDocs, s"nDocs ${after.nDocs} vs ${committed.nDocs}")
    assert(after.totalPostings == committed.totalPostings, "postings double-counted on replay")
    assert(after.files("doctext").size == committed.files("doctext").size, "doctext files grew")
    assert(IndexStore.readStageDetail(indexDir, "stream", "version")
      .contains(committed.version.toString), "marker not repaired to the committed version")
    memAdd(70 until 90)
    check("after-crash-replay")
  }
}
