package graft

import graft.query.SearchOptions
import graft.spark.{Compactor, IndexBuilder, IndexStore, SparkSearcher}
import graft.streaming.StreamingIndexer
import graft.text.Analyzer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot compaction: after a build + streaming appends, `compact`
  * rewrites the file sets into one consolidated layout; every query result
  * is unchanged, old versions stay time-travelable, streaming continues on
  * the compacted base, and vacuum reclaims the pre-compact files. */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def batch(from: Int, until: Int) =
    graft.fixtures.PagesGen.pages(spark, until, parts = 2)
      .filter(col("url").isin((from until until).map(i => graft.fixtures.PagesGen.urlFor(i.toLong)): _*))
      .toDF()

  test("compact: identical results, fewer files, time travel, append continuity") {
    val tmp = java.nio.file.Files.createTempDirectory("graftcompact").toString
    val indexDir = s"$tmp/idx"
    val cfg = IndexBuilder.BuildConfig(bucketBits = 4)

    IndexBuilder.build(spark, batch(0, 40), indexDir, cfg)
    StreamingIndexer.appendBatch(spark, batch(40, 70), indexDir, cfg, batchId = 0L)
    StreamingIndexer.appendBatch(spark, batch(70, 90), indexDir, cfg, batchId = 1L)

    val preSnap = IndexStore.readSnapshot(indexDir).get
    val pre = SparkSearcher.open(spark, indexDir)
    val queries = Seq("old", "merriment", "running water", "\"the old\"")
    val preSearch = queries.map(q => q -> pre.search(q, SearchOptions(dist = 40)))
    val preTopK = pre.bm25TopK(Seq("old", "lady"), 7)
    val preWords = pre.search("merriment", SearchOptions()).words.map(w => (w.word, w.nFound))

    val st = Compactor.compact(spark, indexDir)
    assert(st.version == preSnap.version + 1)
    assert(st.nDocs == preSnap.nDocs && st.totalPostings == preSnap.totalPostings)
    // three file sets (build + 2 batches) consolidated into ≤ shuffle parts
    assert(st.postingsFilesAfter < st.postingsFilesBefore,
      s"expected consolidation, got ${st.postingsFilesBefore}→${st.postingsFilesAfter}")

    val post = SparkSearcher.open(spark, indexDir)
    assert(IndexStore.readSnapshot(indexDir).get.version == st.version)
    preSearch.foreach { case (q, want) =>
      val got = post.search(q, SearchOptions(dist = 40))
      assert(got.docs.map(d => (d.docId, d.name, d.rank, d.bm25)) ==
        want.docs.map(d => (d.docId, d.name, d.rank, d.bm25)), s"search '$q' changed")
      assert(got.nFoundPages == want.nFoundPages, s"page count '$q' changed")
    }
    assert(post.bm25TopK(Seq("old", "lady"), 7) == preTopK, "bm25 changed")
    assert(post.search("merriment", SearchOptions()).words.map(w => (w.word, w.nFound)) == preWords)

    // snippets come from the rewritten doctext
    val withText = post.search("merriment", SearchOptions(dist = 40))
    assert(withText.docs.exists(_.pages.exists(_.text.nonEmpty)))

    // pre-compact version stays pinned-readable (Iceberg time travel)
    val pinned = SparkSearcher.open(spark, indexDir, Some(preSnap.version))
    assert(pinned.search("old", SearchOptions()).docs.map(_.docId) ==
      preSearch.find(_._1 == "old").get._2.docs.map(_.docId))

    // appends continue on the compacted base: same docId space, no overlap
    val added = StreamingIndexer.appendBatch(spark, batch(90, 100), indexDir, cfg, batchId = 2L)
    assert(added > 0)
    val s3 = IndexStore.readSnapshot(indexDir).get
    assert(s3.version == st.version + 1)
    assert(s3.nDocs == preSnap.nDocs + added)
    val afterAppend = SparkSearcher.open(spark, indexDir)
    val allIds = afterAppend.docMeta.collect().map(_.docId)
    assert(allIds.distinct.length == allIds.length, "docId collision after compact+append")
    // both old and new docs searchable through the compacted + appended union
    assert(afterAppend.search("old", SearchOptions()).docs.nonEmpty)

    // vacuum keeps the newest snapshots and reclaims pre-compact files
    val (expired, deleted) = IndexStore.vacuum(indexDir, keep = 2)
    assert(expired > 0 && deleted > 0)
    val afterVacuum = SparkSearcher.open(spark, indexDir)
    queries.foreach { q =>
      assert(afterVacuum.search(q, SearchOptions(dist = 40)).docs.map(_.docId) ==
        afterAppend.search(q, SearchOptions(dist = 40)).docs.map(_.docId),
        s"post-vacuum '$q' changed")
    }
  }

  test("streaming ingest with compactEvery keeps file counts bounded") {
    val tmp = java.nio.file.Files.createTempDirectory("graftautocompact").toString
    val srcDir = s"$tmp/in"
    val indexDir = s"$tmp/idx"
    new java.io.File(srcDir).mkdirs()
    val cfg = IndexBuilder.BuildConfig(bucketBits = 4)

    def writeBatch(from: Int, until: Int, sub: String): Unit = {
      val stage = s"$tmp/stage-$sub"
      batch(from, until).write.parquet(stage)
      new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(srcDir, s"$sub-$i.parquet"))
        }
    }
    val schema = graft.fixtures.PagesGen.pages(spark, 1, parts = 1).schema
    def runOnce(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2").parquet(srcDir)
      val q = StreamingIndexer.ingest(stream, indexDir, cfg,
        s"$tmp/$ckpt", trigger =
          org.apache.spark.sql.streaming.Trigger.AvailableNow(), compactEvery = 2)
      q.awaitTermination()
    }
    writeBatch(0, 25, "b0")
    writeBatch(25, 50, "b1")
    writeBatch(50, 75, "b2")
    writeBatch(75, 100, "b3")
    runOnce("ckpt")

    val snap = IndexStore.readSnapshot(indexDir).get
    assert(snap.nDocs == 100)
    // compaction ran: postings files listed in the manifest are bounded by
    // one consolidated set (+ at most compactEvery-1 uncompacted batches)
    val postingsDirs = snap.files("postings").map(_.split("/").init.mkString("/")).distinct
    assert(postingsDirs.exists(_.contains("compact")), s"no compacted dir in $postingsDirs")
    assert(postingsDirs.size <= 2, s"too many postings dirs: $postingsDirs")
    // and every doc is searchable through the compacted union
    val sr = SparkSearcher.open(spark, indexDir)
    assert(sr.search("old", SearchOptions()).docs.nonEmpty)
    assert(sr.nDocs == 100)
  }
}
