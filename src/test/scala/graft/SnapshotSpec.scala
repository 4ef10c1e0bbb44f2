package graft

import graft.fixtures.PagesGen
import graft.query.SearchOptions
import graft.spark.{IndexBuilder, IndexStore, SparkSearcher}
import graft.text.Analyzer
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-style snapshot lifecycle: a full rebuild writes version-scoped
  * directories (the swap is only the CURRENT pointer), older snapshots
  * stay readable for time travel, and `vacuum` expires them. */
class SnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rebuild preserves old snapshots; vacuum expires them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString

    // v1: 40-doc corpus
    IndexBuilder.build(spark, PagesGen.pages(spark, 40, parts = 2).toDF(), dir,
      IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "webA"))
    assert(IndexStore.currentVersion(dir).contains(1))

    // per-partition lineage: one entry per postings file, sums match the
    // committed stage totals, bytes are real file sizes
    locally {
      val lin = IndexStore.readLineage(dir, 1)
      assert(lin.nonEmpty, "lineage-v1.json missing or empty")
      val totalPostings =
        IndexStore.readStageDetail(dir, "postings", "totalPostings").get.toLong
      val nDocs = IndexStore.readStageDetail(dir, "postings", "nDocs").get.toLong
      assert(lin.values.map(_.postings).sum == totalPostings,
        s"lineage postings ${lin.values.map(_.postings).sum} != $totalPostings")
      assert(lin.values.map(_.docs).sum == nDocs)
      assert(lin.values.forall(_.bytes > 0), "lineage bytes must be real sizes")
      lin.keys.foreach(f => assert(new java.io.File(s"$dir/$f").exists(), s"$f listed but absent"))

      // input-partition provenance: same totals from the INPUT side, docId
      // ranges disjoint (doctext partitions are docId ranges by the range
      // exchange), so input↔shard attribution is an exact intersection
      val inp = IndexStore.readLineageInputs(dir, 1)
      assert(inp.nonEmpty, "_inputPartitions section missing")
      assert(inp.values.map(_.postings).sum == totalPostings,
        s"input provenance postings ${inp.values.map(_.postings).sum} != $totalPostings")
      assert(inp.values.map(_.docs).sum == nDocs)
      val ranges = inp.values.toSeq.sortBy(_.firstDocId)
      ranges.sliding(2).foreach {
        case Seq(a, b) => assert(a.lastDocId < b.firstDocId,
          s"input partition docId ranges overlap: $a vs $b")
        case _ => ()
      }
    }

    // v2: full REBUILD from a different corpus (different config → new
    // lineage); must not touch v1's files
    IndexBuilder.build(spark, PagesGen.pages(spark, 60, parts = 2).toDF(), dir,
      IndexBuilder.BuildConfig(bucketBits = 4, sourceName = "webB"))
    assert(IndexStore.currentVersion(dir).contains(2))

    val cur = SparkSearcher.open(spark, dir)
    assert(cur.nDocs == 60)
    assert(cur.search("old", SearchOptions()).docs.nonEmpty)

    // time travel to the pre-rebuild snapshot
    val pinned = SparkSearcher.open(spark, dir, Some(1))
    assert(pinned.nDocs == 40, s"pinned nDocs ${pinned.nDocs}")
    assert(pinned.search("old", SearchOptions()).docs.nonEmpty)

    // vacuum keep=1: v1 expires, its files are reclaimed
    val (expired, deleted) = IndexStore.vacuum(dir, keep = 1)
    assert(expired == 1, s"expired $expired")
    assert(deleted > 0, "vacuum deleted nothing")
    assert(IndexStore.readSnapshot(dir, Some(1)).isEmpty, "v1 manifest must be gone")
    assert(IndexStore.readLineage(dir, 1).isEmpty, "v1 lineage must be vacuumed")
    assert(!new java.io.File(s"$dir/doctext/build-v1").exists(), "v1 doctext dir must be gone")

    // the current snapshot is untouched and fully functional
    val cur2 = SparkSearcher.open(spark, dir)
    assert(cur2.nDocs == 60)
    val out = cur2.search("old", SearchOptions())
    assert(out.docs.nonEmpty && out.docs.head.pages.nonEmpty)
    assert(cur2.bm25TopKBatch(Seq(Seq("old", "lady")), 5).head.nonEmpty)
  }

  test("time travel pairs a version with ITS analyzer and pagination props") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-art").toString
    val filler = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    val doc = Seq(("http://s/a", null: Array[Byte], filler + "abcde " + "zanzibar quokka"))
      .toDF("url", "html", "text")
    // v1: pageSize=40, no stopwords — probe term lands past page 1
    IndexBuilder.build(spark, doc, dir, IndexBuilder.BuildConfig(bucketBits = 4, pageSize = 40))
    // v2: REBUILD with a different config — single page AND the probe term
    // stop-worded. The unversioned analyzer.bin/buildcfg.properties now
    // describe v2; a v1 reader resolving them would (a) parse "zanzibar"
    // away at query time and (b) re-derive a 1-page body that mismatches
    // v1's page table.
    IndexBuilder.build(spark, doc, dir,
      IndexBuilder.BuildConfig(bucketBits = 4, pageSize = 0, stopWords = Set("zanzibar")))
    assert(IndexStore.currentVersion(dir).contains(2))

    val v1 = SparkSearcher.open(spark, dir, Some(1))
    val hit1 = v1.search("zanzibar")
    assert(hit1.docs.nonEmpty, "v1 must still resolve 'zanzibar' with ITS analyzer")
    val page1 = hit1.docs.head.pages.head
    assert(page1.pageId.toInt >= 2, s"v1 page table says page >= 2, got ${page1.pageId}")
    assert(page1.text.contains("zanzibar"),
      s"v1 snippet must re-derive pages with v1's pageSize: '${page1.text}'")

    // CURRENT pairs with v2's artifacts: the term is stop-worded away
    val v2 = SparkSearcher.open(spark, dir)
    assert(v2.search("zanzibar").docs.isEmpty, "v2's stopword must apply to v2 queries")
    val v2hit = v2.search("quokka")
    assert(v2hit.docs.nonEmpty && v2hit.docs.head.pages.head.pageId == "1",
      "v2 is single-page by ITS config")
  }
}
