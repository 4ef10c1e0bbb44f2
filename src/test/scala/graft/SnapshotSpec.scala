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
}
