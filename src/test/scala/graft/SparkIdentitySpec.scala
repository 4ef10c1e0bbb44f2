package graft

import graft.fixtures.PagesGen
import graft.mem.MemIndex
import graft.query.SearchOptions
import graft.spark.{IndexBuilder, IndexStore, SparkSearcher}
import graft.text.{Analyzer, HtmlExtract}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Rank-identity: the distributed engine must produce identical docIDs,
  * positions, docodo ranks and BM25 scores to the single-threaded reference
  * engine on the same corpus (BASELINE.json north_rule), plus resumable
  * builds from snapshot markers.
  */
class SparkIdentitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("identity-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val nDocsCorpus = 260
  lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graftidx").toString
    val pages = PagesGen.pages(spark, nDocsCorpus, parts = 7)
    IndexBuilder.build(spark, pages.toDF(), dir, IndexBuilder.BuildConfig(bucketBits = 5))
    dir
  }

  lazy val mem: MemIndex = {
    val m = new MemIndex(Analyzer())
    // same docId assignment: url-sorted order
    PagesGen.localPages(nDocsCorpus).sortBy(_._1).foreach { case (url, html) =>
      val ex = HtmlExtract.extract(html)
      if (ex.text.nonEmpty) m.addDoc("web:" + url, ex.headers(url, "web"), Seq(("1", ex.text)))
    }
    m
  }

  lazy val searcher: SparkSearcher = new SparkSearcher(spark, indexDir, Analyzer())

  test("index stats match the reference engine") {
    val snap = IndexStore.readSnapshot(indexDir).get
    assert(snap.nDocs == mem.nDocs, "nDocs")
    assert(math.abs(snap.avgdl - mem.avgdl) < 1e-9, s"avgdl ${snap.avgdl} vs ${mem.avgdl}")
    // df/cf parity on a term sample
    Seq("old", "lady", "running", "$ladi", "w0001", "&name", "tupman").foreach { t =>
      val st = searcher.dfOf(Seq(t))
      assert(st.getOrElse(t, 0L) == mem.df(t), s"df($t)")
    }
  }

  val goldenQueries: Seq[(String, SearchOptions)] = Seq(
    ("old", SearchOptions()),
    ("and (tupman|old)", SearchOptions()),
    ("lady old", SearchOptions(dist = 40)),
    ("\"old lady\"", SearchOptions(dist = 40)),
    ("\"lady old\"", SearchOptions(dist = 40)),
    ("lady (old | young)", SearchOptions(dist = 40)),
    ("\"old (lady|ladies) (who|were|looked)\"", SearchOptions(dist = 40)),
    ("running ladies", SearchOptions()),
    ("w0001 w0002", SearchOptions()),
    ("?an?", SearchOptions(dist = 40)),
    ("merriment {Source=web}", SearchOptions()),
    ("old -filter:site1\\.", SearchOptions()))

  test("search results identical: docIds, positions, ranks, BM25") {
    goldenQueries.foreach { case (q, opt) =>
      val a = mem.search(q, opt)
      val b = searcher.search(q, opt)
      assert(a.nFoundPages == b.nFoundPages, s"[$q] nFoundPages ${a.nFoundPages} vs ${b.nFoundPages}")
      assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"[$q] docIds")
      a.docs.zip(b.docs).foreach { case (da, db) =>
        assert(da.name == db.name, s"[$q] name")
        assert(da.rank == db.rank, s"[$q] rank doc ${da.docId}: ${da.rank} vs ${db.rank}")
        assert(da.bm25 == db.bm25, s"[$q] bm25 doc ${da.docId}: ${da.bm25} vs ${db.bm25}")
        assert(da.pages.map(_.pageId) == db.pages.map(_.pageId), s"[$q] pageIds doc ${da.docId}")
        da.pages.zip(db.pages).foreach { case (pa, pb) =>
          assert(pa.pos.toSeq == pb.pos.toSeq, s"[$q] positions doc ${da.docId}")
          assert(pa.rank == pb.rank, s"[$q] page rank")
          assert(pa.text == pb.text, s"[$q] snippet doc ${da.docId}")
        }
        assert(da.headers == db.headers, s"[$q] headers")
      }
      assert(a.words.map(_.nFound) == b.words.map(_.nFound), s"[$q] word nFound")
    }
  }

  test("searchBatch: batched positional queries equal sequential search") {
    val reqs = goldenQueries.take(8)
    val batch = searcher.searchBatch(reqs)
    reqs.zip(batch).foreach { case ((q, opt), b) =>
      val a = searcher.search(q, opt, withWordInfo = false)
      assert(a.nFoundPages == b.nFoundPages, s"[$q] nFoundPages")
      assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"[$q] docIds")
      a.docs.zip(b.docs).foreach { case (da, db) =>
        assert(da.rank == db.rank && da.bm25 == db.bm25, s"[$q] scores doc ${da.docId}")
        assert(da.pages.map(p => (p.pageId, p.pos.toSeq)) ==
          db.pages.map(p => (p.pageId, p.pos.toSeq)), s"[$q] pages doc ${da.docId}")
        assert(da.pages.map(_.text) == db.pages.map(_.text), s"[$q] snippets")
      }
    }
  }

  test("searchBatch: repeated (query, options) pairs fan out the shared result") {
    // the dedup fast path plans each distinct request once; every repeat
    // position must still receive the full, correctly-ordered SearchOut
    val distinct = goldenQueries.take(5)
    val reqs = distinct ++ distinct.reverse ++ Seq(distinct(2), distinct(0))
    val batch = searcher.searchBatch(reqs, withWordInfo = true)
    assert(batch.length == reqs.length)
    val canonical = distinct.map { case (q, o) => searcher.search(q, o, withWordInfo = true) }
    val byReq = distinct.zip(canonical).toMap
    reqs.zip(batch).foreach { case (req, b) =>
      val a = byReq(req)
      assert(a.nFoundPages == b.nFoundPages, s"[${req._1}] nFoundPages")
      assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"[${req._1}] docIds")
      assert(a.docs.map(_.bm25) == b.docs.map(_.bm25), s"[${req._1}] bm25")
      assert(a.words.map(w => (w.word, w.nFound)) ==
        b.words.map(w => (w.word, w.nFound)), s"[${req._1}] word info")
    }
  }

  test("searchBatch under cap pressure: early exit + page-cap cut match the reference") {
    // shrink the global page cap so the per-(query, partition) prefix
    // bound — the eval loop's early exit — actually FIRES on the small
    // fixture (normally it needs >30k matched pages per partition). Both
    // engines read the override through ResultAssembler, so results must
    // stay identical under cap pressure: capped nFoundPages, truncated doc
    // lists, overflow-page handling.
    val reqs = goldenQueries.take(8)
    graft.core.Consts.MaxFoundPagesOverride = Some(5)
    try {
      val batch = searcher.searchBatch(reqs)
      reqs.zip(batch).foreach { case ((q, opt), b) =>
        val a = mem.search(q, opt)
        assert(a.nFoundPages == b.nFoundPages, s"[$q] capped nFoundPages")
        assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"[$q] capped docIds")
        assert(a.docs.map(d => d.pages.map(p => (p.pageId, p.pos.toSeq))) ==
          b.docs.map(d => d.pages.map(p => (p.pageId, p.pos.toSeq))), s"[$q] capped pages")
      }
    } finally graft.core.Consts.MaxFoundPagesOverride = None
  }

  test("searchBatch under cap pressure WITH word info: bounded buffer ≡ single path") {
    // r6: the wantInfo eval loop bounds perQi at compactBound like the
    // no-info path (the r5-ADVICE unbounded-buffer fix). Under a shrunken
    // page cap the bound FIRES on this fixture; per-leaf word counts must
    // still sum over EVERY evaluated doc and doc/page results must match
    // the single-query path (an independent eval implementation).
    val reqs = goldenQueries.take(8)
    graft.core.Consts.MaxFoundPagesOverride = Some(5)
    try {
      val batch = searcher.searchBatch(reqs, withWordInfo = true)
      reqs.zip(batch).foreach { case ((q, opt), b) =>
        val a = searcher.search(q, opt, withWordInfo = true)
        assert(a.nFoundPages == b.nFoundPages, s"[$q] capped nFoundPages")
        assert(a.docs.map(_.docId) == b.docs.map(_.docId), s"[$q] capped docIds")
        assert(a.words.map(w => (w.word, w.nFound)) ==
          b.words.map(w => (w.word, w.nFound)), s"[$q] word info under cap")
      }
    } finally graft.core.Consts.MaxFoundPagesOverride = None
  }

  test("forced eval spill: no-word-info results identical, rows round-trip") {
    // round-trip unit check of the spill codec first
    val buf = new graft.spark.BlockSpillBuffer(maxBytes = 1)
    val rows = (0 until 40).map { i =>
      graft.spark.PostingBlockRow(s"t$i", i % 4, i.toLong, 2, 3L,
        Array.tabulate(8)(j => (i + j).toByte), Array[Byte](1, 2),
        if (i % 2 == 0) Array[Byte](9) else Array.emptyByteArray,
        Array.tabulate(5)(j => (i * j).toByte), 0.5 + i, i.toLong, i + 7L)
    }
    rows.foreach(buf += _)
    assert(buf.spilledRows == 39) // only the first stays in memory at 1 byte
    (0 until 2).foreach { _ => // replayable
      val got = scala.collection.mutable.ArrayBuffer.empty[graft.spark.PostingBlockRow]
      buf.foreach(got += _)
      assert(got.size == rows.size)
      rows.zip(got).foreach { case (a, b) =>
        assert(a.term == b.term && a.bucket == b.bucket && a.firstDocId == b.firstDocId &&
          a.nDocs == b.nDocs && a.nPostings == b.nPostings &&
          a.docDeltas.sameElements(b.docDeltas) && a.tfs.sameElements(b.tfs) &&
          a.dls.sameElements(b.dls) && a.posDeltas.sameElements(b.posDeltas) &&
          a.maxTfNorm == b.maxTfNorm && a.maxTf == b.maxTf && a.minDl == b.minDl)
      }
    }
    buf.close()

    // every block spills in both eval paths; results must not change.
    // the field query exercises the field-membership pass's spill buffer
    // (it replays the partition's field blocks once per chunk)
    val reqs = goldenQueries.take(6) :+ ("merriment {Source=web}", SearchOptions())
    val plainBatch = searcher.searchBatch(reqs)
    val plainSingle = reqs.map { case (q, o) => searcher.search(q, o, withWordInfo = false) }
    sys.props("graft.evalspill.maxbytes") = "1"
    try {
      val spilledBatch = searcher.searchBatch(reqs)
      val spilledSingle = reqs.map { case (q, o) => searcher.search(q, o, withWordInfo = false) }
      plainBatch.zip(spilledBatch).foreach { case (a, b) =>
        assert(a.docs.map(d => (d.docId, d.rank, d.bm25)) ==
          b.docs.map(d => (d.docId, d.rank, d.bm25)))
        assert(a.nFoundPages == b.nFoundPages)
      }
      plainSingle.zip(spilledSingle).foreach { case (a, b) =>
        assert(a.docs.map(d => (d.docId, d.rank)) == b.docs.map(d => (d.docId, d.rank)))
      }
    } finally sys.props.remove("graft.evalspill.maxbytes")
  }

  test("searchBatch withWordInfo: per-leaf counts equal sequential search") {
    val reqs = goldenQueries.take(6)
    val batch = searcher.searchBatch(reqs, withWordInfo = true)
    reqs.zip(batch).foreach { case ((q, opt), b) =>
      val a = searcher.search(q, opt, withWordInfo = true)
      assert(a.words.map(w => (w.word, w.nFound)) ==
        b.words.map(w => (w.word, w.nFound)), s"[$q] word info")
    }
  }

  test("BM25 top-k identical: batch and WAND paths") {
    val queries = Seq(
      Seq("old", "lady"),
      Seq("running", "ladies", "merriment"),
      Seq("w0001"),
      Seq("w0003", "tupman"),
      Seq("laughter", "company", "w0100"))
    val batch = searcher.bm25TopKBatch(queries, 10)
    queries.zipWithIndex.foreach { case (q, i) =>
      val ref = mem.bm25TopK(q, 10)
      assert(batch(i) == ref, s"batch bm25 [$q]:\n${batch(i)}\nvs\n$ref")
      val wand = searcher.bm25TopK(q, 10)
      assert(wand == ref, s"wand bm25 [$q]")
    }
  }

  test("BM25 batch MaxScore merge: 300 randomized queries bit-identical to reference") {
    // Stress the skip machinery: hot+rare mixes (non-essential demotion +
    // gallop probes), all-hot (no demotion), duplicates (dedup fan-out),
    // singletons, unknown words, and k larger than some result sets.
    val rnd = new scala.util.Random(20260817)
    val hot = Seq("old", "lady", "tupman", "merriment", "laughter", "game")
    def vocab(i: Int) = PagesGen.vocabWord(i)
    val queries: Seq[Seq[String]] = (0 until 300).map { i =>
      i % 6 match {
        case 0 => Seq(hot(rnd.nextInt(hot.length)), vocab(rnd.nextInt(500)))
        case 1 => Seq(hot(rnd.nextInt(hot.length)), hot(rnd.nextInt(hot.length)))
        case 2 => Seq(vocab(rnd.nextInt(100)), vocab(100 + rnd.nextInt(900)),
          hot(rnd.nextInt(hot.length)))
        case 3 => Seq(vocab(rnd.nextInt(1000)))
        case 4 => Seq("old", "lady") // repeated — exercises the dedup path
        case _ => Seq(hot(rnd.nextInt(hot.length)), "zzznosuchword",
          vocab(rnd.nextInt(1000)))
      }
    }
    Seq(3, 10, 50).foreach { k =>
      val batch = searcher.bm25TopKBatch(queries, k)
      assert(batch.length == queries.length)
      queries.zipWithIndex.foreach { case (q, i) =>
        val ref = mem.bm25TopK(q, k)
        assert(batch(i) == ref, s"k=$k [${q.mkString(" ")}]:\n${batch(i).take(5)}\nvs\n${ref.take(5)}")
      }
    }
  }

  test("build is resumable: second run skips all stages, results unchanged") {
    indexDir // force first build
    val pages = PagesGen.pages(spark, nDocsCorpus, parts = 7)
    val stats = IndexBuilder.build(spark, pages.toDF(), indexDir, IndexBuilder.BuildConfig(bucketBits = 5))
    assert(stats.resumedStages.toSet == Set("doctext", "docmeta", "postings", "termstats"), stats.resumedStages)
    assert(stats.nDocs == mem.nDocs)
    // partial resume: drop the termstats marker → only that stage re-runs
    java.nio.file.Files.delete(IndexStore.stageMarkerPath(indexDir, "termstats"))
    val stats2 = IndexBuilder.build(spark, pages.toDF(), indexDir, IndexBuilder.BuildConfig(bucketBits = 5))
    assert(stats2.resumedStages.toSet == Set("doctext", "docmeta", "postings"))
    val out = new SparkSearcher(spark, indexDir, Analyzer()).search("old")
    assert(out.docs.map(_.docId) == mem.search("old").docs.map(_.docId))
  }

  test("closeWords: distributed levenshtein neighbors match the reference engine") {
    Seq("lafy", "tupmen", "runing").foreach { typo =>
      assert(searcher.closeWords(typo) == mem.closeWords(typo), s"closeWords($typo)")
    }
    assert(searcher.closeWords("lafy").contains("lady"))
  }

  test("typed header coercion (ConvertToObject port)") {
    import graft.query.HeaderFields
    assert(HeaderFields.typedValue("190") == 190L)
    assert(HeaderFields.typedValue("-42") == -42L)
    assert(HeaderFields.typedValue("3.14") == BigDecimal("3.14"))
    assert(HeaderFields.typedValue("Author 3") == "Author 3") // mixed → string
    assert(HeaderFields.typedValue("free text") == "free text")
    val m = HeaderFields.convertToObject("Name=x\nSize=190\nPi=3.14\nBad\nTitle=Doc 1\n")
    assert(m == Map("Name" -> "x", "Size" -> 190L, "Pi" -> BigDecimal("3.14"), "Title" -> "Doc 1"))
    // flows through search results
    val hit = searcher.search("merriment {Source=web}", SearchOptions()).docs.head
    assert(hit.typedHeaders.get("Source").contains("web"))
  }

  test("extraction is byte-identical per url (spark vs local)") {
    import spark.implicits._
    val doctextFiles = IndexStore.readSnapshot(indexDir).get
      .files("doctext").map(f => s"$indexDir/$f")
    val got = spark.read.parquet(doctextFiles: _*)
      .select($"name", $"body").as[(String, String)].collect().toMap
    PagesGen.localPages(nDocsCorpus).foreach { case (url, html) =>
      val ex = HtmlExtract.extract(html)
      assert(got.get("web:" + url).contains(ex.text), s"extract($url)")
    }
  }
}
