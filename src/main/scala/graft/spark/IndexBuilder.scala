package graft.spark

import graft.core.{Consts, DocTokenizer, Varint}
import graft.text.{Analyzer, HtmlExtract}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Distributed inverted-index build.
  *
  * Pipeline (each stage commits a snapshot marker; re-runs skip committed
  * stages — north rule resumability):
  *
  *   1. `doctext`: pages → byte-identical text extraction + header synthesis
  *      + deterministic docId assignment (range-sort by url, zipWithIndex) →
  *      forward-index Parquet. One pass over the corpus.
  *   2. `postings`: ONE per-doc tokenize pass → map-side combined
  *      (term,doc) rows + one meta row per doc (page map/name/docLen) →
  *      document-sharded `repartition(bucket)` (bucket = docId >> bits;
  *      hot terms shard across buckets with disjoint ascending docId
  *      ranges — the salting the north rule names — while every term of a
  *      document stays co-located so query evaluation never shuffles) →
  *      `sortWithinPartitions(term, bucket, docId)` → streaming run
  *      block encoder → Parquet term-sorted within files (page-index
  *      pruning on term; one row group per file).
  *   3. `docmeta`: derived from the meta blocks (term-pruned scan, no
  *      second tokenize); global N and avgdl aggregate.
  *   4. `termstats`: tiny agg over block metadata → Parquet.
  *
  * Design notes for 10^12 docs: no driver-side collection of corpus data;
  * the only global scalars are N/avgdl; text is written once and re-read
  * (no giant persist); every shuffle key includes the bucket so no single
  * task ever sees a whole hot term (SURVEY §2.3 B5, §7.4.2).
  */
object IndexBuilder {

  final case class BuildConfig(
      bucketBits: Int = Consts.DocBucketBits,
      stopWords: Set[String] = Set.empty,
      sourceName: String = "web",
      includeHeaders: Boolean = true,
      stemming: Boolean = true,
      pageSize: Int = 0,
      vocabs: Seq[graft.text.Vocab] = Nil,
      formFeedPages: Boolean = false)

  final case class BuildStats(
      nDocs: Long,
      avgdl: Double,
      totalPostings: Long,
      resumedStages: Seq[String])

  /** body → pages: single page "1" for web docs (IndexPagedTextFile,
    * DataSources.cs:99-108) or fixed-size chunks like the reference's text
    * files (PAGE_SIZE=3000, DataSources.cs:308) when pageSize > 0. */
  def pagesOf(body: String, pageSize: Int): Seq[(String, String)] =
    pagesOf(body, pageSize, formFeed = false)

  /** With `formFeed` on, a body containing '\f' is PRE-paginated (the PDF
    * source's per-PDF-page contract, DocumentDataSource.cs:86-93): pages
    * are the '\f'-separated segments numbered "1".."N" — empty segments
    * keep their number so snippets address the right PDF page. Bodies
    * without '\f' fall back to the pageSize rule, so mixed corpora
    * (txt + pdf from one folder source) paginate each document correctly.
    * Deterministic and build/query shared: the searcher re-derives page
    * texts for snippets with the SAME call (config persisted in the
    * index's buildcfg.properties). */
  def pagesOf(body: String, pageSize: Int, formFeed: Boolean): Seq[(String, String)] = {
    if (formFeed && body.indexOf('\f') >= 0) {
      val parts = body.split("\f", -1)
      (0 until parts.length).map(i => ((i + 1).toString, parts(i)))
    } else if (pageSize <= 0 || body.length <= pageSize) Seq(("1", body))
    else (0 until (body.length + pageSize - 1) / pageSize).map { i =>
      ((i + 1).toString, body.substring(i * pageSize, math.min(body.length, (i + 1) * pageSize)))
    }
  }

  def analyzerFor(cfg: BuildConfig): Analyzer =
    Analyzer(stopWords = cfg.stopWords, vocabs = cfg.vocabs, enableStemming = cfg.stemming)

  /** Storage layout version — bumped whenever the block schema/semantics
    * change, so stale indexes never silently resume across layouts. */
  val LayoutVersion = "layout-v5-versioned-dirs"

  /** Signature of the input snapshot + build config + layout. Pins resume:
    * a stage marker only skips when all three match. File-less inputs
    * (generated datasets, JDBC relations) contribute their schema: two
    * builds into one indexDir with the same schema and config resume each
    * other — callers switching the underlying query/generator should use a
    * fresh dir or a distinguishing cfg.sourceName. */
  private def inputSignature(pages: DataFrame, cfg: BuildConfig): String = {
    val files = pages.inputFiles.sorted
    val h = java.security.MessageDigest.getInstance("SHA-256")
    val hconf = pages.sparkSession.sparkContext.hadoopConfiguration
    files.foreach { f =>
      h.update(f.getBytes("UTF-8"))
      // length + mtime, not just the path: an input refreshed IN PLACE
      // under stable file names (non-Spark feed writers) must not resume
      // onto stage outputs built from the old bytes — that would commit a
      // snapshot silently reflecting stale data
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(hconf).getFileStatus(p)
        h.update(s"#${st.getLen}#${st.getModificationTime}".getBytes("UTF-8"))
      } catch { case _: Throwable => } // unstattable path: fall back to name-only
    }
    h.update(pages.schema.json.getBytes("UTF-8"))
    h.update(cfg.toString.getBytes("UTF-8"))
    h.update(LayoutVersion.getBytes("UTF-8"))
    files.length + ":" + h.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** pages → extracted forward-index rows with deterministic url-sorted
    * docIds starting at `baseDocId`.
    *
    * docIds are assigned on a URLS-ONLY range exchange (~tens of bytes per
    * row): zipWithIndex's two jobs (count pass + map pass) re-read and
    * re-sort only url keys, never payloads. The extracted payload is range-
    * exchanged ONCE with the SAME partitioner and merged back per partition
    * in lockstep (both sides are the same url multiset sorted the same
    * way), so the expensive shuffle is written once and reduce-side-sorted
    * once — previously the payload shuffle was sorted twice, which showed
    * as ~0.74 pair efficiency for this stage vs 0.85 for postings.
    * Output stays url-sorted = docId-clustered, which the snippet
    * point-lookup layout relies on. Extraction runs ONCE, in the payload
    * shuffle's MAP stage; range bounds are sampled from a urls-only
    * projection (column-pruned parquet scan). No corpus-sized persist: at
    * 100 TB local disk is the scarce resource, so the shuffle files are
    * re-read rather than cached (SURVEY §7.1 rationale).
    *
    * Empty-extraction docs are dropped AFTER id assignment (docId gaps),
    * matching FromHtml's null contract (WebDataSource.cs:244,268). The
    * optional `header` column (XML/DB sources) overrides the synthesized
    * header page. */
  def extractDocText(spark: SparkSession, pages: DataFrame, srcName: String,
                     includeHeaders: Boolean, baseDocId: Long): Dataset[DocTextRow] = {
    import spark.implicits._
    val in = (if (pages.columns.contains("header"))
      pages.select($"url", $"html", $"text", $"header")
    else pages.select($"url", $"html", $"text", lit(null).cast("string").as("header")))
      .as[(String, Array[Byte], String, String)]
    val extracted = in.rdd.map { case (url, html, text, customHdr) =>
      val ex =
        if (text != null && text.nonEmpty) HtmlExtract.Extracted(text, "", "")
        else if (html != null) HtmlExtract.extract(html)
        else HtmlExtract.Extracted("", "", "")
      val hdr =
        if (customHdr != null) customHdr
        else if (includeHeaders && ex.text.nonEmpty) ex.headers(url, srcName) else ""
      (url, (hdr, ex.text))
    }
    // Doc-name prefix = the row's own Source= header when a source
    // provided one (reference names are <source>.Name + sep + doc name, so
    // a multi-source union keeps per-source prefixes); cfg.sourceName
    // otherwise.
    def srcPrefixOf(hdr: String): String = {
      if (hdr == null || hdr.isEmpty) srcName
      else {
        val at = if (hdr.startsWith("Source=")) 0 else hdr.indexOf("\nSource=") + 1
        if (at < 0 || (at == 0 && !hdr.startsWith("Source="))) srcName
        else {
          val start = at + "Source=".length
          val end = hdr.indexOf('\n', start)
          if (end < 0) hdr.substring(start) else hdr.substring(start, end)
        }
      }
    }
    val parts = math.max(1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    // urls are tiny (~tens of bytes/row) but the scan inherits the
    // html-sized split config — coalesce to one partition per core so the
    // sampling and count jobs pay task-launch overhead per core, not per
    // html-sized split
    val urls = pages.select($"url").as[String].rdd
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism))
      .map((_, null))
    val partitioner = new org.apache.spark.RangePartitioner(parts, urls)
    // Per-partition docId bases WITHOUT executing the url shuffle twice:
    // zipWithIndex's internal count job re-ran the urls shuffle (map write
    // + fetch + reduce-side SORT) just to learn per-partition element
    // counts — but those counts are a pure function of the partitioner
    // over the UNSORTED urls, so one narrow bucket-count pass over the
    // already-coalesced urls scan replaces the whole extra shuffle
    // execution (guide §2.4: remove shuffles outright).
    val counts: Array[Long] = urls.mapPartitions { it =>
      val c = new Array[Long](parts)
      it.foreach { case (u, _) => c(partitioner.getPartition(u)) += 1 }
      Iterator.single(c)
    }.fold(new Array[Long](parts)) { (a, b) =>
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    val offsets: Array[Long] = counts.scanLeft(0L)(_ + _).toArray
    // ids: partition p holds exactly the sorted urls of payload partition p
    val ids = urls.repartitionAndSortWithinPartitions(partitioner)
      .mapPartitionsWithIndex({ (p, it) =>
        var i = offsets(p)
        it.map { case (u, _) => val r = (u, i); i += 1; r }
      }, preservesPartitioning = true)
    // (r6 A/B, kept Java serialization: a Kryo-serialized ShuffledRDD for
    // this payload exchange measured FLAT stage CPU — 41.4 vs 41.2 s —
    // with +10% shuffle bytes; the stage's cost is parquet decode + zstd,
    // not record framing.)
    val sortedPayload = extracted.repartitionAndSortWithinPartitions(partitioner)
    sortedPayload.zipPartitions(ids) { (pIt, idIt) =>
      pIt.zip(idIt).flatMap { case ((url, (hdr, body)), (idUrl, i)) =>
        require(url == idUrl, s"docId assignment out of sync: $url vs $idUrl")
        if (body.isEmpty) None
        else Some(DocTextRow(baseDocId + i, srcPrefixOf(hdr) + Consts.DocSep + url, hdr, body))
      }
    }.toDS()
  }

  def build(spark: SparkSession, pages: DataFrame, indexDir: String,
            cfg: BuildConfig = BuildConfig()): BuildStats = {
    import spark.implicits._
    val sig = inputSignature(pages, cfg)
    val resumed = ArrayBuffer.empty[String]
    val an = analyzerFor(cfg)
    val timing = sys.env.contains("GRAFT_TIMING")
    var tMark = System.nanoTime()
    def mark(stage: String): Unit = if (timing) {
      val now = System.nanoTime()
      System.err.println(f"[graft-timing] $stage: ${(now - tMark) / 1e9}%.2fs")
      tMark = now
    }

    // Intended snapshot version, computed up front so every table writes a
    // VERSION-SCOPED directory: a full rebuild never touches the previous
    // snapshot's files — the "swap" is just the CURRENT pointer, and older
    // snapshots stay readable (time travel) until `vacuum` expires them.
    // A crash-rerun recomputes the same version (CURRENT unchanged) and
    // resumed stages reuse the directory their marker recorded.
    val intendedVersion = IndexStore.currentVersion(indexDir).getOrElse(0) + 1
    def stageDir(stage: String, default: String): String =
      (if (IndexStore.stageDone(indexDir, stage, sig))
        IndexStore.readStageDetail(indexDir, stage, "dir") else None)
        .getOrElse(default)
    val docTextDirName = stageDir("doctext", s"doctext/build-v$intendedVersion")
    val docTextPath = s"$indexDir/$docTextDirName"
    val docMetaDirName = stageDir("docmeta", s"docmeta/build-v$intendedVersion")
    val docMetaPath = s"$indexDir/$docMetaDirName"
    val postingsDirName = stageDir("postings", s"postings/build-v$intendedVersion")
    val postingsPath = s"$indexDir/$postingsDirName"
    val termStatsDirName = stageDir("termstats", s"termstats-v$intendedVersion")
    val termStatsPath = s"$indexDir/$termStatsDirName"

    // The split-size tuning below mutates a SESSION-GLOBAL conf: restore
    // the caller's value on every exit — a stage that throws would
    // otherwise leave splits as small as 1 MB for every later job in a
    // long-lived session, and success used to erase a user-set value.
    val priorSplit = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    def restoreSplit(): Unit = priorSplit match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
    try {

    // ---- stage 1: doctext (extract + docId assignment) ----
    if (IndexStore.stageDone(indexDir, "doctext", sig)) resumed += "doctext"
    else {
      // Size the INPUT scan's splits like the tokenize stages below: the
      // extraction map runs inside this scan, and with the default 128 MB
      // maxPartitionBytes a small corpus packs into a handful of
      // FilePartitions — extraction then can't use all cores. ≥3 splits
      // per core; at real scale bytes/(3·cores) exceeds 128 MB and this
      // clamps to the default.
      val inputBytes = {
        val conf = spark.sparkContext.hadoopConfiguration
        pages.inputFiles.foldLeft(0L) { (acc, f) =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            acc + p.getFileSystem(conf).getFileStatus(p).getLen
          } catch { case _: Throwable => acc }
        }
      }
      if (inputBytes > 0) {
        val split = math.min(128L << 20,
          math.max(1L << 20, inputBytes / math.max(1, spark.sparkContext.defaultParallelism * 3)))
        spark.conf.set("spark.sql.files.maxPartitionBytes", split.toString)
      }
      val docText = extractDocText(spark, pages, cfg.sourceName, cfg.includeHeaders, 0L)
      docText.write.mode("overwrite").parquet(docTextPath)
      // row count comes from the docmeta aggregate in stage 2 (same rows);
      // avoiding a bookkeeping job here keeps the build's fixed cost down
      IndexStore.commitStage(indexDir, IndexStore.StageRecord(
        "doctext", sig, -1L, dirBytes(docTextPath), Map("dir" -> docTextDirName)))
    }

    mark("stage1-doctext")

    // The tokenize passes (stages 2/3) are CPU-bound map stages over the
    // forward index. Make sure the scan yields at least ~3 splits per core:
    // with the default 128 MB maxPartitionBytes a small corpus packs into
    // one FilePartition and tokenization runs single-threaded, which is
    // exactly the scaling bug the N-vs-4N run is meant to catch. At real
    // scale bytes/(3·cores) exceeds 128 MB and this clamps to the default.
    val cores = spark.sparkContext.defaultParallelism
    val targetSplit = math.min(128L << 20,
      math.max(1L << 20, dirBytes(docTextPath) / math.max(1, cores * 3)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", targetSplit.toString)

    val docText = spark.read.parquet(docTextPath).as[DocTextRow]

    // ---- stage 2: postings blocks (ONE tokenize pass) ----
    // Tokenization is the build's dominant CPU cost, so it runs exactly
    // once: the same pass emits the per-(term,doc) posting rows AND one
    // meta row per document (page boundaries + name + docLen, packed into
    // the posting-row payload). The meta rows ride the same bucket shuffle
    // and land in the postings files as '\u0000md' blocks; stage 3 derives
    // the docmeta table from them with a cheap term-pruned scan — no
    // second tokenize, no cached intermediate.
    implicit val stageEc: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global

    // The postings WRITE is the synchronous backbone; everything after it
    // (row-group verify, global-scalar aggregate, postings commit, docmeta
    // derivation, termstats aggregate) is an independent read of the files
    // just written and runs on concurrent driver threads — the scheduler
    // interleaves their tasks, so these small latency-bound jobs cost
    // max() instead of sum() of their wall times. `postingsInfoF` resolves
    // to (totalPostings, nDocs, avgdl) once the postings stage commits;
    // stages 3/4 start their Spark jobs immediately but hold their OWN
    // commits until it resolves, keeping the marker order crash-safe.
    val postingsInfoF: scala.concurrent.Future[(Long, Long, Double)] =
    if (IndexStore.stageDone(indexDir, "postings", sig)) {
      resumed += "postings"
      scala.concurrent.Future.successful((
        IndexStore.readStageDetail(indexDir, "postings", "totalPostings").get.toLong,
        IndexStore.readStageDetail(indexDir, "postings", "nDocs").get.toLong,
        IndexStore.readStageDetail(indexDir, "postings", "avgdl").get.toDouble))
    } else {
      val bc = spark.sparkContext.broadcast(an)
      val bits = cfg.bucketBits
      val psz = cfg.pageSize
      val ffp = cfg.formFeedPages
      // Per-INPUT-partition provenance rides the tokenize pass as an O(1)
      // wrapper over the run iterator (docId range + posting/doc counts per
      // input partition — the input side of the per-partition lineage).
      // `add` OVERWRITES by partition id, so a speculated/retried task
      // cannot double-count.
      val provAcc = new ProvenanceAcc
      spark.sparkContext.register(provAcc, "graft-input-provenance")
      // Per-partition posting RUNS (the north star's "per-partition posting
      // lists via mapPartitions"): tokenize once and accumulate compact
      // per-(term, bucket) runs map-side instead of one row per (term,
      // doc). The exchange then moves ~|bucket vocabulary| rows per bucket
      // — at this corpus ~4-6× fewer rows and ~2× fewer bytes — and the
      // reduce-side sort orders runs, not postings.
      val termRuns: Dataset[TermRunRow] = docText.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val base = combineRuns(it, bc.value, psz, ffp, bits)
        new Iterator[TermRunRow] {
          private var minD = Long.MaxValue
          private var maxD = Long.MinValue
          private var nPost = 0L
          private var nDocs = 0L
          private var reported = false
          def hasNext: Boolean = {
            val h = base.hasNext
            if (!h && !reported) {
              reported = true
              if (minD != Long.MaxValue)
                provAcc.add((pid, Array(minD, maxD, nPost, nDocs)))
            }
            h
          }
          def next(): TermRunRow = {
            val r = base.next()
            if (r.firstDocId < minD) minD = r.firstDocId
            if (r.lastDocId > maxD) maxD = r.lastDocId
            if (r.term == MetaTerm) nDocs += r.nDocs else nPost += r.nPostings
            r
          }
        }
      }

      val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
      // Document-sharded layout: partition by BUCKET ONLY, so every term of
      // a given document lands in the same output partition (bucket is a
      // docId range). Query-side BM25 scoring and positional evaluation
      // then run shuffle-free as mapPartitions over the scan — each task
      // scores its own document shard (the classic sharded-search layout).
      // Hot terms still shard across buckets; within each file rows are
      // term-sorted so row-group stats prune term lookups.
      val blocks = termRuns
        .repartition(shufflePartitions, $"bucket")
        .sortWithinPartitions($"term", $"bucket", $"firstDocId")
        .mapPartitions(mergeRuns(_))

      blocks.write.mode("overwrite")
        .options(postingsWriteOptions).parquet(postingsPath)
      mark("stage2-write")
      // the row-group verifier and the scalar aggregate run on their own
      // driver threads (each alone can't fill the cluster's slots); the
      // postings commit lands once both finish.
      val verifyF = scala.concurrent.Future(verifySingleRowGroup(spark, postingsPath))
      scala.concurrent.Future {
        // ONE column-pruned job computes every global scalar — total
        // postings + block count, N/sumDl decoded from the meta blocks'
        // dls channel (no separate docmeta aggregate job) — AND the
        // per-FILE lineage metrics (blocks/postings/docs per posting
        // shard; each file is one build partition's output). The per-file
        // map is the same cardinality as the manifest's file listing, so
        // collecting it adds nothing asymptotically at web scale.
        val m = spark.read.parquet(postingsPath)
          .select($"term", $"nDocs", $"nPostings", $"dls",
            input_file_name().as("file"))
          .as[(String, Int, Long, Array[Byte], String)]
          .rdd
          .mapPartitions { it =>
            var nPost = 0L; var nBlocks = 0L; var nDocs = 0L; var sumDl = 0L
            val perFile = scala.collection.mutable.HashMap.empty[String, Array[Long]]
            it.foreach { case (term, nd, np, dls, file) =>
              nBlocks += 1
              nPost += np
              lineageAccum(perFile, file, term, nd, np)
              if (term == MetaTerm) {
                nDocs += nd
                val r = new Varint.Reader(dls)
                var i = 0
                while (i < nd) { sumDl += r.nextRaw(); i += 1 }
              }
            }
            Iterator.single((nPost, nBlocks, nDocs, sumDl, perFile.toMap))
          }
          .reduce { (a, b) =>
            (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4,
              lineageMergeMaps(a._5, b._5))
          }
        val avgdl = if (m._3 == 0) 1.0 else m._4.toDouble / m._3
        // per-partition lineage file: one JSON entry per posting shard
        // (blocks, postings, docs, bytes), vacuumed with its version
        IndexStore.writeLineage(indexDir, intendedVersion,
          lineageFinish(spark, postingsPath, postingsDirName, m._5),
          provAcc.value.map { case (pid, a) =>
            pid -> IndexStore.PartitionProvenance(a(0), a(1), a(2), a(3))
          })
        scala.concurrent.Await.result(verifyF, scala.concurrent.duration.Duration.Inf)
        IndexStore.commitStage(indexDir, IndexStore.StageRecord(
          "postings", sig, m._2, dirBytes(postingsPath),
          Map("totalPostings" -> m._1.toString, "dir" -> postingsDirName,
            "nDocs" -> m._3.toString, "avgdl" -> avgdl.toString,
            "lineage" -> s"lineage-v$intendedVersion.json")))
        (m._1, m._3, avgdl)
      }
    }

    // stage 3: docmeta table derived from the meta blocks. The Spark job
    // starts immediately (the postings FILES are on disk); only its stage
    // marker waits for the postings commit, so a crash can never leave a
    // docmeta marker without a postings marker.
    val stage3F: scala.concurrent.Future[Boolean] =
      if (IndexStore.stageDone(indexDir, "docmeta", sig))
        scala.concurrent.Future.successful(true)
      else scala.concurrent.Future {
        val docMeta = spark.read.parquet(postingsPath).as[PostingBlockRow]
          .filter($"term" === MetaTerm)
          .flatMap(decodeMetaBlock)
        docMeta.write.mode("overwrite").parquet(docMetaPath)
        val (_, nDocs, avgdl) =
          scala.concurrent.Await.result(postingsInfoF, scala.concurrent.duration.Duration.Inf)
        IndexStore.commitStage(indexDir, IndexStore.StageRecord(
          "docmeta", sig, nDocs, dirBytes(docMetaPath),
          Map("nDocs" -> nDocs.toString, "avgdl" -> avgdl.toString,
            "dir" -> docMetaDirName)))
        false
      }

    // stage 4: term dictionary from block metadata (tiny agg)
    val stage4F: scala.concurrent.Future[Boolean] =
      if (IndexStore.stageDone(indexDir, "termstats", sig))
        scala.concurrent.Future.successful(true)
      else scala.concurrent.Future {
        // hash-partitioned by term with a per-file sort: parallel write (a
        // web-scale vocab is billions of entries — a single-partition
        // sort/write would be the build's bottleneck and an OOM risk) and
        // rows stay term-sorted WITHIN each file so parquet page indexes
        // prune dictionary lookups. (Hash, not range: a range partitioner
        // would sample — i.e. execute — the aggregate subtree twice.)
        val statsParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
        spark.read.parquet(postingsPath)
          .filter($"term" =!= DlStripTerm && $"term" =!= MetaTerm)
          .groupBy($"term")
          .agg(sum($"nDocs").cast("long").as("df"), sum($"nPostings").as("cf"))
          .repartition(statsParts, $"term").sortWithinPartitions($"term")
          .write.mode("overwrite").parquet(termStatsPath)
        scala.concurrent.Await.result(postingsInfoF, scala.concurrent.duration.Duration.Inf)
        IndexStore.commitStage(indexDir, IndexStore.StageRecord(
          "termstats", sig, -1L, dirBytes(termStatsPath), Map("dir" -> termStatsDirName)))
        false
      }

    val (totalPostings, nDocs, avgdl) =
      scala.concurrent.Await.result(postingsInfoF, scala.concurrent.duration.Duration.Inf)
    mark("stage2-postings")
    if (scala.concurrent.Await.result(stage3F, scala.concurrent.duration.Duration.Inf))
      resumed += "docmeta"
    mark("stage3-docmeta")
    if (scala.concurrent.Await.result(stage4F, scala.concurrent.duration.Duration.Inf))
      resumed += "termstats"
    mark("stage4-termstats")
    // persist the analyzer configuration with the index so query-time
    // code resolution always matches build-time tokenization (vocabs,
    // stopwords, stemming) — loaded by SparkSearcher.open
    // atomic: a truncated analyzer.bin would fail every SparkSearcher.open
    IndexStore.writeFileAtomic(indexDir, "analyzer.bin", analyzerBytes(an))
    writeBuildProps(indexDir, cfg)
    // version-pinned copies: readers resolve THIS version's analyzer/props
    // even after a later cfg-changed rebuild overwrites the unversioned
    // files (time travel), and open() pairs CURRENT with its own version's
    // copies — closing the crash window between the overwrites above and
    // the manifest commit below
    writeVersionedArtifacts(indexDir, intendedVersion, an, cfg.pageSize, cfg.formFeedPages)

    // a full (re)build starts a new lineage: clear any streaming
    // continuation marker so a later append derives its docId space and
    // running sums from THIS snapshot, not a pre-rebuild corpus
    java.nio.file.Files.deleteIfExists(IndexStore.stageMarkerPath(indexDir, "stream"))

    // ---- snapshot commit (manifest lists the exact files of each table,
    // so readers can pin this version even after later appends or rebuilds) ----
    IndexStore.writeSnapshot(indexDir, IndexStore.Snapshot(
      intendedVersion, nDocs, avgdl, totalPostings,
      Seq("doctext", "docmeta", "postings", "termstats").map { s =>
        IndexStore.StageRecord(s, sig,
          IndexStore.readStageDetail(indexDir, s, "rows").map(_.toLong).getOrElse(0L), 0L, Map.empty)
      },
      Map(
        "doctext" -> IndexStore.listTableFiles(indexDir, docTextDirName),
        "docmeta" -> IndexStore.listTableFiles(indexDir, docMetaDirName),
        "postings" -> IndexStore.listTableFiles(indexDir, postingsDirName),
        "termstats" -> IndexStore.listTableFiles(indexDir, termStatsDirName))))

    BuildStats(nDocs, avgdl, totalPostings, resumed.toSeq)
    } finally restoreSplit()
  }

  /** Parquet options for the postings table: ONE row group per file.
    *
    * Query-side evaluation (BM25 scoring, positional kernels) runs as
    * mapPartitions over the postings scan and assumes every block of a
    * document — including the per-bucket dl strip — is seen by ONE task.
    * Parquet files with >1 row group are split across tasks at row-group
    * boundaries, which would silently break that invariant once a file
    * exceeds the 128 MB row-group default (partial BM25 scores, dl
    * fallback to 1, duplicate eval rows). With a single row group the
    * whole file is read by exactly one task no matter how the scan is
    * split (parquet assigns a row group to the split containing its
    * midpoint), so the invariant is structural, not tuning-dependent.
    *
    * At scale the file (= row group) size is governed by the number of
    * shuffle partitions in the build: size them so each postings file is
    * ~512 MB–1 GB. Term lookups stay pruned WITHIN the row group via
    * parquet page-level column indexes (rows are term-sorted per file).
    */
  val postingsWriteOptions: Map[String, String] = Map(
    "parquet.block.size" -> (64L << 30).toString)

  /** Enforce the one-row-group-per-file invariant after a postings write:
    * parquet's MemoryManager can silently scale row-group sizes down under
    * many concurrent writers, which would re-split docs across tasks at
    * scale. Footer reads are distributed (one tiny task per file). Fails
    * the build with guidance rather than corrupting query results later. */
  /** Recursively list `.parquet` files under `dir` (path, byteLen) via the
    * Hadoop FileSystem API — works on any supported filesystem, not just
    * local disk. Fails loudly when the directory cannot be enumerated: a
    * silent empty answer would quietly disable the row-group verifier and
    * collapse the reader's maxPartitionBytes to its floor. */
  def listParquetFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path))
      throw new IllegalStateException(s"index directory does not exist or cannot be listed: $dir")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        out += ((st.getPath.toString, st.getLen))
    }
    out.toSeq
  }

  // ---- shared per-file lineage primitives -------------------------------
  // ONE definition of the accumulate/merge/finish steps, used by BOTH
  // lineage producers (the full build's fused scalar job and
  // postingsFileMetrics below): a semantics change applied to one copy
  // would otherwise silently diverge full-build lineage from
  // append/compaction lineage. Slots: 0 = blocks, 1 = Σ nPostings,
  // 2 = Σ meta-block doc counts.

  private[spark] def lineageAccum(
      perFile: scala.collection.mutable.HashMap[String, Array[Long]],
      file: String, term: String, nDocs: Int, nPostings: Long): Unit = {
    val pf = perFile.getOrElseUpdate(file, new Array[Long](3))
    pf(0) += 1; pf(1) += nPostings
    if (term == MetaTerm) pf(2) += nDocs
  }

  private[spark] def lineageMergeMaps(
      a: Map[String, Array[Long]], b: Map[String, Array[Long]]): Map[String, Array[Long]] = {
    val merged = scala.collection.mutable.HashMap.empty[String, Array[Long]]
    (a.iterator ++ b.iterator).foreach { case (f, v) =>
      val t = merged.getOrElseUpdate(f, new Array[Long](3))
      t(0) += v(0); t(1) += v(1); t(2) += v(2)
    }
    merged.toMap
  }

  /** Attach file sizes and manifest-relative names to the accumulated
    * per-file slot arrays. */
  private[spark] def lineageFinish(spark: SparkSession, dir: String, relPrefix: String,
                                   perFile: Map[String, Array[Long]])
      : Map[String, IndexStore.FileMetrics] = {
    val bytesOf = listParquetFiles(spark, dir)
      .map { case (p, len) => p.substring(p.lastIndexOf('/') + 1) -> len }.toMap
    perFile.map { case (uri, v) =>
      val name = uri.substring(uri.lastIndexOf('/') + 1)
      s"$relPrefix/$name" -> IndexStore.FileMetrics(v(0), v(1), v(2), bytesOf.getOrElse(name, -1L))
    }
  }

  /** Per-file lineage metrics for a postings directory — the same
    * aggregation the full build fuses into its global-scalar job (blocks =
    * block rows, postings = Σ nPostings, docs = Σ meta-block doc counts,
    * bytes = file length). Used by the streaming append and compaction
    * commits so every snapshot version's files carry lineage, not just
    * full builds'. Keys are `relPrefix/<fileName>` (manifest-relative). */
  def postingsFileMetrics(spark: SparkSession, dir: String,
                          relPrefix: String): Map[String, IndexStore.FileMetrics] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.input_file_name
    val parts = spark.read.parquet(dir)
      .select($"term", $"nDocs", $"nPostings", input_file_name().as("file"))
      .as[(String, Int, Long, String)]
      .rdd
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Array[Long]]
        it.foreach { case (term, nd, np, file) => lineageAccum(m, file, term, nd, np) }
        Iterator.single(m.toMap)
      }
    val perFile =
      if (parts.partitions.isEmpty) Map.empty[String, Array[Long]]
      else parts.reduce(lineageMergeMaps)
    lineageFinish(spark, dir, relPrefix, perFile)
  }

  def verifySingleRowGroup(spark: SparkSession, dir: String): Unit = {
    val files = listParquetFiles(spark, dir).map(_._1)
    if (files.isEmpty) return
    // Configuration isn't Serializable; ship the explicitly-set entries and
    // rebuild per task so non-local filesystems keep their credentials/conf.
    val confEntries: Array[(String, String)] = {
      val base = spark.sparkContext.hadoopConfiguration
      val it = base.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    def rowGroups(p: String): (String, Int) = {
      val conf = new org.apache.hadoop.conf.Configuration()
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try (p, r.getRowGroups.size()) finally r.close()
    }
    // footer reads are cheap: stay driver-side for few files (no extra
    // Spark job in the build's fixed-cost budget; a local thread pool
    // hides the per-footer open latency), distribute when many
    val bad =
      if (files.size <= 64) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(8, files.size))
        try {
          import scala.jdk.CollectionConverters._
          val futures = files.map(f =>
            pool.submit(new java.util.concurrent.Callable[(String, Int)] {
              def call(): (String, Int) = rowGroups(f)
            }))
          futures.map(_.get()).filter(_._2 > 1).toArray
        } finally pool.shutdown()
      }
      else spark.sparkContext
        .parallelize(files, math.min(files.size, spark.sparkContext.defaultParallelism))
        .map(rowGroups)
        .filter(_._2 > 1).collect()
    require(bad.isEmpty,
      s"postings files with >1 row group (doc-shard invariant broken): " +
        bad.take(3).map { case (p, n) => s"$p($n)" }.mkString(", ") +
        " — raise spark.sql.shuffle.partitions so each postings file fits one row group")
  }

  /** Reader-side confs matching the one-row-group layout: one task per
    * postings file — no byte-range splitting (maxPartitionBytes = largest
    * file) and no small-file packing (openCost = same), so parallelism is
    * exactly #files and the doc-shard invariant holds. */
  def postingsReadConfs(postingsBytesMax: Long): Seq[(String, String)] = {
    val cap = math.max(1L << 20, postingsBytesMax)
    Seq(
      "spark.sql.files.maxPartitionBytes" -> cap.toString,
      "spark.sql.files.openCostInBytes" -> cap.toString)
  }

  /** Sentinel "term" of per-bucket document-length strips: each bucket gets
    * one row mapping its docIds → dl, instead of repeating dl in every
    * (term,doc) entry (≈2 bytes/termdoc saved). Sorts before all real terms
    * (\u0000 prefix) and is excluded from termstats. */
  val DlStripTerm = "\u0000dl"

  /** Sentinel "term" of per-doc metadata rows (name, page boundaries,
    * docLen), emitted by the SAME tokenize pass as the postings so the
    * corpus is tokenized exactly once. Blocked per bucket in the postings
    * table; the docmeta table is derived from these blocks. Excluded from
    * termstats and never matched by query-code filters. */
  val MetaTerm = "\u0000md"

  /** pack (name, pageIds, pageEnds) into a meta row payload. */
  def encodeMetaPayload(name: String, pageIds: Array[String], pageEnds: Array[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64 + name.length)
    val out = new java.io.DataOutputStream(bos)
    out.writeUTF(name)
    out.writeInt(pageIds.length)
    var i = 0
    while (i < pageIds.length) { out.writeUTF(pageIds(i)); out.writeLong(pageEnds(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  /** decode one MetaTerm block into DocMetaRows. */
  def decodeMetaBlock(b: PostingBlockRow): Iterator[DocMetaRow] = {
    val docR = new Varint.Reader(b.docDeltas)
    val lenR = new Varint.Reader(b.tfs)
    val dlR = new Varint.Reader(b.dls)
    var off = 0
    (0 until b.nDocs).iterator.map { _ =>
      val d = docR.next()
      val len = lenR.nextRaw().toInt
      val dl = dlR.nextRaw()
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(b.posDeltas, off, len))
      off += len
      val name = in.readUTF()
      val n = in.readInt()
      val pids = new Array[String](n)
      val pends = new Array[Long](n)
      var i = 0
      while (i < n) { pids(i) = in.readUTF(); pends(i) = in.readLong(); i += 1 }
      DocMetaRow(d, name, pids.toSeq, pends.toSeq, dl)
    }
  }

  /** decodeMetaBlock restricted to docs the predicate admits: everyone
    * else's payload bytes are skipped by offset arithmetic (the per-doc
    * payload length rides the tfs strip), so looking up meta for a few
    * candidate docs never deserializes the whole bucket's names/page
    * tables. */
  def decodeMetaBlockFor(b: PostingBlockRow, want: Long => Boolean): Iterator[DocMetaRow] = {
    val docR = new Varint.Reader(b.docDeltas)
    val lenR = new Varint.Reader(b.tfs)
    val dlR = new Varint.Reader(b.dls)
    var off = 0
    (0 until b.nDocs).iterator.flatMap { _ =>
      val d = docR.next()
      val len = lenR.nextRaw().toInt
      val dl = dlR.nextRaw()
      val start = off
      off += len
      if (!want(d)) None
      else {
        val in = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(b.posDeltas, start, len))
        val name = in.readUTF()
        val n = in.readInt()
        val pids = new Array[String](n)
        val pends = new Array[Long](n)
        var i = 0
        while (i < n) { pids(i) = in.readUTF(); pends(i) = in.readLong(); i += 1 }
        Some(DocMetaRow(d, name, pids.toSeq, pends.toSeq, dl))
      }
    }
  }

  /** Streaming (term,bucket)-run block encoder over sorted TermDocRows.
    * MetaTerm rows block per bucket with their payloads concatenated; all
    * rows feed each bucket's docId→dl map, emitted as one dl-strip row per
    * bucket after the posting blocks. Block-max metadata is (maxTf, minDl)
    * only — bounds are recomputed with the CURRENT avgdl at query time, so
    * encoding needs no global scalars (lets the build tokenize once). */
  /** Max docs per posting block row: a hot term in a full 2^16-doc bucket
    * would otherwise make one giant row (coarse WAND skipping, unbounded
    * decode unit). Sub-blocks of one (term,bucket) run carry disjoint
    * ascending docId ranges, so every decoder just sees more rows. */
  val MaxBlockDocs: Int = 1 << 14

  /** One accumulating posting run (see TermRunRow). docDeltas encode
    * against base 0, so a run's first delta is its absolute firstDocId and
    * independently encoded runs splice by rewriting just that first delta. */
  /** Input-partition provenance accumulator: pid → [minDocId, maxDocId,
    * postings, docs]. `add` overwrites by pid, so stage retries and
    * speculative duplicates are idempotent (each successful task reports
    * the same deterministic totals for its partition). O(#partitions)
    * driver memory at any corpus size. */
  private[spark] final class ProvenanceAcc
    extends org.apache.spark.util.AccumulatorV2[(Int, Array[Long]), Map[Int, Array[Long]]] {
    private val m = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    override def isZero: Boolean = m.isEmpty
    override def copy(): ProvenanceAcc = {
      val c = new ProvenanceAcc
      c.m.putAll(m)
      c
    }
    override def reset(): Unit = m.clear()
    override def add(v: (Int, Array[Long])): Unit = m.put(v._1, v._2)
    override def merge(
        other: org.apache.spark.util.AccumulatorV2[(Int, Array[Long]), Map[Int, Array[Long]]]): Unit =
      other.value.foreach { case (k, v) => m.put(k, v) }
    override def value: Map[Int, Array[Long]] = {
      import scala.jdk.CollectionConverters._
      m.asScala.toMap
    }
  }

  private final class RunBuilder(val term: String, val bucket: Int, val firstDocId: Long) {
    var lastDocId = 0L
    var nDocs = 0
    var nPostings = 0L
    var maxTf = 0L
    var minDl = Long.MaxValue
    val docDeltas = new graft.core.ByteVec(16)
    val tfs = new graft.core.ByteVec(16)
    val dls = new graft.core.ByteVec(8)
    val payload = new graft.core.ByteVec(64)
    def row: TermRunRow = TermRunRow(term, bucket, firstDocId, lastDocId, nDocs,
      nPostings, maxTf, if (minDl == Long.MaxValue) 0L else minDl,
      docDeltas.toArray, tfs.toArray, dls.toArray, payload.toArray)
  }

  /** Map-side run combiner: tokenizes a docId-ASCENDING doctext partition
    * and accumulates per-(term, bucket) posting runs. Because docIds ascend
    * within a partition, the bucket is non-decreasing: builders live for
    * exactly one bucket visit and emit when the bucket advances, so peak
    * memory is ONE bucket's postings (≤ 2^bucketBits docs), with a byte
    * budget (`graft.runflush.maxbytes`, default 64 MB) as the hard
    * backstop and MaxBlockDocs as the per-run doc cap. The shuffle then
    * moves ~|bucket vocabulary| compact rows per bucket instead of one row
    * per (term, doc) — far fewer rows to exchange AND sort — and
    * mergeRuns reassembles them by byte splicing, never decoding.
    * Tokenization itself is identical to the reference pipeline
    * (DocTokenizer.indexGrouped), one pass per document. */
  def combineRuns(it: Iterator[DocTextRow], an: Analyzer, pageSize: Int,
                  formFeed: Boolean, bucketBits: Int,
                  maxBlockDocs: Int = MaxBlockDocs): Iterator[TermRunRow] = {
    val flushBytes = sys.props.get("graft.runflush.maxbytes").map(_.toLong)
      .getOrElse(64L << 20)
    val cache = new DocTokenizer.CodeCache(an)
    new Iterator[TermRunRow] {
      private val out = new java.util.ArrayDeque[TermRunRow]()
      private val builders = new java.util.HashMap[String, RunBuilder]()
      private var curBucket = -1
      private var pending = 0L

      private def emitAll(): Unit = {
        val bit = builders.values().iterator()
        while (bit.hasNext) out.add(bit.next().row)
        builders.clear()
        pending = 0L
      }

      private def builderFor(term: String, docId: Long): RunBuilder = {
        var rb = builders.get(term)
        if (rb != null && rb.nDocs >= maxBlockDocs) { out.add(rb.row); rb = null }
        if (rb == null) {
          rb = new RunBuilder(term, curBucket, docId)
          builders.put(term, rb)
        }
        rb
      }

      private def addDoc(d: DocTextRow): Unit = {
        val bucket = (d.docId >> bucketBits).toInt
        if (bucket != curBucket) { emitAll(); curBucket = bucket }
        val di = DocTokenizer.indexGrouped(an, d.header, pagesOf(d.body, pageSize, formFeed), cache)
        // group this doc's postings per term (same per-doc combine as ever)
        val byTerm = new java.util.HashMap[String, graft.core.LongVec]()
        var i = 0
        while (i < di.terms.length) {
          var v = byTerm.get(di.terms(i))
          if (v == null) { v = new graft.core.LongVec(8); byTerm.put(di.terms(i), v) }
          v += di.coords(i)
          i += 1
        }
        val metaBytes = encodeMetaPayload(d.name, di.pageIds, di.pageEnds)
        val mb = builderFor(MetaTerm, d.docId)
        Varint.putOne(mb.docDeltas, d.docId - mb.lastDocId); mb.lastDocId = d.docId
        Varint.putOne(mb.tfs, metaBytes.length.toLong) // lens channel
        Varint.putOne(mb.dls, di.docLen)
        mb.payload ++= metaBytes
        mb.nDocs += 1
        pending += metaBytes.length + 12
        val eit = byTerm.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val coords = e.getValue.toArray // ascending within the doc
          val coordBytes = Varint.encode(coords)
          val rb = builderFor(e.getKey, d.docId)
          Varint.putOne(rb.docDeltas, d.docId - rb.lastDocId); rb.lastDocId = d.docId
          Varint.putOne(rb.tfs, coords.length.toLong)
          rb.payload ++= coordBytes
          rb.nDocs += 1
          rb.nPostings += coords.length
          if (coords.length > rb.maxTf) rb.maxTf = coords.length.toLong
          if (di.docLen < rb.minDl) rb.minDl = di.docLen
          pending += coordBytes.length + 12
        }
        if (pending > flushBytes) emitAll()
      }

      def hasNext: Boolean = {
        while (out.isEmpty && it.hasNext) addDoc(it.next())
        if (out.isEmpty && !builders.isEmpty) emitAll()
        !out.isEmpty
      }
      def next(): TermRunRow = out.poll()
    }
  }

  /** Reduce-side run merger: consumes runs sorted by (term, bucket,
    * firstDocId) and emits final PostingBlockRows by BYTE SPLICING — a
    * follow-on run contributes one rewritten first delta plus verbatim
    * channel bytes, so the merge never decodes postings. Blocks close at
    * `maxBlockDocs` at run granularity (runs are themselves capped at the
    * same bound map-side). Meta runs additionally splice into one dl-strip
    * row per bucket, replacing encodeBlocks' TreeMap accumulation. Guards
    * throw on docId-order violations (would corrupt delta streams). */
  def mergeRuns(it: Iterator[TermRunRow]): Iterator[PostingBlockRow] =
    mergeRuns(it, MaxBlockDocs)

  def mergeRuns(it: Iterator[TermRunRow], maxBlockDocs: Int): Iterator[PostingBlockRow] = {
    val buf = it.buffered
    final class BlockAcc(r: TermRunRow) {
      val term = r.term
      val bucket = r.bucket
      val firstDocId = r.firstDocId
      var lastDocId = r.lastDocId
      var nDocs = r.nDocs
      var nPostings = r.nPostings
      var maxTf = r.maxTf
      var minDl = r.minDl
      val docDeltas = new graft.core.ByteVec(r.docDeltas.length + 16); docDeltas ++= r.docDeltas
      val tfs = new graft.core.ByteVec(r.tfs.length + 16); tfs ++= r.tfs
      val dls = new graft.core.ByteVec(r.dls.length + 8); dls ++= r.dls
      val payload = new graft.core.ByteVec(r.payload.length + 64); payload ++= r.payload
      def append(r2: TermRunRow): Unit = {
        if (r2.firstDocId <= lastDocId)
          throw new IllegalStateException(
            s"run order violation for term '${term}' bucket $bucket: " +
              s"run first docId ${r2.firstDocId} <= previous last $lastDocId")
        Varint.putOne(docDeltas, r2.firstDocId - lastDocId)
        docDeltas.appendSlice(r2.docDeltas, Varint.firstLen(r2.docDeltas))
        tfs ++= r2.tfs
        dls ++= r2.dls
        payload ++= r2.payload
        lastDocId = r2.lastDocId
        nDocs += r2.nDocs
        nPostings += r2.nPostings
        if (r2.maxTf > maxTf) maxTf = r2.maxTf
        if (r2.minDl < minDl) minDl = r2.minDl
      }
      def toBlock: PostingBlockRow = PostingBlockRow(term, bucket, firstDocId,
        nDocs, nPostings, docDeltas.toArray, tfs.toArray, dls.toArray,
        payload.toArray, 0.0, maxTf, minDl)
    }
    new Iterator[PostingBlockRow] {
      private val out = new java.util.ArrayDeque[PostingBlockRow]()
      private def consumeGroup(): Unit = {
        val term = buf.head.term
        val bucket = buf.head.bucket
        val meta = term == MetaTerm
        var cur: BlockAcc = null
        var strip: BlockAcc = null
        while (buf.hasNext && buf.head.term == term && buf.head.bucket == bucket) {
          val r = buf.next()
          if (cur == null) cur = new BlockAcc(r)
          else if (cur.nDocs + r.nDocs <= maxBlockDocs) cur.append(r)
          else { out.add(cur.toBlock); cur = new BlockAcc(r) }
          if (meta) {
            // dl strip: ONE row per bucket (unbounded), docIds + dls only
            val sr = TermRunRow(DlStripTerm, bucket, r.firstDocId, r.lastDocId,
              r.nDocs, 0L, 0L, 0L, r.docDeltas, Array.emptyByteArray, r.dls,
              Array.emptyByteArray)
            if (strip == null) strip = new BlockAcc(sr) else strip.append(sr)
          }
        }
        if (cur != null) out.add(cur.toBlock)
        if (strip != null) out.add(strip.toBlock)
      }
      def hasNext: Boolean = {
        while (out.isEmpty && buf.hasNext) consumeGroup()
        !out.isEmpty
      }
      def next(): PostingBlockRow = out.poll()
    }
  }

  def encodeBlocks(it: Iterator[TermDocRow]): Iterator[PostingBlockRow] =
    encodeBlocks(it, MaxBlockDocs)

  def encodeBlocks(it: Iterator[TermDocRow], maxBlockDocs: Int): Iterator[PostingBlockRow] = {
    val dlByBucket = new java.util.HashMap[Int, java.util.TreeMap[java.lang.Long, java.lang.Long]]()
    val main: Iterator[PostingBlockRow] = new Iterator[PostingBlockRow] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): PostingBlockRow = {
        val head = buf.next()
        val term = head.term
        val bucket = head.bucket
        def noteDl(docId: Long, dl: Long): Unit = {
          var bm = dlByBucket.get(bucket)
          if (bm == null) { bm = new java.util.TreeMap(); dlByBucket.put(bucket, bm) }
          bm.put(docId, dl)
        }
        if (term == MetaTerm) {
          val docIds = new graft.core.LongVec(); docIds += head.docId
          val lens = new graft.core.LongVec(); lens += head.coords.length.toLong
          val dls = new graft.core.LongVec(); dls += head.dl
          val payload = new graft.core.ByteVec(head.coords.length * 2)
          payload ++= head.coords
          noteDl(head.docId, head.dl)
          while (docIds.length < maxBlockDocs &&
            buf.hasNext && buf.head.term == term && buf.head.bucket == bucket) {
            val r = buf.next()
            docIds += r.docId
            lens += r.coords.length.toLong
            dls += r.dl
            payload ++= r.coords
            noteDl(r.docId, r.dl)
          }
          PostingBlockRow(term, bucket, docIds(0), docIds.length, 0L,
            Varint.encode(docIds.toArray), Varint.encodeRaw(lens.toArray),
            Varint.encodeRaw(dls.toArray), payload.toArray, 0.0, 0L, 0L)
        } else {
          val docIds = new graft.core.LongVec(); docIds += head.docId
          val tfs = new graft.core.LongVec(); tfs += head.tf.toLong
          val pos = new graft.core.ByteVec(head.coords.length * 2)
          pos ++= head.coords
          var nPostings = head.tf.toLong
          var maxTf = head.tf.toLong
          var minDl = head.dl
          noteDl(head.docId, head.dl)
          while (docIds.length < maxBlockDocs &&
            buf.hasNext && buf.head.term == term && buf.head.bucket == bucket) {
            val r = buf.next()
            docIds += r.docId
            tfs += r.tf.toLong
            pos ++= r.coords
            nPostings += r.tf
            if (r.tf > maxTf) maxTf = r.tf
            if (r.dl < minDl) minDl = r.dl
            noteDl(r.docId, r.dl)
          }
          // maxTf/minDl give an avgdl-independent upper bound for block-max
          // WAND that stays valid when incremental appends drift avgdl
          PostingBlockRow(term, bucket, docIds(0), docIds.length, nPostings,
            Varint.encode(docIds.toArray), Varint.encodeRaw(tfs.toArray),
            Array.emptyByteArray, pos.toArray, 0.0, maxTf, minDl)
        }
      }
    }
    def strips: Iterator[PostingBlockRow] = {
      import scala.jdk.CollectionConverters._
      dlByBucket.entrySet().iterator().asScala.map { e =>
        val docIds = e.getValue.keySet().iterator().asScala.map(_.longValue).toArray
        val dls = e.getValue.values().iterator().asScala.map(_.longValue).toArray
        PostingBlockRow(DlStripTerm, e.getKey, docIds(0), docIds.length, 0L,
          Varint.encode(docIds), Array.emptyByteArray,
          Varint.encodeRaw(dls), Array.emptyByteArray, 0.0, 0L, 0L)
      }
    }
    main ++ strips
  }

  /** Persist the pagination knobs query-side snippet assembly must share
    * with the build (pagesOf is called on BOTH sides of the index). */
  def writeBuildProps(indexDir: String, cfg: BuildConfig): Unit =
    IndexStore.writeFileAtomic(indexDir, "buildcfg.properties",
      propsBytes(cfg.pageSize, cfg.formFeedPages))

  private def propsBytes(pageSize: Int, formFeed: Boolean): Array[Byte] = {
    val p = new java.util.Properties()
    p.setProperty("pageSize", pageSize.toString)
    p.setProperty("formFeedPages", formFeed.toString)
    val bos = new java.io.ByteArrayOutputStream()
    p.store(bos, "graft build pagination config")
    bos.toByteArray
  }

  private[graft] def analyzerBytes(an: Analyzer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(an)
    oos.close()
    bos.toByteArray
  }

  /** Version-pinned copies of the analyzer and pagination props
    * (`analyzer-v$N.bin` / `buildcfg-v$N.properties`), written at every
    * snapshot commit: a reader pinned to a snapshot must pair it with ITS
    * analyzer/pagination — a cfg-changed rebuild overwrites the
    * unversioned files, which would otherwise silently mismatch
    * time-traveled snapshots (and CURRENT, in the crash window between
    * the unversioned overwrite and the new manifest). The unversioned
    * files remain as the pre-versioning fallback. Expired by vacuum with
    * their manifest. */
  def writeVersionedArtifacts(indexDir: String, version: Int, an: Analyzer,
                              pageSize: Int, formFeed: Boolean): Unit = {
    IndexStore.writeFileAtomic(indexDir, s"analyzer-v$version.bin", analyzerBytes(an))
    IndexStore.writeFileAtomic(indexDir, s"buildcfg-v$version.properties",
      propsBytes(pageSize, formFeed))
  }

  private def readAnalyzerFile(f: java.nio.file.Path): Option[Analyzer] =
    if (!java.nio.file.Files.exists(f)) None
    else {
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(java.nio.file.Files.readAllBytes(f)))
      try Some(ois.readObject().asInstanceOf[Analyzer]) finally ois.close()
    }

  /** The analyzer persisted for a snapshot version (versioned file first,
    * unversioned fallback for pre-versioning indexes). */
  def readAnalyzer(indexDir: String, version: Option[Int]): Option[Analyzer] =
    version.flatMap(v =>
      readAnalyzerFile(java.nio.file.Paths.get(indexDir, s"analyzer-v$v.bin")))
      .orElse(readAnalyzerFile(java.nio.file.Paths.get(indexDir, "analyzer.bin")))

  /** (pageSize, formFeedPages) of an index; defaults for pre-props indexes. */
  def readBuildProps(indexDir: String): (Int, Boolean) =
    readBuildPropsOpt(indexDir, None).getOrElse((0, false))

  /** Version-aware pagination props (versioned file first, unversioned
    * fallback); None when neither exists. */
  def readBuildPropsOpt(indexDir: String, version: Option[Int]): Option[(Int, Boolean)] = {
    def load(f: java.nio.file.Path): Option[(Int, Boolean)] =
      if (!java.nio.file.Files.exists(f)) None
      else {
        val p = new java.util.Properties()
        val in = java.nio.file.Files.newInputStream(f)
        try p.load(in) finally in.close()
        Some((p.getProperty("pageSize", "0").toInt,
          p.getProperty("formFeedPages", "false").toBoolean))
      }
    version.flatMap(v =>
      load(java.nio.file.Paths.get(indexDir, s"buildcfg-v$v.properties")))
      .orElse(load(java.nio.file.Paths.get(indexDir, "buildcfg.properties")))
  }

  private def dirBytes(path: String): Long = {
    val d = new java.io.File(path)
    if (!d.exists()) 0L
    else {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(d)
    }
  }

  /** Decode one posting block into (docId, tf, coords) tuples. */
  def decodeBlock(b: PostingBlockRow): Iterator[(Long, Long, Array[Long])] = {
    val docR = new Varint.Reader(b.docDeltas)
    val tfR = new Varint.Reader(b.tfs)
    val posR = new Varint.Reader(b.posDeltas)
    (0 until b.nDocs).iterator.map { _ =>
      val d = docR.next()
      val tf = tfR.nextRaw()
      // per-doc coords: the delta chain restarts at 0 for each doc
      posR.rebase(0L)
      val coords = new Array[Long](tf.toInt)
      var i = 0
      while (i < tf) { coords(i) = posR.next(); i += 1 }
      (d, tf, coords)
    }
  }

  /** Decode (docId, tf, coords) like decodeBlock, but materialize coords
    * ONLY for docs the predicate admits — everyone else's position chain is
    * skipped byte-wise (no allocation, no delta accumulation). Used by the
    * query side after the presence prescreen rejects a doc for every query
    * in the batch. */
  def decodeBlockFor(b: PostingBlockRow, want: Long => Boolean): Iterator[(Long, Long, Array[Long])] = {
    val docR = new Varint.Reader(b.docDeltas)
    val tfR = new Varint.Reader(b.tfs)
    val posR = new Varint.Reader(b.posDeltas)
    (0 until b.nDocs).iterator.flatMap { _ =>
      val d = docR.next()
      val tf = tfR.nextRaw()
      if (want(d)) {
        posR.rebase(0L)
        val coords = new Array[Long](tf.toInt)
        var i = 0
        while (i < tf) { coords(i) = posR.next(); i += 1 }
        Some((d, tf, coords))
      } else { posR.skip(tf); None }
    }
  }

  /** Decode only (docId, tf) — scorers never touch position bytes. */
  def decodeDocTfs(b: PostingBlockRow): Iterator[(Long, Long)] = {
    val docR = new Varint.Reader(b.docDeltas)
    val tfR = new Varint.Reader(b.tfs)
    (0 until b.nDocs).iterator.map(_ => (docR.next(), tfR.nextRaw()))
  }

  /** Bulk-decode a block's (docId, tf) channels into `ds`/`tfs` starting at
    * `off`; returns the new offset. No per-posting boxing — the BM25
    * scorers stream millions of postings per task, and the tuple-iterator
    * form turned each into two heap allocations (visible as CPU-time
    * inflation under high parallelism: memory traffic, not arithmetic). */
  def decodeDocTfsInto(
      b: PostingBlockRow, ds: Array[Long], tfs: Array[Long], off: Int): Int = {
    val docR = new Varint.Reader(b.docDeltas)
    val tfR = new Varint.Reader(b.tfs)
    var i = off
    val end = off + b.nDocs
    while (i < end) { ds(i) = docR.next(); tfs(i) = tfR.nextRaw(); i += 1 }
    end
  }

  /** Bulk-decode variant over the column-pruned [[graft.spark.BmBlockRow]]. */
  def decodeDocTfsInto(
      b: BmBlockRow, ds: Array[Long], tfs: Array[Long], off: Int): Int = {
    val docR = new Varint.Reader(b.docDeltas)
    val tfR = new Varint.Reader(b.tfs)
    var i = off
    val end = off + b.nDocs
    while (i < end) { ds(i) = docR.next(); tfs(i) = tfR.nextRaw(); i += 1 }
    end
  }

  /** Dl-strip walk over the column-pruned [[graft.spark.BmBlockRow]]. */
  def foreachDlStrip(b: BmBlockRow)(f: (Long, Long) => Unit): Unit = {
    val docR = new Varint.Reader(b.docDeltas)
    val dlR = new Varint.Reader(b.dls)
    var i = 0
    while (i < b.nDocs) { f(docR.next(), dlR.nextRaw()); i += 1 }
  }

  /** Decode a dl-strip row into (docId, dl) pairs. */
  def decodeDlStrip(b: PostingBlockRow): Iterator[(Long, Long)] = {
    val docR = new Varint.Reader(b.docDeltas)
    val dlR = new Varint.Reader(b.dls)
    (0 until b.nDocs).iterator.map(_ => (docR.next(), dlR.nextRaw()))
  }

  /** Visit a block's docIds only — skips the tf channel entirely and
    * allocates nothing per posting. The presence prescreens of the query
    * paths only need membership, and Function1[Long, Unit] is @specialized,
    * so this is a zero-boxing walk. */
  def foreachDocId(b: PostingBlockRow)(f: Long => Unit): Unit = {
    val docR = new Varint.Reader(b.docDeltas)
    var i = 0
    while (i < b.nDocs) { f(docR.next()); i += 1 }
  }

  /** Visit a dl strip's (docId, dl) pairs without per-doc boxing
    * (Function2[Long, Long, Unit] is @specialized). */
  def foreachDlStrip(b: PostingBlockRow)(f: (Long, Long) => Unit): Unit = {
    val docR = new Varint.Reader(b.docDeltas)
    val dlR = new Varint.Reader(b.dls)
    var i = 0
    while (i < b.nDocs) { f(docR.next(), dlR.nextRaw()); i += 1 }
  }
}
