package graft.streaming

import graft.core.{Consts, DocTokenizer, Varint}
import graft.spark._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental / streaming index ingestion.
  *
  * The reference is batch-only (SURVEY §2.9) — its closest notion is
  * re-running CreateAsync over new sources. Here new pages arrive as a
  * Structured Streaming source; every micro-batch appends a self-contained
  * index delta (the same doc-sharded posting-block layout) and commits a
  * new snapshot version:
  *
  *  - docIds continue from the snapshot's `nextDocId` (deterministic:
  *    url-sorted within the batch);
  *  - each batch writes to BATCH-SCOPED directories
  *    (`doctext/batch-<id>/`, `docmeta/batch-<id>/`,
  *    `postings/batch-<id>/`) in overwrite mode, so a replay after a
  *    mid-batch crash REPLACES the partial output instead of appending a
  *    second copy — exactly-once without a distributed transaction. The
  *    snapshot manifest only ever lists files of committed batches;
  *  - a batch's docs are fully contained in its own postings files, so the
  *    doc-sharded invariant (a doc's terms co-located in one file) holds
  *    and the query side needs no changes;
  *  - tokenization uses the analyzer PERSISTED with the index
  *    (analyzer.bin), never a config-derived one, so appended postings are
  *    term-code-compatible with the build; a first append to an empty dir
  *    persists the config-derived analyzer;
  *  - termstats is an INCREMENTAL merge: previous snapshot's termstats ∪
  *    this batch's delta, re-aggregated — O(vocab + batch), not O(index);
  *    totalPostings/nDocs/sumDl are running sums in the snapshot/marker;
  *  - exactly-once: the streaming checkpoint replays an uncommitted batch;
  *    appendBatch is keyed by batchId in the stream marker (skip if
  *    committed), and un-committed replays overwrite their own dirs.
  */
object StreamingIndexer {

  /** Append one batch of pages to an existing (or empty) index. Returns the
    * number of documents added. Also usable for non-streaming incremental
    * builds. */
  def appendBatch(spark: SparkSession, pages: DataFrame, indexDir: String,
                  cfg: IndexBuilder.BuildConfig, batchId: Long): Long = {
    import spark.implicits._

    // The snapshot manifest is the authoritative commit point: it is
    // written after every data write and BEFORE the stream marker, and it
    // embeds the full continuation state in its stream stage record. A
    // crash between the two leaves the manifest ahead of the marker (or
    // with no marker at all, for a first append) — repair the marker from
    // the newest manifest carrying stream state FIRST, so the replayed
    // batch dedups like any committed one: no double count, no recompute,
    // and a rebuild-crash that cleared the marker (build() deletes it
    // before committing the rebuild) reconstructs it from the streamed
    // CURRENT instead of re-deriving stale state.
    IndexStore.repairStreamMarker(indexDir)

    val committed = IndexStore.readStageDetail(indexDir, "stream", "lastBatchId").map(_.toLong)
    if (committed.exists(_ >= batchId)) return 0L // replayed batch: already in

    // continuation state: from the stream marker if present, else derived
    // from an existing full-build snapshot (appending to a batch-built
    // index must continue its docId space, not restart at 0). build()
    // clears the stream marker on a full rebuild, so a stale marker can
    // never leak pre-rebuild counts into the new lineage.
    //
    // The base snapshot is the one the marker COMMITTED, not CURRENT: a
    // crash between writeSnapshot and commitStage leaves CURRENT pointing
    // at the crashed attempt's snapshot, whose file list and termstats
    // already contain this batch — basing the replay on it would
    // double-list the batch dir and double-merge its term counts.
    val baseSnap = IndexStore.readStageDetail(indexDir, "stream", "version") match {
      case Some(v) =>
        // a missing pinned manifest must FAIL, not silently base on nothing:
        // the marker still carries cumulative nextDocId/nDocs/sums, so a
        // None base here would commit a manifest listing ONLY this batch's
        // files while reporting cumulative totals — an index silently
        // truncated to one batch. (vacuum retains the pinned version, so
        // this only fires on manual deletion/corruption.)
        Some(IndexStore.readSnapshot(indexDir, Some(v.toInt)).getOrElse(
          throw new IllegalStateException(
            s"stream marker pins base snapshot v$v but its manifest is gone — " +
              "refusing to append on a truncated base (restore the manifest or rebuild)")))
      case None =>
        // No marker yet (first append after a build, or after build() cleared
        // it). CURRENT may be a crashed FIRST-append attempt's own snapshot —
        // one that writeSnapshot committed but whose commitStage never ran.
        // Basing the replay on it would double-merge the batch's termstats,
        // double-count its docs, and shift its docIds. The base is the
        // newest snapshot that is NOT itself a stream append.
        val vs = IndexStore.listVersions(indexDir)
        vs.reverse.find(v => !IndexStore.manifestHasStage(indexDir, v, "stream")) match {
          case Some(v) => IndexStore.readSnapshot(indexDir, Some(v))
          case None if vs.nonEmpty && vs.min > 1 =>
            // every surviving manifest is a markerless append attempt and
            // the pre-append versions were expired: the base state is gone
            throw new IllegalStateException(
              "no non-stream base snapshot survives (vacuumed during a crashed " +
                "first append?) — refusing to append on a truncated base")
          case None => None // fresh dir, or a crashed first batch of a from-empty stream
        }
    }
    val streamMarker = IndexStore.readStageDetail(indexDir, "stream", "nextDocId")
    val nextDocId = streamMarker.map(_.toLong).getOrElse {
      // derive from the base snapshot's OWN docmeta files (the raw
      // directory may hold older lineages' versioned build dirs too)
      baseSnap.map(_.files.getOrElse("docmeta", Nil)) match {
        case Some(fs) if fs.nonEmpty =>
          spark.read.parquet(fs.map(f => s"$indexDir/$f"): _*)
            .agg(coalesce(max($"docId"), lit(-1L))).head().getLong(0) + 1
        case _ => 0L
      }
    }
    val prevDocs = IndexStore.readStageDetail(indexDir, "stream", "nDocs").map(_.toLong)
      .orElse(baseSnap.map(_.nDocs)).getOrElse(0L)
    val prevDl = IndexStore.readStageDetail(indexDir, "stream", "sumDl").map(_.toLong)
      .orElse(baseSnap.map(s => math.round(s.avgdl * s.nDocs))).getOrElse(0L)
    val prevPostings = IndexStore.readStageDetail(indexDir, "stream", "totalPostings").map(_.toLong)
      .orElse(baseSnap.map(_.totalPostings)).getOrElse(0L)

    // the analyzer persisted at build/first-append time wins: appending
    // with a different tokenizer config would silently mix incompatible
    // term codes (stems, vocab groups, stopword sets). Resolved for the
    // BASE version (versioned copy first) so appends stay code-compatible
    // with the lineage they extend even if a parallel dir once held a
    // different config.
    val anFile = java.nio.file.Paths.get(indexDir, "analyzer.bin")
    val an: graft.text.Analyzer =
      IndexBuilder.readAnalyzer(indexDir, baseSnap.map(_.version))
        .getOrElse(IndexBuilder.analyzerFor(cfg))

    val src = cfg.sourceName
    val inc = cfg.includeHeaders
    // pagination props persisted with the index win over the caller's cfg —
    // the same rule as the analyzer: the query side re-derives page text
    // from the PERSISTED (pageSize, formFeedPages), so appended docs must
    // paginate exactly like built docs or snippets for page ids >= 2 read
    // from the wrong offsets (e.g. `Main append` passes a default config
    // to an index built with --page-size 3000).
    val (psz, ffp) =
      IndexBuilder.readBuildPropsOpt(indexDir, baseSnap.map(_.version))
        .getOrElse((cfg.pageSize, cfg.formFeedPages))
    val bits = cfg.bucketBits

    val batchTag = s"batch-$batchId"
    val docTextDir = s"$indexDir/doctext/$batchTag"
    val docMetaDir = s"$indexDir/docmeta/$batchTag"
    val postingsDir = s"$indexDir/postings/$batchTag"

    val docText: Dataset[DocTextRow] =
      IndexBuilder.extractDocText(spark, pages, src, inc, nextDocId)
    // overwrite = idempotent under checkpoint replay (partial output of a
    // crashed attempt is replaced, never double-counted)
    docText.write.mode("overwrite").parquet(docTextDir)

    // read back just this batch's docs (its own directory) for the passes
    val batchText = spark.read.parquet(docTextDir).as[DocTextRow]

    // ONE tokenize pass (same fusion as the full build): postings + meta
    // rows together; docmeta is derived from the meta blocks afterwards.
    val bc = spark.sparkContext.broadcast(an)
    val termDocs: Dataset[TermDocRow] = batchText.mapPartitions { it =>
      val a = bc.value
      val cache = new DocTokenizer.CodeCache(a)
      it.flatMap { d =>
        val di = DocTokenizer.indexGrouped(a, d.header, IndexBuilder.pagesOf(d.body, psz, ffp), cache)
        val byTerm = new java.util.HashMap[String, graft.core.LongVec]()
        var i = 0
        while (i < di.terms.length) {
          var v = byTerm.get(di.terms(i))
          if (v == null) { v = new graft.core.LongVec(8); byTerm.put(di.terms(i), v) }
          v += di.coords(i)
          i += 1
        }
        val bucket = (d.docId >> bits).toInt
        import scala.jdk.CollectionConverters._
        Iterator.single(TermDocRow(IndexBuilder.MetaTerm, bucket, d.docId, 0, di.docLen,
          IndexBuilder.encodeMetaPayload(d.name, di.pageIds, di.pageEnds))) ++
          byTerm.entrySet().iterator().asScala.map { e =>
            val arr = e.getValue.toArray
            TermDocRow(e.getKey, bucket, d.docId, arr.length, di.docLen, Varint.encode(arr))
          }
      }
    }
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val blocks = termDocs
      .repartition(shufflePartitions, $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"docId")
      .mapPartitions(IndexBuilder.encodeBlocks)
    blocks.write.mode("overwrite")
      .options(IndexBuilder.postingsWriteOptions).parquet(postingsDir)
    IndexBuilder.verifySingleRowGroup(spark, postingsDir)

    // ONE metrics scan of the batch postings serves both the lineage entry
    // and the posting-count running sum (a dedicated sum(nPostings) job
    // over the same files would read them a second time)
    val batchMetrics =
      IndexBuilder.postingsFileMetrics(spark, postingsDir, s"postings/$batchTag")

    val docMeta = spark.read.parquet(postingsDir).as[PostingBlockRow]
      .filter($"term" === IndexBuilder.MetaTerm)
      .flatMap(IndexBuilder.decodeMetaBlock)
    docMeta.write.mode("overwrite").parquet(docMetaDir)
    val agg = spark.read.parquet(docMetaDir)
      .agg(count(lit(1)), coalesce(sum($"docLen"), lit(0L)), coalesce(max($"docId"), lit(nextDocId - 1)))
      .head()
    val batchDocs = agg.getLong(0)
    val batchDl = agg.getLong(1)
    val maxDocId = agg.getLong(2)

    val nDocs = prevDocs + batchDocs
    val sumDl = prevDl + batchDl
    val avgdl = if (nDocs == 0) 1.0 else sumDl.toDouble / nDocs

    // term dictionary: INCREMENTAL merge of the previous snapshot's
    // termstats with this batch's delta (O(vocab + batch) — never re-reads
    // the whole postings table), written to a NEW versioned dir so pinned
    // snapshots stay readable. Range-partitioned by term: no single-task
    // write, files stay term-sorted for pruning.
    val version = IndexStore.currentVersion(indexDir).getOrElse(0) + 1
    val termStatsDir = s"termstats-v$version"
    val batchDelta = spark.read.parquet(postingsDir)
      .filter($"term" =!= IndexBuilder.DlStripTerm && $"term" =!= IndexBuilder.MetaTerm)
      .groupBy($"term")
      .agg(sum($"nDocs").cast("long").as("df"), sum($"nPostings").as("cf"))
    val prevFiles = baseSnap.toSeq.flatMap(_.files.getOrElse("termstats", Nil))
      .map(f => s"$indexDir/$f")
    val mergedStats =
      if (prevFiles.isEmpty) batchDelta
      else spark.read.parquet(prevFiles: _*).select($"term", $"df", $"cf")
        .unionByName(batchDelta)
        .groupBy($"term").agg(sum($"df").as("df"), sum($"cf").as("cf"))
    mergedStats
      .repartition(shufflePartitions, $"term").sortWithinPartitions($"term")
      .write.mode("overwrite").parquet(s"$indexDir/$termStatsDir")

    val batchPostings = batchMetrics.valuesIterator.map(_.postings).sum
    val totalPostings = prevPostings + batchPostings

    if (!java.nio.file.Files.exists(anFile)) {
      // atomic, like every other commit artifact: a truncated analyzer.bin
      // from a mid-write crash would crash-loop every replay at readObject
      IndexStore.writeFileAtomic(indexDir, "analyzer.bin", IndexBuilder.analyzerBytes(an))
    }
    // pagination props must persist with the index: the query side's
    // snippet assembly re-derives pages from (pageSize, formFeedPages),
    // and a purely stream-ingested index would otherwise fall back to
    // (0, false) and find no text for page ids >= 2.
    if (!java.nio.file.Files.exists(
      java.nio.file.Paths.get(indexDir, "buildcfg.properties")))
      IndexBuilder.writeBuildProps(indexDir, cfg)
    // version-pinned copies for THIS snapshot (the effective analyzer and
    // pagination, which appends inherit from their base) — time-traveled
    // readers pair a version with ITS artifacts across later rebuilds
    IndexBuilder.writeVersionedArtifacts(indexDir, version, an, psz, ffp)

    // manifest adopts ONLY the previous snapshot's files + this batch's
    // own directories — an orphaned directory from an abandoned attempt is
    // never picked up by listing the parent.
    def tableFiles(table: String): Seq[String] =
      baseSnap.toSeq.flatMap(_.files.getOrElse(table, Nil))
        .filterNot(_.startsWith(s"$table/$batchTag/")) ++
        IndexStore.listTableFiles(indexDir, s"$table/$batchTag")

    // per-file lineage for THIS version: the previous version's entries for
    // every retained postings file + this batch's own files — appended
    // snapshots carry complete lineage, not just full builds (metrics for
    // adopted files would otherwise be lost once their build version is
    // vacuumed).
    locally {
      val postingsFiles = tableFiles("postings").toSet
      val prevLineage = baseSnap.map(s => IndexStore.readLineage(indexDir, s.version))
        .getOrElse(Map.empty)
      IndexStore.writeLineage(indexDir, version,
        prevLineage.filter { case (f, _) => postingsFiles.contains(f) } ++ batchMetrics)
    }

    // snapshot first, stream marker last: a crash between them replays the
    // batch, whose overwrites + re-commit are idempotent (same files, same
    // running sums derived from the same pre-batch marker state).
    // the stage record embeds the FULL continuation state: the manifest is
    // thereby the commit point, and the marker below is reconstructible
    // from it (see the repair block at the top of this method)
    IndexStore.writeSnapshot(indexDir, IndexStore.Snapshot(
      version, nDocs, avgdl, totalPostings,
      Seq(IndexStore.StageRecord("stream", s"batch-$batchId", batchDocs, 0L,
        Map("lastBatchId" -> batchId.toString,
          "nextDocId" -> (maxDocId + 1).toString,
          "nDocs" -> nDocs.toString,
          "sumDl" -> sumDl.toString,
          "totalPostings" -> totalPostings.toString))),
      Map(
        "doctext" -> tableFiles("doctext"),
        "docmeta" -> tableFiles("docmeta"),
        "postings" -> tableFiles("postings"),
        "termstats" -> IndexStore.listTableFiles(indexDir, termStatsDir))))
    IndexStore.commitStage(indexDir, IndexStore.StageRecord(
      "stream", s"batch-$batchId", batchDocs, 0L,
      Map("lastBatchId" -> batchId.toString,
        "version" -> version.toString, // the snapshot this commit stands on
        "nextDocId" -> (maxDocId + 1).toString,
        "nDocs" -> nDocs.toString,
        "sumDl" -> sumDl.toString,
        "totalPostings" -> totalPostings.toString)))
    batchDocs
  }

  /** Structured Streaming ingestion: pages stream → foreachBatch appends.
    * Watermark-free (append-only corpus); the checkpoint gives exactly-once
    * with appendBatch's batchId dedup.
    *
    * `compactEvery` > 0 runs a snapshot compaction after every N committed
    * batches (Iceberg-maintenance-style), so continuous ingest keeps a
    * BOUNDED postings file count instead of one file set per batch
    * forever. Compaction is idempotent w.r.t. query results (Compactor's
    * integrity gate) and re-points the streaming marker; a crash between
    * append and compact is recovered on the checkpoint replay of that
    * boundary batch (the append dedupes, the compaction re-runs). */
  def ingest(pagesStream: DataFrame, indexDir: String,
             cfg: IndexBuilder.BuildConfig, checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow(),
             compactEvery: Int = 0): StreamingQuery = {
    pagesStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val n = appendBatch(batch.sparkSession, batch.toDF(), indexDir, cfg, batchId)
        System.err.println(s"[graft-stream] batch $batchId appended $n docs")
        // compaction triggers on the BOUNDARY, not on n > 0: a replayed
        // boundary batch returns 0 (already committed) and that is exactly
        // the crash-between-append-and-compact case the comment below
        // promises to recover — gating on n > 0 deferred it a full cycle.
        // The snapshot guard covers the empty-first-batch edge (nothing to
        // compact yet).
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0 &&
          IndexStore.readSnapshot(indexDir)
            .exists(_.files.getOrElse("postings", Nil).nonEmpty)) {
          val st = graft.spark.Compactor.compact(batch.sparkSession, indexDir)
          System.err.println(s"[graft-stream] compacted v${st.version}: " +
            s"postings files ${st.postingsFilesBefore}→${st.postingsFilesAfter}")
        }
        ()
      }
      .start()
  }
}
