package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot compaction — the Iceberg `rewrite_data_files` analog for this
  * store. Streaming appends commit self-contained per-batch file sets
  * (postings/batch-K/…), which is exactly right for exactly-once ingest
  * but accumulates files: query parallelism is one task per postings file,
  * so thousands of small batch deltas eventually mean thousands of tiny
  * tasks and a bloated dictionary merge. `compact` rewrites the CURRENT
  * snapshot's tables into one consolidated build-layout file set and
  * commits it as the next snapshot version:
  *
  *   - postings: decode every block back to (term, doc) runs — per input
  *     task the meta blocks stream FIRST (they sort before real terms in
  *     every file), so per-doc lengths are known before any real block
  *     decodes and nothing buffers; then the SAME bucket shuffle +
  *     sort + streaming block encoder as the full build (one corpus-sized
  *     exchange, the compaction's entire cost);
  *   - doctext: rewritten range-partitioned by docId so snippet point
  *     lookups keep min/max pruning;
  *   - docmeta + termstats: re-derived from the new postings (term-pruned
  *     scan / tiny agg);
  *   - integrity: total postings and doc count are recomputed from the
  *     rewritten data and MUST equal the snapshot's — a rewrite that loses
  *     rows refuses to commit;
  *   - lineage: older snapshots stay readable (time travel) until `vacuum`;
  *     the streaming continuation marker (docId space, running sums) is
  *     re-pointed at the new version, so appends continue seamlessly.
  *
  * Single-writer, like build/append: don't run concurrently with either.
  */
object Compactor {

  final case class CompactStats(
      version: Int,
      nDocs: Long,
      totalPostings: Long,
      postingsFilesBefore: Int,
      postingsFilesAfter: Int)

  def compact(spark: SparkSession, indexDir: String): CompactStats = {
    import spark.implicits._
    // a compact right after a crashed append would otherwise re-point a
    // LAGGING marker (pre-batch state) onto the compacted base — whose
    // rewrite consolidates CURRENT, which already contains the batch: the
    // replay would then re-append it (double docs). Fast-forward first.
    IndexStore.repairStreamMarker(indexDir)
    val snap = IndexStore.readSnapshot(indexDir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $indexDir"))
    val version = snap.version + 1
    val tag = s"compact-v$version"
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    def abs(table: String): Seq[String] =
      snap.files.getOrElse(table, Nil).map(f => s"$indexDir/$f")
    require(abs("postings").nonEmpty, "snapshot lists no postings files")

    // ---- postings: decode → bucket shuffle → re-encode ----
    val blocks = spark.read.parquet(abs("postings"): _*).as[PostingBlockRow]
    val termDocs: Dataset[TermDocRow] = blocks.mapPartitions { it =>
      // a postings file is ONE parquet row group, so it is never split
      // across tasks; within each file meta blocks precede real-term
      // blocks (term sort order), so this map is complete before the
      // first real block of that file decodes. docIds are globally
      // unique, so merging several files into one task is fine.
      val dlByDoc = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      it.flatMap { b =>
        if (b.term == IndexBuilder.DlStripTerm) Iterator.empty // regenerated
        else if (b.term == IndexBuilder.MetaTerm)
          IndexBuilder.decodeMetaBlock(b).map { md =>
            dlByDoc.put(md.docId, md.docLen)
            TermDocRow(IndexBuilder.MetaTerm, b.bucket, md.docId, 0, md.docLen,
              IndexBuilder.encodeMetaPayload(md.name, md.pageIds.toArray, md.pageEnds.toArray))
          }
        else
          IndexBuilder.decodeBlock(b).map { case (d, tf, coords) =>
            val dl = dlByDoc.get(d)
            require(dl != null,
              s"compact: no document length for doc $d of term '${b.term}' — " +
                "meta block missing from its shard (corrupt index?)")
            TermDocRow(b.term, b.bucket, d, tf.toInt, dl, graft.core.Varint.encode(coords))
          }
      }
    }
    val postingsDir = s"$indexDir/postings/$tag"
    termDocs
      .repartition(shufflePartitions, $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"docId")
      .mapPartitions(IndexBuilder.encodeBlocks)
      .write.mode("overwrite")
      .options(IndexBuilder.postingsWriteOptions).parquet(postingsDir)
    IndexBuilder.verifySingleRowGroup(spark, postingsDir)

    // ---- integrity: the rewrite must carry exactly the snapshot's data.
    // One metrics scan serves BOTH the integrity totals and the per-file
    // lineage written at commit (docs = Σ meta-term nDocs, postings =
    // Σ nPostings — the same sums the dedicated aggregate computed, per
    // the shared encodeBlocks conventions: meta/dl-strip rows carry
    // nPostings = 0). ----
    val metrics = IndexBuilder.postingsFileMetrics(spark, postingsDir, s"postings/$tag")
    val nDocs = metrics.valuesIterator.map(_.docs).sum
    val totalPostings = metrics.valuesIterator.map(_.postings).sum
    require(nDocs == snap.nDocs,
      s"compact: doc count changed ($nDocs vs snapshot ${snap.nDocs}) — refusing to commit")
    require(totalPostings == snap.totalPostings,
      s"compact: posting count changed ($totalPostings vs snapshot ${snap.totalPostings}) — refusing to commit")

    // ---- docmeta from the new postings ----
    val docMetaDir = s"$indexDir/docmeta/$tag"
    spark.read.parquet(postingsDir).as[PostingBlockRow]
      .filter($"term" === IndexBuilder.MetaTerm)
      .flatMap(IndexBuilder.decodeMetaBlock)
      .write.mode("overwrite").parquet(docMetaDir)

    // ---- doctext rewritten docId-clustered ----
    val docTextDir = s"$indexDir/doctext/$tag"
    spark.read.parquet(abs("doctext"): _*)
      .repartitionByRange(shufflePartitions, $"docId")
      .sortWithinPartitions($"docId")
      .write.mode("overwrite").parquet(docTextDir)

    // ---- termstats re-aggregated (equals the incremental merge) ----
    val termStatsDir = s"termstats-v$version"
    spark.read.parquet(postingsDir)
      .filter($"term" =!= IndexBuilder.DlStripTerm && $"term" =!= IndexBuilder.MetaTerm)
      .groupBy($"term")
      .agg(sum($"nDocs").cast("long").as("df"), sum($"nPostings").as("cf"))
      .repartition(shufflePartitions, $"term").sortWithinPartitions($"term")
      .write.mode("overwrite").parquet(s"$indexDir/$termStatsDir")

    // ---- per-file lineage for the consolidated files (the integrity scan
    // above already computed it) ----
    IndexStore.writeLineage(indexDir, version, metrics)

    // version-pinned analyzer/pagination for the compacted snapshot: the
    // rewrite preserves the base version's tokenization, so its artifacts
    // carry over verbatim (readers pair any version with ITS copies)
    IndexBuilder.readAnalyzer(indexDir, Some(snap.version)).foreach { an =>
      val props = IndexBuilder.readBuildPropsOpt(indexDir, Some(snap.version))
        .getOrElse((0, false))
      IndexBuilder.writeVersionedArtifacts(indexDir, version, an, props._1, props._2)
    }

    // ---- commit ----
    // streaming continuation state rides INSIDE the manifest's stage
    // records too: the manifest is the authoritative commit point, so a
    // crash between writeSnapshot and the marker re-point below is
    // repaired by appendBatch's marker reconstruction (same contract as
    // the append path)
    val streamDetail: Option[Map[String, String]] =
      if (!java.nio.file.Files.exists(IndexStore.stageMarkerPath(indexDir, "stream"))) None
      else {
        def keep(k: String) = IndexStore.readStageDetail(indexDir, "stream", k)
        Some(Seq("lastBatchId", "nextDocId", "nDocs", "sumDl", "totalPostings")
          .flatMap(k => keep(k).map(k -> _)).toMap)
      }
    IndexStore.writeSnapshot(indexDir, IndexStore.Snapshot(
      version, snap.nDocs, snap.avgdl, snap.totalPostings,
      IndexStore.StageRecord("compact", s"of-v${snap.version}", nDocs, 0L, Map.empty) +:
        streamDetail.toSeq.map(d => IndexStore.StageRecord(
          "stream", d.get("lastBatchId").map(b => s"batch-$b").getOrElse("compact"),
          nDocs, 0L, d)),
      Map(
        "doctext" -> IndexStore.listTableFiles(indexDir, s"doctext/$tag"),
        "docmeta" -> IndexStore.listTableFiles(indexDir, s"docmeta/$tag"),
        "postings" -> IndexStore.listTableFiles(indexDir, s"postings/$tag"),
        "termstats" -> IndexStore.listTableFiles(indexDir, termStatsDir))))

    // streaming continuation: same docId space and running sums, new base
    // version — appends after a compact stand on the compacted snapshot
    streamDetail.foreach { d =>
      IndexStore.commitStage(indexDir, IndexStore.StageRecord(
        "stream", d.get("lastBatchId").map(b => s"batch-$b").getOrElse("compact"),
        nDocs, 0L, d + ("version" -> version.toString)))
    }
    // full-build stage markers describe pre-compact dirs; a later build
    // into this dir must not resume onto them
    Seq("doctext", "docmeta", "postings", "termstats").foreach(st =>
      java.nio.file.Files.deleteIfExists(IndexStore.stageMarkerPath(indexDir, st)))

    CompactStats(version, nDocs, totalPostings,
      snap.files.getOrElse("postings", Nil).size,
      IndexStore.listTableFiles(indexDir, s"postings/$tag").size)
  }
}
