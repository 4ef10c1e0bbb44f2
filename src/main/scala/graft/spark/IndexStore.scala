package graft.spark

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped commit layer over Parquet (SURVEY §4.4): versioned JSON
  * snapshot manifests listing table locations + per-partition lineage and
  * posting-count/bytes metrics, committed by atomic rename. Readers pin a
  * snapshot; a re-run diffs the input signature per stage and skips stages
  * that already committed (resumable builds per the north rule). The trait
  * boundary is swappable for a real Iceberg catalog outside the sandbox.
  */
object IndexStore {

  /** Drain a directory listing with the stream CLOSED: `Files.list` holds
    * an open directory handle until closed, leaking one descriptor per
    * call in a long-lived driver process (e.g. periodic vacuum). */
  private def listDir(d: Path): Seq[Path] = {
    val s = Files.list(d)
    try s.iterator().asScala.toSeq finally s.close()
  }

  final case class StageRecord(
      stage: String,
      inputSignature: String,
      rows: Long,
      bytes: Long,
      detail: Map[String, String])

  /** Per-partition (= per posting shard file) build metrics: the north
    * rule's "per-partition lineage + posting-count/bytes metrics". */
  final case class FileMetrics(blocks: Long, postings: Long, docs: Long, bytes: Long)

  /** One INPUT partition's contribution to a build: its docId range plus
    * posting/doc counts — the input side of the north rule's per-partition
    * lineage. Input partitions and posting shards are both docId ranges
    * (docIds assign on a range exchange; bucket = docId >> bucketBits), so
    * "which doctext partitions fed which posting shard" is an exact range
    * intersection between this record and a file's block ranges — and the
    * lineage file stays O(partitions + files) at any corpus size. */
  final case class PartitionProvenance(
      firstDocId: Long, lastDocId: Long, postings: Long, docs: Long)

  /** Write the per-file lineage for a snapshot version (atomic rename,
    * like the manifest). One JSON entry per postings file; expired by
    * `vacuum` together with the version's manifest. When the build's
    * map-side provenance is available (full builds; not resumes /
    * streaming appends), a reserved `_inputPartitions` section records
    * each INPUT partition's docId range and counts. */
  def writeLineage(indexDir: String, version: Int,
                   metrics: Map[String, FileMetrics],
                   inputs: Map[Int, PartitionProvenance] = Map.empty): Unit = {
    val dir = Paths.get(indexDir)
    Files.createDirectories(dir)
    val fileBody = metrics.toSeq.sortBy(_._1).map { case (f, m) =>
      s"  ${q(f)}: {\"blocks\": ${m.blocks}, \"postings\": ${m.postings}, \"docs\": ${m.docs}, \"bytes\": ${m.bytes}}"
    }
    val inputBody =
      if (inputs.isEmpty) Nil
      else Seq("  \"_inputPartitions\": {\n" +
        inputs.toSeq.sortBy(_._1).map { case (pid, p) =>
          s"""    "$pid": {"firstDocId": ${p.firstDocId}, "lastDocId": ${p.lastDocId}, "inPostings": ${p.postings}, "inDocs": ${p.docs}}"""
        }.mkString(",\n") + "\n  }")
    val body = (fileBody ++ inputBody).mkString("{\n", ",\n", "\n}\n")
    val tmp = dir.resolve(s".lineage-v$version.json.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"lineage-v$version.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read a version's per-file lineage metrics (empty if absent). */
  def readLineage(indexDir: String, version: Int): Map[String, FileMetrics] = {
    val p = Paths.get(indexDir, s"lineage-v$version.json")
    if (!Files.exists(p)) return Map.empty
    val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    val entry = java.util.regex.Pattern.compile(
      "\"([^\"]+)\"\\s*:\\s*\\{\"blocks\": (\\d+), \"postings\": (\\d+), \"docs\": (\\d+), \"bytes\": (-?\\d+)\\}")
    val m = entry.matcher(txt)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, FileMetrics]
    while (m.find())
      out(m.group(1)) = FileMetrics(
        m.group(2).toLong, m.group(3).toLong, m.group(4).toLong, m.group(5).toLong)
    out.toMap
  }

  /** Read a version's input-partition provenance (empty if the lineage
    * predates it or the build was resumed/appended). */
  def readLineageInputs(indexDir: String, version: Int): Map[Int, PartitionProvenance] = {
    val p = Paths.get(indexDir, s"lineage-v$version.json")
    if (!Files.exists(p)) return Map.empty
    val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    val entry = java.util.regex.Pattern.compile(
      "\"(\\d+)\"\\s*:\\s*\\{\"firstDocId\": (-?\\d+), \"lastDocId\": (-?\\d+), \"inPostings\": (\\d+), \"inDocs\": (\\d+)\\}")
    val m = entry.matcher(txt)
    val out = scala.collection.mutable.LinkedHashMap.empty[Int, PartitionProvenance]
    while (m.find())
      out(m.group(1).toInt) = PartitionProvenance(
        m.group(2).toLong, m.group(3).toLong, m.group(4).toLong, m.group(5).toLong)
    out.toMap
  }

  final case class Snapshot(
      version: Int,
      nDocs: Long,
      avgdl: Double,
      totalPostings: Long,
      stages: Seq[StageRecord],
      files: Map[String, Seq[String]] = Map.empty)

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def stageJson(r: StageRecord): String = {
    val detail = r.detail.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    s"""{"stage": ${q(r.stage)}, "inputSignature": ${q(r.inputSignature)}, "rows": ${r.rows}, "bytes": ${r.bytes}, "detail": $detail}"""
  }

  def writeSnapshot(indexDir: String, snap: Snapshot): Unit = {
    val dir = Paths.get(indexDir)
    Files.createDirectories(dir)
    val filesJson = snap.files.toSeq.sortBy(_._1).map { case (t, fs) =>
      s"${q(t)}: [${fs.sorted.map(q).mkString(", ")}]"
    }.mkString("{", ",\n    ", "}")
    val json =
      s"""{
  "version": ${snap.version},
  "nDocs": ${snap.nDocs},
  "avgdl": ${snap.avgdl},
  "totalPostings": ${snap.totalPostings},
  "files": $filesJson,
  "stages": [${snap.stages.map(stageJson).mkString(",\n    ")}]
}"""
    val tmp = dir.resolve(s"manifest-v${snap.version}.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"manifest-v${snap.version}.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val cur = dir.resolve("CURRENT.tmp")
    Files.write(cur, snap.version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(cur, dir.resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Atomic small-file write (tmp + ATOMIC_MOVE) — the same pattern as
    * manifests/markers, for commit-adjacent artifacts (analyzer.bin,
    * buildcfg.properties): a crash mid-write must never leave a truncated
    * file that wedges every subsequent open/replay. */
  def writeFileAtomic(indexDir: String, name: String, bytes: Array[Byte]): Unit = {
    val dir = Paths.get(indexDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$name.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, dir.resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Does version v's manifest record a stage with this name? Stage records
    * are not round-tripped by [[readSnapshot]]; this scans the raw manifest
    * text. `appendBatch` uses it to recognize a crashed append attempt's
    * own half-committed snapshot when no stream marker exists yet. */
  def manifestHasStage(indexDir: String, version: Int, stage: String): Boolean = {
    val mf = Paths.get(indexDir, s"manifest-v$version.json")
    Files.exists(mf) &&
      new String(Files.readAllBytes(mf), StandardCharsets.UTF_8)
        .contains("\"stage\": " + q(stage))
  }

  /** Read one scalar (top-level field or stage-detail key) straight from a
    * version's raw manifest text — stage records are not round-tripped by
    * [[readSnapshot]]. Used to reconstruct the streaming continuation
    * marker: `writeSnapshot` runs after every data write and BEFORE
    * `commitStage`, so the manifest is the authoritative commit point and
    * the marker is a reconstructible cache of its newest stream state. */
  def manifestDetail(indexDir: String, version: Int, key: String): Option[String] = {
    val mf = Paths.get(indexDir, s"manifest-v$version.json")
    if (!Files.exists(mf)) None
    else field(new String(Files.readAllBytes(mf), StandardCharsets.UTF_8), key)
  }

  /** Fast-forward the stream marker from the newest manifest that embeds
    * stream state: `writeSnapshot` precedes `commitStage`, so after a
    * crash the manifest can be ahead of the marker (or exist with no
    * marker at all — a crashed first append, or a rebuild that cleared
    * the marker and then crashed before committing). Idempotent; no-op
    * when the marker is already current. MUST run before anything reads
    * the marker for continuation state (appendBatch, compact): acting on
    * a lagging marker re-derives pre-batch state against a post-batch
    * snapshot — the double-append hole. */
  def repairStreamMarker(indexDir: String): Unit = {
    val markerV = readStageDetail(indexDir, "stream", "version").map(_.toInt)
    // Walk newest-first. A FULL-BUILD manifest ends the stream lineage: a
    // rebuild deliberately clears the marker (new lineage), so stream
    // state from older, pre-rebuild manifests must NOT resurrect — only a
    // stream-stage manifest NEWER than every build manifest is live.
    listVersions(indexDir).reverse.iterator
      .map(v => (v,
        manifestDetail(indexDir, v, "lastBatchId"),
        manifestHasStage(indexDir, v, "doctext"))) // builds record table stages
      .find { case (_, batch, isBuild) => batch.nonEmpty || isBuild }
      .foreach {
        case (v, Some(batch), _) if markerV.forall(_ < v) =>
          val keys = Seq("lastBatchId", "nextDocId", "nDocs", "sumDl", "totalPostings")
          val detail = keys.flatMap(k => manifestDetail(indexDir, v, k).map(k -> _)).toMap
          if (detail.size == keys.size)
            commitStage(indexDir, StageRecord(
              "stream", s"batch-$batch", 0L, 0L,
              detail + ("version" -> v.toString)))
        case _ => () // newest lineage event is a build, or marker already current
      }
  }

  def currentVersion(indexDir: String): Option[Int] = {
    val p = Paths.get(indexDir, "CURRENT")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  private def field(json: String, name: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(name) + "\"\\s*:\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|[-0-9.eE+]+)")
      .matcher(json)
    if (m.find()) {
      val v = m.group(1)
      Some(if (v.startsWith("\"")) unescape(v.substring(1, v.length - 1)) else v)
    } else None
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def readSnapshot(indexDir: String): Option[Snapshot] =
    readSnapshot(indexDir, None)

  /** Read a pinned snapshot version (Iceberg-style time travel); None =
    * CURRENT. */
  def readSnapshot(indexDir: String, version: Option[Int]): Option[Snapshot] = {
    val vOpt = version.orElse(currentVersion(indexDir))
    if (vOpt.isEmpty) return None
    val v = vOpt.get
    val mf = Paths.get(indexDir, s"manifest-v$v.json")
    if (!Files.exists(mf)) return None
    Some {
    val json = new String(Files.readAllBytes(mf), StandardCharsets.UTF_8)
    // stage records are informational in the snapshot; resume reads the
    // per-stage markers, so we don't round-trip them here.
    val stages = Nil
    // parse the files map: "table": ["f1", "f2", ...]
    val files = {
      val m = java.util.regex.Pattern
        .compile("\"(doctext|docmeta|postings|termstats)\"\\s*:\\s*\\[([^\\]]*)\\]")
        .matcher(json)
      val out = Map.newBuilder[String, Seq[String]]
      while (m.find()) {
        val fs = m.group(2).split(",").map(_.trim).filter(_.length > 1)
          .map(x => unescape(x.substring(1, x.length - 1))).toSeq
        out += (m.group(1) -> fs)
      }
      out.result()
    }
    Snapshot(v,
      field(json, "nDocs").map(_.toLong).getOrElse(0L),
      field(json, "avgdl").map(_.toDouble).getOrElse(1.0),
      field(json, "totalPostings").map(_.toLong).getOrElse(0L),
      stages, files)
    }
  }

  /** parquet files of a table directory, as indexDir-relative paths. */
  def listTableFiles(indexDir: String, tableDir: String): Seq[String] = {
    val d = Paths.get(indexDir, tableDir)
    if (!Files.exists(d)) Nil
    else listDir(d).map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).map(n => s"$tableDir/$n").sorted
  }

  // ---- per-stage completion markers for resumable builds ----

  def stageMarkerPath(indexDir: String, stage: String): Path =
    Paths.get(indexDir, s"_stage_$stage.json")

  def stageDone(indexDir: String, stage: String, inputSignature: String): Boolean = {
    val p = stageMarkerPath(indexDir, stage)
    Files.exists(p) && {
      val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      field(json, "inputSignature").contains(inputSignature)
    }
  }

  def readStageDetail(indexDir: String, stage: String, key: String): Option[String] = {
    val p = stageMarkerPath(indexDir, stage)
    if (!Files.exists(p)) None
    else field(new String(Files.readAllBytes(p), StandardCharsets.UTF_8), key)
  }

  def commitStage(indexDir: String, rec: StageRecord): Unit = {
    Files.createDirectories(Paths.get(indexDir))
    val tmp = Paths.get(indexDir, s"_stage_${rec.stage}.json.tmp")
    Files.write(tmp, stageJson(rec).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, stageMarkerPath(indexDir, rec.stage),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def listManifests(indexDir: String): Seq[String] = {
    val d = Paths.get(indexDir)
    if (!Files.exists(d)) Nil
    else listDir(d).map(_.getFileName.toString)
      .filter(_.startsWith("manifest-")).sorted
  }

  private val ManifestRe = "manifest-v(\\d+)\\.json".r

  def listVersions(indexDir: String): Seq[Int] =
    listManifests(indexDir)
      .flatMap(n => ManifestRe.findFirstMatchIn(n).map(_.group(1).toInt)).sorted

  /** Iceberg-style snapshot expiry: keep the newest `keep` manifests,
    * delete every table file no kept manifest references (including
    * orphans from crashed attempts), drop the expired manifests, and clear
    * build-stage markers whose directories lost files (so a stale resume
    * can never point at vacuumed data). Single-writer assumption: do not
    * run concurrently with a build or append. Returns
    * (expiredVersions, deletedFiles). */
  def vacuum(indexDir: String, keep: Int = 2): (Int, Int) = {
    val versions = listVersions(indexDir)
    if (versions.isEmpty) return (0, 0)
    // never expire the version the stream marker stands on: a crash between
    // an append's writeSnapshot and its commitStage leaves the marker one
    // version BEHIND CURRENT, and the checkpoint replay must still be able
    // to read that base snapshot (and its termstats files) — expiring it
    // would make the next append silently truncate the index to one batch
    val pinned = readStageDetail(indexDir, "stream", "version")
      .map(_.toInt).filter(versions.contains)
    val keepV = (versions.takeRight(math.max(1, keep)) ++ pinned).toSet
    val referenced: Set[String] = keepV.flatMap(v =>
      readSnapshot(indexDir, Some(v)).toSeq.flatMap(_.files.values.flatten))
    val root = Paths.get(indexDir)
    val tableRoots = listDir(root).iterator
      .filter(p => Files.isDirectory(p))
      .filter { p =>
        val n = p.getFileName.toString
        n == "doctext" || n == "docmeta" || n == "postings" || n.startsWith("termstats")
      }.toSeq
    var deleted = 0
    def walk(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        listDir(p).foreach(walk)
        // drop now-empty directories (but keep the table roots themselves)
        if (!tableRoots.contains(p) && listDir(p).isEmpty)
          Files.delete(p)
      } else {
        val rel = root.relativize(p).toString
        val isData = rel.endsWith(".parquet") || p.getFileName.toString.startsWith("_SUCCESS") ||
          p.getFileName.toString.startsWith(".")
        if (isData && !referenced.contains(rel)) { Files.delete(p); deleted += 1 }
      }
    }
    tableRoots.foreach(walk)
    // expire old manifests (+ their version-pinned analyzer/pagination
    // copies — every retained version carries its own)
    val expired = versions.filterNot(keepV)
    expired.foreach { v =>
      Files.deleteIfExists(root.resolve(s"manifest-v$v.json"))
      Files.deleteIfExists(root.resolve(s"analyzer-v$v.bin"))
      Files.deleteIfExists(root.resolve(s"buildcfg-v$v.properties"))
      // a lineage file outlives its manifest while its described postings
      // files are still referenced by a LIVE snapshot: incremental/
      // streaming versions adopt an older build's files and write no
      // lineage of their own, so deleting v's lineage with v's manifest
      // would silently discard the per-file build metrics of data that is
      // still serving queries
      val lin = readLineage(indexDir, v)
      if (lin.isEmpty || !lin.keys.exists(referenced.contains))
        Files.deleteIfExists(root.resolve(s"lineage-v$v.json"))
    }
    // sweep lineage files retained past their manifest's expiry by the rule
    // above (their version no longer appears in listVersions, so the loop
    // never revisits them): once no live snapshot references their files —
    // e.g. after a compaction rewrote the postings — they are orphans
    val LineageRe = "lineage-v(\\d+)\\.json".r
    val manifestV = versions.toSet
    listDir(root).iterator
      .map(_.getFileName.toString)
      .flatMap(n => LineageRe.findFirstMatchIn(n).map(_.group(1).toInt))
      .filterNot(manifestV.contains)
      .foreach { v =>
        val lin = readLineage(indexDir, v)
        if (lin.isEmpty || !lin.keys.exists(referenced.contains))
          Files.deleteIfExists(root.resolve(s"lineage-v$v.json"))
      }
    // stage markers pointing at vacuumed dirs must not drive a resume
    Seq("doctext", "docmeta", "postings", "termstats").foreach { st =>
      readStageDetail(indexDir, st, "dir").foreach { d =>
        val dir = root.resolve(d)
        val alive = Files.exists(dir) &&
          listDir(dir).exists(_.getFileName.toString.endsWith(".parquet"))
        if (!alive) Files.deleteIfExists(stageMarkerPath(indexDir, st))
      }
    }
    (expired.size, deleted)
  }
}
