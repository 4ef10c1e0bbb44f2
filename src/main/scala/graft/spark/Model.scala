package graft.spark

/** Row types of the index tables (all Parquet, Iceberg-shaped commit via
  * IndexStore).
  */

/** Input contract per BASELINE.json input_hint. */
final case class PageRowIn(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Forward index (replaces the reference's zip text cache,
  * /root/reference/Docodo.NET/DataSources.cs:492-712): per-doc header block
  * and body text, keyed by docId for snippet retrieval. */
final case class DocTextRow(docId: Long, name: String, header: String, body: String)

/** Replaces the reference's IndexPageList (.index.list,
  * /root/reference/Docodo.NET/Build.cs:41-149): page ids + END coordinates
  * per doc, plus the BM25 document length. */
final case class DocMetaRow(
    docId: Long,
    name: String,
    pageIds: Seq[String],
    pageEnds: Seq[Long],
    docLen: Long)

/** Map-side combined posting: one row per (term, doc) — the shuffle unit.
  * coords are the within-doc coordinates, delta+varint encoded. */
final case class TermDocRow(
    term: String,
    bucket: Int,
    docId: Long,
    tf: Int,
    dl: Long,
    coords: Array[Byte])

/** Map-side posting RUN: one row per (term, bucket) per map-partition
  * bucket-visit/flush — the build's shuffle unit (never persisted). Same
  * channel layout as PostingBlockRow (delta docIds, raw-varint tfs — the
  * lens channel for meta runs —, dls for meta runs, concatenated per-doc
  * position payloads) but with an explicit lastDocId so the reduce-side
  * merge splices delta streams WITHOUT decoding them. Shuffling runs
  * instead of one row per (term, doc) cuts exchanged+sorted row counts by
  * the docs-per-(term,bucket) factor — the dominant build-shuffle cost. */
final case class TermRunRow(
    term: String,
    bucket: Int,
    firstDocId: Long,
    lastDocId: Long,
    nDocs: Int,
    nPostings: Long,
    maxTf: Long,
    minDl: Long,
    docDeltas: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte],
    payload: Array[Byte])

/** Posting block: one row per (term, docId-range bucket). Ascending docIds
  * delta+varint encoded; per-doc tf, dl raw-varint; concatenated per-doc
  * position deltas; per-block max normalized-tf for block-max WAND.
  * The delta+varint block layout realizes the reference's IndexSequence
  * storage idea (/root/reference/Docodo.NET/IndexSequence.cs:63-84) keyed
  * per document instead of a global coordinate space. */
final case class PostingBlockRow(
    term: String,
    bucket: Int,
    firstDocId: Long,
    nDocs: Int,
    nPostings: Long,
    docDeltas: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte],
    posDeltas: Array[Byte],
    maxTfNorm: Double,
    maxTf: Long,
    minDl: Long)

/** Column-pruned posting block for the BM25 batch scorer: positions
  * (`posDeltas`, the widest column of the postings table) and the WAND
  * metadata are never read — Parquet skips those pages entirely, which
  * roughly halves the batch scan's I/O and decode traffic. */
final case class BmBlockRow(
    term: String,
    firstDocId: Long,
    nDocs: Int,
    docDeltas: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte],
    maxTf: Long)

/** Term dictionary entry (df = doc freq, cf = collection freq). */
final case class TermStatRow(term: String, df: Long, cf: Long)

/** Per-doc query evaluation output (internal to SparkSearcher). Carries the
  * doc's meta (name, page table, BM25 length) decoded IN-PARTITION from the
  * doc shard's own MetaTerm blocks — the doc-shard invariant puts a doc's
  * meta in the same postings file as its term blocks, so the query path
  * needs no docmeta shuffle join. Meta fields are empty on rows emitted
  * only for leaf-count aggregation (empty coords). */
final case class EvalRow(
    docId: Long,
    coords: Array[Long],
    fieldHit: Boolean,
    leafCounts: Array[Long],
    codes: Array[String],
    tfs: Array[Long],
    name: String,
    pageIds: Seq[String],
    pageEnds: Seq[Long],
    docLen: Long)

/** One kept document from the distributed selection stage: the fields
  * `ResultAssembler.enrich` needs (docId, name, dl, scoring code→tf pairs)
  * plus the already-page-cap-cut page hit table. Coordinates and the raw
  * page table are consumed by the in-task `selectDocs*` pass and never
  * shipped to the driver. */
final case class SelDocRow(
    docId: Long,
    name: String,
    docLen: Long,
    codes: Seq[String],
    tfs: Seq[Long],
    pageIds: Seq[String],
    pagePos: Seq[Seq[Int]])

/** Per-query output of the distributed selection stage: global page count
  * (reference cap semantics), summed per-leaf word counts, and the kept
  * docs in selection order. The driver receives ≤ MaxFoundDocs docs per
  * query — never the eval stream. */
final case class SelOutRow(
    qi: Int,
    nPages: Int,
    wordCounts: Seq[Long],
    docs: Seq[SelDocRow])
