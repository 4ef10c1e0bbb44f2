package graft.spark

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

/** Executor-resident, version-pinned cache of decoded per-shard postings
  * for the BM25 batch scorer — the "hot index in RAM" every serving engine
  * keeps (Lucene's page-cache residency, Docodo's in-process readers).
  *
  * Motivation (measured): the batch's parquet scan is a one-pass DRAM
  * stream (page decode + row materialization) that re-runs on EVERY batch
  * call and inflates ~2.2x when 8 tasks stream concurrently — it was 70%
  * of task time while the MaxScore merge, whose working set fits L3, only
  * inflates ~1.3x. Serving repeated batches from a decoded cache removes
  * the non-scaling component entirely; the first batch on a snapshot pays
  * one full-shard decode (reported by the bench as the warm/cold split).
  *
  * Safety:
  *  - Keys are `dir@vN#partition`: snapshot versions are immutable (files
  *    are never rewritten under a version; new ingests commit new
  *    versions), so an entry can never go stale — a new snapshot simply
  *    uses new keys and the old ones age out via LRU.
  *  - Entries hold PARTITION-relative data, and file→partition assignment
  *    is a deterministic function of the tagged file list and the reader
  *    confs (one task per file, sorted listing, fixed bin-packing), so
  *    within a tag a partition id always denotes the same shard file.
  *    (A hypothetical FULL permutation would still be correct — scoring is
  *    shard-local and a job is the union over all partition ids, each
  *    covering one whole shard — but a PARTIAL permutation with mixed
  *    hits/misses would not be, which is why the tag pins the exact file
  *    list the packing function is deterministic over.)
  *  - `raw` holds (relIds, tfs) awaiting a term's idf (idf is known only
  *    for queried codes — the driver broadcasts it per batch); the first
  *    batch that queries a code promotes it to a score-ready `contrib`
  *    entry (idf and avgdl are snapshot-pinned, so promotion is
  *    idempotent and the cached scores are exact).
  *  - Budgeted: GRAFT_CONTRIB_CACHE_MB (default 4096; 0 disables). Whole
  *    shards are evicted least-recently-used; a shard larger than the
  *    whole budget is simply not published.
  */
object ContribCache extends ShardCache[ContribShard] {

  type Shard = ContribShard

  protected def envBudgetBytes: Long =
    sys.env.get("GRAFT_CONTRIB_CACHE_MB").map(_.toLong << 20).getOrElse(4096L << 20)
}

/** One doc shard's decoded (docId, tf) postings, partition-relative, plus
  * its dl strips; queried codes promote to score-ready contribution
  * arrays. */
private[spark] final class ContribShard(
    val base: Long, val dlOf: mutable.LongMap[Long], dlBytes: Long)
  extends CachedShard {
  /** code -> (partition-relative docIds asc, raw tfs) awaiting idf. */
  val raw = new ConcurrentHashMap[String, (Array[Int], Array[Int])]()
  /** code -> (relIds, per-doc BM25 contribution, max contribution). */
  val contrib = new ConcurrentHashMap[String, (Array[Int], Array[Double], Double)]()
  val bytes = new AtomicLong(dlBytes)
  def cacheBytes: Long = bytes.get()

  def putRaw(code: String, ids: Array[Int], tfs: Array[Int]): Unit = {
    if (raw.putIfAbsent(code, (ids, tfs)) == null)
      bytes.addAndGet(8L * ids.length + 64 + code.length)
  }

  /** Promote a queried code to score-ready form (drops its raw tfs). */
  def promote(code: String, idf: Double, avgdl: Double): (Array[Int], Array[Double], Double) = {
    val have = contrib.get(code)
    if (have != null) return have
    val r = raw.get(code)
    if (r == null) return null
    val (ids, tfs) = r
    val n = ids.length
    val cs = new Array[Double](n)
    var cMax = 0.0
    var i = 0
    while (i < n) {
      val c = idf * graft.query.Ranker.bm25TfNorm(tfs(i).toLong,
        dlOf.getOrElse(base + ids(i), 1L), avgdl)
      cs(i) = c
      if (c > cMax) cMax = c
      i += 1
    }
    val v = (ids, cs, cMax)
    val prev = contrib.putIfAbsent(code, v)
    if (prev != null) prev
    else {
      // ids array is shared between raw and contrib; net delta = cs - tfs
      val delta = 8L * n - 4L * n
      bytes.addAndGet(delta)
      // post-publish growth flows into the cache's global total while the
      // shard is still published (ShardCache handles the evicted case)
      ContribCache.notePublishedGrowth(this, delta)
      raw.remove(code)
      v
    }
  }
}
