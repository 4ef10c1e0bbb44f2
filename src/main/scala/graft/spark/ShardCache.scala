package graft.spark

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** An entry in an executor-resident shard cache. */
private[spark] trait CachedShard {
  @volatile var lastUsed: Long = System.nanoTime()
  /** Current heap footprint estimate (may grow after publish — see
    * [[ShardCache.notePublishedGrowth]]). */
  def cacheBytes: Long
  /** Called under the eviction lock when this entry leaves the cache,
    * BEFORE its bytes are subtracted from the global total. */
  def onEvict(): Unit = ()
  /** Set by the owning cache on successful publish, cleared on eviction. */
  @volatile private[spark] var published = false
}

/** Budget/LRU scaffolding shared by the executor-resident serving caches
  * ([[ContribCache]], [[BlockCache]]) — one copy of the
  * concurrency-sensitive accounting so a fix in one can't silently miss
  * the other (the promote-after-evict drift fixed in round 4 was exactly
  * that class of bug).
  *
  *  - Effective budget = env/override value capped at 30% of THIS JVM's
  *    heap: the authoritative cap is local (put/evict run on the executor,
  *    which knows its own -Xmx), so two 4 GB default budgets can never
  *    jointly out-size a smaller executor. Driver-side residency checks
  *    apply the same cap with a conf-based heap estimate.
  *  - put() publishes at most one entry per key (first wins), then evicts
  *    least-recently-used whole entries to fit the budget; an entry larger
  *    than the whole budget is returned for task-local use, unpublished.
  *  - Eviction un-publishes the entry FIRST (see [[CachedShard.onEvict]]
  *    ordering): a task still holding it may grow it afterwards, and a
  *    published flag left true would add growth deltas to a total whose
  *    bytes were already subtracted — a permanent upward drift.
  */
private[spark] abstract class ShardCache[S <: CachedShard] {

  /** The configured budget in bytes (from the cache's env knob). */
  protected def envBudgetBytes: Long

  /** Test hook: overrides the env budget (single-JVM tests can't vary
    * process env per-case). */
  @volatile var maxBytesOverride: Option[Long] = None
  /** The raw configured budget, UNCAPPED by the local JVM heap — what
    * driver-side residency checks must compare against (combined with the
    * EXECUTOR heap estimate): `maxBytes` below caps by the current JVM's
    * heap, which on a cluster is the driver's, and a small-driver/
    * large-executor deployment would otherwise silently disable the
    * serving caches for snapshots the executors could hold. */
  def configuredBudget: Long = maxBytesOverride.getOrElse(envBudgetBytes)
  def maxBytes: Long = math.min(
    configuredBudget,
    Runtime.getRuntime.maxMemory() / 10 * 3)
  def enabled: Boolean = maxBytes > 0

  private val shards = new ConcurrentHashMap[String, S]()
  private val total = new AtomicLong(0L)

  def get(key: String): S = {
    val s = shards.get(key)
    if (s != null) s.lastUsed = System.nanoTime()
    s
  }

  /** Publish a freshly-built shard, evicting LRU entries to fit budget.
    * Returns the canonical instance (first publisher wins on a race). */
  def put(key: String, sh: S): S = {
    val sz = sh.cacheBytes
    if (sz > maxBytes) return sh // oversized: task-local use only
    val prev = shards.putIfAbsent(key, sh)
    if (prev != null) return prev
    sh.published = true
    val newTotal = total.addAndGet(sz)
    if (newTotal > maxBytes) evictTo(maxBytes, keep = key)
    sh
  }

  /** Post-publish growth accounting (e.g. promotion of raw entries to
    * score-ready form): flows into the global total only while the entry
    * is still published. The publish/evict windows can leak a delta —
    * the budget is a soft bound; per-shard bytes stay exact for eviction. */
  private[spark] def notePublishedGrowth(sh: CachedShard, delta: Long): Unit =
    if (sh.published) total.addAndGet(delta)

  private def evictTo(budget: Long, keep: String): Unit = synchronized {
    import scala.jdk.CollectionConverters._
    val byAge = shards.entrySet().asScala.toSeq.sortBy(_.getValue.lastUsed)
    val it = byAge.iterator
    while (total.get() > budget && it.hasNext) {
      val e = it.next()
      if (e.getKey != keep && shards.remove(e.getKey, e.getValue)) {
        val sh = e.getValue
        // Snapshot bytes BEFORE un-publishing: a promote landing after the
        // flag clears grows cacheBytes without crediting `total` (the
        // notePublishedGrowth guard sees published=false), so subtracting
        // the post-growth value would permanently undercount the total —
        // an always-downward drift that lets the cache exceed its budget
        // over churn. With the snapshot, the worst interleaving (promote
        // credits `total` between snapshot and flag-clear) leaves a stale
        // POSITIVE residue — over-eviction, the conservative direction.
        val snap = sh.cacheBytes
        sh.published = false
        sh.onEvict()
        total.addAndGet(-snap)
      }
    }
  }

  /** Test/ops hook: drop everything. Un-publishes entries first so a task
    * still holding a cleared shard can't promote growth into the zeroed
    * counter (same guard notePublishedGrowth relies on for eviction). */
  def clear(): Unit = synchronized {
    shards.values().forEach(_.published = false)
    shards.clear(); total.set(0L)
  }
  def totalBytes: Long = total.get()
}
