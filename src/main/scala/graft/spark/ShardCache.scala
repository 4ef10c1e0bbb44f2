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
    * Returns the canonical instance (first publisher wins on a race).
    * The publish step (map insert + flag + total credit) runs under the
    * cache monitor so it cannot interleave with [[clear]] — an unlocked
    * put racing a clear could set `published`/credit `total` after the
    * zeroing sweep, leaving a phantom positive residue that makes every
    * later put evict the whole cache. */
  def put(key: String, sh: S): S = {
    val sz = sh.cacheBytes
    if (sz > maxBytes) return sh // oversized: task-local use only
    var canonical: S = sh
    var newTotal = -1L
    synchronized {
      val prev = shards.putIfAbsent(key, sh)
      if (prev != null) canonical = prev
      else { sh.published = true; newTotal = total.addAndGet(sz) }
    }
    if (newTotal > maxBytes) evictTo(maxBytes, keepKey = key)
    canonical
  }

  /** Post-publish growth accounting (e.g. promotion of raw entries to
    * score-ready form, or a [[BlockShard]] decoded-term upgrade): flows
    * into the global total only while the entry is still published, and
    * TRIGGERS EVICTION when growth alone pushes the cache over budget —
    * on a fully-resident snapshot no put() ever runs again, so without
    * this hook decode upgrades could grow the cache past its heap cap
    * unboundedly. The growing shard is evicted last (it is the hottest by
    * construction), but IS evicted if it alone exceeds the budget — the
    * caller keeps its task-local reference and the next batch refills.
    * Runs under the cache monitor, so growth can no longer interleave
    * with eviction's snapshot-subtract or with clear(): the budget is a
    * strict bound (modulo oversized task-local entries, never published). */
  private[spark] def notePublishedGrowth(sh: CachedShard, delta: Long): Unit = synchronized {
    if (sh.published) {
      val t = total.addAndGet(delta)
      if (t > maxBytes) {
        evictTo(maxBytes, keepShard = sh)
        if (total.get() > maxBytes) evictTo(maxBytes)
      }
    }
  }

  private def evictTo(budget: Long, keepKey: String = null,
                      keepShard: CachedShard = null): Unit = synchronized {
    import scala.jdk.CollectionConverters._
    val byAge = shards.entrySet().asScala.toSeq.sortBy(_.getValue.lastUsed)
    val it = byAge.iterator
    while (total.get() > budget && it.hasNext) {
      val e = it.next()
      if (e.getKey != keepKey && (e.getValue ne keepShard) &&
          shards.remove(e.getKey, e.getValue)) {
        val sh = e.getValue
        // Snapshot bytes BEFORE un-publishing (kept though growth now runs
        // under the same monitor — the ordering is still the one that
        // fails conservative if a new unlocked growth path ever appears).
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
