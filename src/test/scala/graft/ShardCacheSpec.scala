package graft.spark

import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins on the shared budget/LRU scaffolding's accounting invariants
  * (drift here silently breaks BOTH serving caches' eviction honesty).
  */
class ShardCacheSpec extends AnyFunSuite {

  private final class FakeShard(init: Long) extends CachedShard {
    val b = new AtomicLong(init)
    def cacheBytes: Long = b.get()
  }

  private def freshCache(budget: Long): ShardCache[FakeShard] = {
    val c = new ShardCache[FakeShard] {
      protected def envBudgetBytes: Long = budget
    }
    c
  }

  private def grow(c: ShardCache[FakeShard], sh: FakeShard, delta: Long): Unit = {
    sh.b.addAndGet(delta)
    c.notePublishedGrowth(sh, delta)
  }

  test("clear() un-publishes held shards: a late promote cannot inflate the zeroed total") {
    val c = freshCache(1L << 20)
    val sh = new FakeShard(100)
    assert(c.put("a", sh) eq sh)
    assert(c.totalBytes == 100)
    // a task still holds `sh` across the clear...
    c.clear()
    assert(c.totalBytes == 0)
    // ...and promotes a code afterwards: the growth must NOT credit the
    // cleared cache's counter (the shard is no longer published)
    grow(c, sh, 5000)
    assert(c.totalBytes == 0, "promote after clear() inflated the budget counter")
  }

  test("eviction un-publishes and subtracts the evicted shard's own bytes exactly") {
    val c = freshCache(100)
    val a = new FakeShard(60)
    c.put("a", a)
    grow(c, a, 30) // post-publish promotion, accounted while published
    assert(c.totalBytes == 90)
    val b = new FakeShard(60)
    c.put("b", b) // 150 > 100 → evicts LRU (= a), subtracting a's GROWN size
    assert(c.totalBytes == 60, "evict must subtract the grown size, not the publish-time size")
    // a is un-published: later growth by the still-holding task is ignored
    grow(c, a, 1000)
    assert(c.totalBytes == 60, "promote after eviction inflated the budget counter")
  }

  test("oversized shards are returned for task-local use but never published") {
    val c = freshCache(50)
    val big = new FakeShard(51)
    assert(c.put("big", big) eq big)
    assert(c.totalBytes == 0)
    grow(c, big, 10)
    assert(c.totalBytes == 0)
    assert(c.get("big") == null)
  }

  test("post-publish growth alone triggers eviction (fully-resident snapshot, no further puts)") {
    val c = freshCache(100)
    val a = new FakeShard(40)
    val b = new FakeShard(40)
    c.put("a", a)
    Thread.sleep(2) // distinct lastUsed stamps
    c.put("b", b)
    assert(c.totalBytes == 80)
    // decoded-term upgrade on b pushes the cache over budget with no put()
    // in flight: the growth hook itself must evict (LRU = a), keeping the
    // growing shard — it is the hottest by construction
    grow(c, b, 50)
    assert(c.get("a") == null, "growth past budget must evict the LRU shard")
    assert(c.get("b") ne null)
    assert(c.totalBytes == 90)
  }

  test("a shard whose growth alone exceeds the whole budget is evicted itself") {
    val c = freshCache(100)
    val a = new FakeShard(40)
    c.put("a", a)
    grow(c, a, 200) // 240 > 100: nothing else to evict — a itself must go
    assert(c.get("a") == null, "a shard grown past the whole budget must not stay resident")
    assert(c.totalBytes == 0)
    // un-published: later growth by the still-holding task is ignored
    grow(c, a, 50)
    assert(c.totalBytes == 0)
  }

  test("configuredBudget is the raw knob; maxBytes caps it by the local JVM heap") {
    val c = freshCache(0)
    c.maxBytesOverride = Some(Long.MaxValue / 2)
    try {
      assert(c.configuredBudget == Long.MaxValue / 2)
      assert(c.maxBytes == Runtime.getRuntime.maxMemory() / 10 * 3,
        "maxBytes must cap at 30% of the current JVM's heap")
      assert(c.maxBytes < c.configuredBudget)
    } finally c.maxBytesOverride = None
  }
}
