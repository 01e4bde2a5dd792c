package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.LruCache

/** The PQ codebook cache's bound: entries beyond capacity evict in
  * least-recently-used order, hits refresh recency, and a computed value
  * is cached exactly once per resident key. */
class LruCacheSpec extends AnyFunSuite {

  test("evicts beyond capacity, LRU first") {
    val c = new LruCache[Int, String](3)
    (1 to 3).foreach(k => c.getOrElseUpdate(k)(s"v$k"))
    assert(c.size == 3)
    c.getOrElseUpdate(1)("ignored") // touch 1 → 2 is now LRU
    c.getOrElseUpdate(4)("v4")      // evicts 2
    assert(c.size == 3)
    assert(c.contains(1) && c.contains(3) && c.contains(4))
    assert(!c.contains(2))
  }

  test("caches the computed value — compute runs once per resident key") {
    val c = new LruCache[String, Int](4)
    var computes = 0
    def get(): Int = c.getOrElseUpdate("k") { computes += 1; 42 }
    assert(get() == 42 && get() == 42 && get() == 42)
    assert(computes == 1)
  }

  test("never exceeds the bound under churn") {
    val c = new LruCache[Int, Int](8)
    (1 to 100).foreach(k => c.getOrElseUpdate(k)(k * k))
    assert(c.size == 8)
    // the 8 most recent keys survive
    (93 to 100).foreach(k => assert(c.contains(k)))
  }

  test("similarity PQ cache is bounded at its declared max") {
    assert(graft.similarity.Similarity.pqBookCacheMax == 8)
    assert(graft.similarity.Similarity.pqBookCache.maxEntries == 8)
  }
}
