package graft.util

/** Minimal thread-safe LRU: an access-ordered LinkedHashMap bounded at
  * maxEntries — the least-recently-used entry is evicted when an insert
  * pushes the size past capacity. Values are computed OUTSIDE the lock
  * (a racing miss may compute twice; the first writer wins) so a slow
  * compute — e.g. a PQ training job — never serializes other lookups.
  *
  * `onEvict` runs for each evicted entry (inside the map lock, so keep it
  * cheap and non-reentrant) — caches holding resources that the JVM won't
  * reclaim on its own (persisted/checkpointed DataFrame blocks live in the
  * BlockManager until ContextCleaner GC) release them here instead of
  * leaking them until context shutdown.
  */
final class LruCache[K, V](val maxEntries: Int,
                           onEvict: (K, V) => Unit = (_: K, _: V) => ()) {
  require(maxEntries > 0, "LruCache capacity must be positive")

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean = {
      val evict = this.size() > maxEntries
      if (evict) {
        try onEvict(e.getKey, e.getValue)
        catch { case _: Throwable => () } // eviction cleanup is best-effort
      }
      evict
    }
  }

  def getOrElseUpdate(k: K)(v: => V): V = {
    val hit = m.synchronized(Option(m.get(k)))
    hit.getOrElse {
      val computed = v
      m.synchronized {
        val racer = m.get(k)
        if (racer != null) racer
        else { m.put(k, computed); computed }
      }
    }
  }

  def size: Int = m.synchronized(m.size())
  def contains(k: K): Boolean = m.synchronized(m.containsKey(k))
}
