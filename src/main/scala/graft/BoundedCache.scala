package graft

/** Bounded keyed result cache with unpersist-on-evict — the one policy
  * behind every per-(session, dir) cache in the engine (ANN ground
  * truth, prefix-scan intermediates): a miss at capacity evicts the
  * OLDEST entry (insertion order — never the requested key) and invokes
  * the eviction callback so pinned executor storage is released.
  *
  * Synchronized as a whole: concurrent misses cannot double-evict past
  * the bound or race containsKey/size checks. The build runs under the
  * lock — acceptable here because builders are either lazy plan
  * construction or the bounded metadata actions of the two-phase scans,
  * and the contract surfaces (Verify/Bench) run queries sequentially. */
final class BoundedCache[V](max: Int, onEvict: V => Unit) {
  private val entries = new java.util.LinkedHashMap[String, V]()

  /** Evict everything now (callback per entry) — for contract surfaces
    * that know the cached value's consumers are done (r14 advice: a
    * persisted intermediate pinned for the application lifetime
    * competes with every later query's executor memory). */
  def clear(): Unit = synchronized {
    entries.values().forEach(v => onEvict(v))
    entries.clear()
  }

  def get(key: String)(build: => V): V = synchronized {
    val hit = entries.get(key)
    if (hit != null) hit
    else {
      if (entries.size >= max) {
        val it = entries.entrySet().iterator()
        if (it.hasNext) {
          val victim = it.next()
          onEvict(victim.getValue)
          it.remove()
        }
      }
      val v = build
      entries.put(key, v)
      v
    }
  }
}
