package graft.sources.segment

/** Bounded LRU for decoded per-file/per-payload artifacts (deletion
  * vectors, bloom bitsets) — replaces the earlier wholesale-`clear()`
  * bound, which dropped the WHOLE working set the moment the cap was
  * crossed: a scan over cap+1 distinct segments then re-decoded every
  * vector on every query (the r9-r10 verdict's carried minor). Access-
  * ordered `LinkedHashMap` evicts exactly the least-recently-used
  * entry instead.
  *
  * Loads run OUTSIDE the lock (decode may be file IO — a 128 KB read
  * must not serialize every other task's cache hit); a racing
  * duplicate load is benign (identical value, last put wins).
  */
private[graft] final class DecodeCache[V <: AnyRef](maxEntries: Int) {
  private val map = new java.util.LinkedHashMap[String, V](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      this.size() > maxEntries // the map's size, not the outer cache's accessor
  }

  def getOrElseUpdate(key: String)(load: => V): V = {
    map.synchronized {
      val hit = map.get(key)
      if (hit != null) return hit
    }
    val v = load
    map.synchronized {
      val hit = map.get(key)
      if (hit != null) hit
      else { map.put(key, v); v }
    }
  }

  private[graft] def size: Int = map.synchronized(map.size())
}
