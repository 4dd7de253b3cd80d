package graft.util

import java.util.concurrent.ConcurrentHashMap

/** Compute-OUTSIDE-the-lock cache fill — the ONE way main-tree code
  * populates a ConcurrentHashMap whose values take Spark work to
  * build. `ConcurrentHashMap.computeIfAbsent` runs the factory while
  * holding the key's BIN lock: seconds of Spark work serialize
  * concurrent first invocations whose keys share a bin, and a
  * reentrant compute (a factory that touches another cached entry in
  * the same map) throws IllegalStateException. [[fill]] computes
  * first, then `putIfAbsent`; the losing racer's value is released
  * (caches unpersisted, temp state dropped) and the winner's returned.
  *
  * Entries live for the application lifetime by design (bench/session
  * caches keyed on applicationId); memory is reclaimed only by Spark's
  * clearCache, which value-specific re-cache guards tolerate.
  */
object Caches {

  def fill[V <: AnyRef](m: ConcurrentHashMap[String, V], key: String,
                        release: V => Unit = (_: V) => ())(mk: => V): V = {
    val existing = m.get(key)
    if (existing != null) existing
    else {
      val fresh = mk
      // computeIfAbsent semantics for a null factory result: nothing
      // is inserted and null returns to the caller (SummaryAggRewrite
      // caches a `.orNull` lookup and declines on null — a
      // putIfAbsent(key, null) here would NPE inside an optimizer rule)
      if (fresh == null) return fresh
      val prev = m.putIfAbsent(key, fresh)
      if (prev == null) fresh else { release(fresh); prev }
    }
  }
}
