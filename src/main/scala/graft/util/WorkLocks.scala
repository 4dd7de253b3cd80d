package graft.util

/** Per-path mutual exclusion for query fns that MUTATE a shared
  * session-cached index fixture (benchRewind → fold → probe): index
  * maintenance is single-writer by contract, and two concurrent
  * invocations of the same registered query in one session (parallel
  * test suites sweeping the registry; notebook users) would otherwise
  * race the manifest CAS and fail loudly. The bench itself is
  * sequential, so serializing here costs it nothing.
  */
object WorkLocks {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def sync[T](key: String)(body: => T): T = {
    // putIfAbsent, not computeIfAbsent: the repo-wide CacheFillAuditSpec
    // rule (no factories under a CHM bin lock; a lost race here leaks
    // one plain Object, nothing more)
    var l = locks.get(key)
    if (l == null) {
      locks.putIfAbsent(key, new Object)
      l = locks.get(key)
    }
    l.synchronized(body)
  }
}
