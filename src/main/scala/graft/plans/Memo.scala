package graft.plans

/** At-most-once per-key memoization for side-effecting builders.
  *
  * The shared trained-artifact caches (symmetrized edge relations,
  * shingle indexes, BPE merge tables, IVF/PQ codebooks) memoize a
  * builder that MATERIALIZES executor-storage blocks.
  * `TrieMap.getOrElseUpdate` evaluates the thunk outside the map's
  * synchronization, so two threads racing on first touch (the MySQL
  * server serves each connection on its own thread) would both run the
  * build and the losing copy's persisted blocks would leak untracked.
  * `ConcurrentHashMap.computeIfAbsent` runs the mapping function
  * atomically — concurrent first-touchers block until the single build
  * completes, and exactly one artifact is ever stored.
  *
  * Builders must not re-enter the SAME cache (computeIfAbsent is not
  * reentrant); cross-cache composition (e.g. duplicate clusters built
  * on the shared shingle index) is fine — each cache locks its own key
  * space only.
  */
final class Memo[K, V] {
  private val map = new java.util.concurrent.ConcurrentHashMap[K, V]()

  /** Return the cached value for `key`, building it at most once. */
  def once(key: K)(build: => V): V =
    map.computeIfAbsent(key, _ => build)

  /** Peek without building (for read-only inspection paths). */
  def get(key: K): Option[V] = Option(map.get(key))
}
