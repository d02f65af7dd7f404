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
  *
  * `release` (optional constructor arg) frees the resources behind a
  * cached value — `Checkpoints.free` for materialized frames — and is
  * invoked per entry by [[clear]]. Every instance self-registers with
  * [[Memo.drainAll]], the session-hygiene hook the bench harness calls
  * between operator families: a 300+-query single session otherwise
  * accumulates every family's pinned executor-storage blocks, and the
  * storage pressure taxes late cells (the r12 late-session elevation).
  *
  * DRAIN CONTRACT: [[clear]]/[[Memo.drainAll]] may only run while no
  * query is consuming a cached value — freeing a localCheckpoint'd
  * frame under a live consumer loses its blocks with no recompute path
  * (lineage is truncated). The bench satisfies this by draining only at
  * family boundaries on its single driver thread; a concurrent-session
  * owner (e.g. the SQL server) must quiesce first. A later `once` after
  * a drain is always safe — it just rebuilds.
  */
final class Memo[K, V](release: V => Unit) {
  def this() = this((_: V) => ())

  private val map = new java.util.concurrent.ConcurrentHashMap[K, V]()
  Memo.register(this)

  /** Return the cached value for `key`, building it at most once. */
  def once(key: K)(build: => V): V =
    map.computeIfAbsent(key, _ => build)

  /** Peek without building (for read-only inspection paths). */
  def get(key: K): Option[V] = Option(map.get(key))

  /** Evict every entry, releasing each value's backing resources. A
    * throwing release (stopped session, FS error on a temp-dir delete)
    * must not abort the loop or propagate into the bench's
    * family-boundary drain — log and keep releasing the rest.
    */
  def clear(): Unit = {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val v = it.next().getValue
      it.remove()
      try release(v)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] Memo release failed (continuing): $e")
      }
    }
  }
}

object Memo {
  private val all =
    new java.util.concurrent.ConcurrentLinkedQueue[Memo[_, _]]()

  private def register(m: Memo[_, _]): Unit = all.add(m)

  /** Clear every live memo (bench family-boundary hygiene). Memos are
    * module-level singletons, so `all` is bounded by the number of
    * cache sites in the codebase, not by session activity. */
  def drainAll(): Unit = all.forEach(_.clear())
}
