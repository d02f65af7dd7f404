package graft.plans

/** Temp-directory hygiene shared by the operators that stage
  * corpus-sized artifacts on local disk (persisted ANN indexes, staged
  * CDC streams, admission-control split copies). A 300+-query bench
  * session otherwise accumulates every family's scratch for the
  * process lifetime — the disk-side twin of the executor-storage
  * pressure [[Memo.drainAll]] exists for.
  */
object Scratch {

  /** Recursively delete `root` if it exists; never throws (a scratch
    * delete racing the OS tmp cleaner or a stopped session's FS is not
    * an error worth failing a bench family boundary over). */
  /** Recreate `src`'s file tree under `dst` via HARDLINKS (copy
    * fallback for cross-device): metadata-only duplication of a stored
    * artifact template into a run-private working dir, so an entry that
    * mutates its index root (segment appends, compactions) can start
    * from a memoized immutable base without re-deriving or re-copying
    * the bytes. */
  def linkTree(src: String, dst: String): Unit = {
    import scala.jdk.CollectionConverters._
    val sp = java.nio.file.Paths.get(src)
    val dp = java.nio.file.Paths.get(dst)
    java.nio.file.Files.createDirectories(dp)
    // walk() holds a directory handle until closed; and the copy
    // fallback must only swallow the link-specific failures
    // (cross-device, FS without hardlinks) — a fatal error (OOM,
    // interrupt) must propagate, not retry as a copy.
    val walk = java.nio.file.Files.walk(sp)
    try walk.iterator().asScala.foreach { f =>
      val t = dp.resolve(sp.relativize(f))
      if (java.nio.file.Files.isDirectory(f))
        java.nio.file.Files.createDirectories(t)
      else
        try java.nio.file.Files.createLink(t, f)
        catch {
          case _: java.io.IOException | _: UnsupportedOperationException =>
            java.nio.file.Files.copy(f, t,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
    } finally walk.close()
  }

  def deleteTree(root: String): Unit =
    try {
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .reverseIterator
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
    } catch { case _: Throwable => () }
}
