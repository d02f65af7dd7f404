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
