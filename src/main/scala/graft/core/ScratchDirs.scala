package graft.core

/** JVM-exit cleanup for per-application scratch directories.
  *
  * A few graded queries stage real files to demonstrate a storage
  * layout (`scan_csv_multiline`'s multi-line CSV, `scan_time_travel`'s
  * transaction log, the z-order layouts). The paths are keyed by
  * applicationId so concurrent runs never collide — which also means
  * repeated app runs accumulate litter under java.io.tmpdir. The dirs
  * must outlive the RETURNED frame (it lazily re-reads them), so the
  * correct scope is process exit, not query return: register each here
  * and one shutdown hook removes them all. tmpfs-pinned bench runs are
  * doubly covered (the bench already deletes its scratch root). */
object ScratchDirs {
  private val paths = new java.util.concurrent.ConcurrentHashMap[String, Unit]
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => paths.keySet.forEach(p => rm(new java.io.File(p)))))

  /** Remember `path` for removal at JVM exit (idempotent). */
  def cleanupOnExit(path: String): String = {
    hook
    paths.put(path, ())
    path
  }

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
    f.delete(): Unit
  }
}
