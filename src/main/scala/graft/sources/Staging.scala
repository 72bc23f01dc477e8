package graft.sources

import java.io.File
import java.nio.channels.FileChannel
import java.nio.file.StandardOpenOption
import java.util.concurrent.ConcurrentHashMap

/** Cross-process safety for the repo-local staging areas (the clean
  * tables, the IVF cell index, the dedup cluster labels). Two JVMs
  * sharing `target/` — the test suite next to a bench run — could
  * otherwise interleave a staleness check with another process's
  * in-flight write and serve a half-written table.
  *
  * The guard is an OS advisory file lock around the whole
  * check-freshness-then-maybe-write critical section, DOUBLE-CHECKED: the
  * winner builds, and the loser re-runs its staleness check under the
  * lock, sees the fresh marker, and skips its own write. Markers
  * (`_SUCCESS` + spec files) are written only after the data, so a
  * reader that passed `ensure` never observes a torn table.
  *
  * `FileChannel.lock` is process-scoped, so a JVM-wide monitor per
  * canonical path serializes same-process callers first (overlapping
  * lock requests from one JVM would otherwise throw
  * OverlappingFileLockException). Advisory locks are a LOCAL-filesystem
  * mechanism — the right local twin of what a 1000-executor deployment
  * gets from a transactional table format or a pointer-swap manifest;
  * staging writes here all run on the driver-side build path, never on
  * executors.
  */
object Staging {

  private val monitors = new ConcurrentHashMap[String, Object]()

  /** Run `body` holding an exclusive lock on `root/.graft_lock` (creating
    * `root` if needed). Reentrant across nested calls is NOT supported —
    * keep critical sections flat.
    */
  def withExclusiveLock[T](root: File)(body: => T): T = {
    root.mkdirs()
    val lockFile = new File(root, ".graft_lock")
    val monitor =
      monitors.computeIfAbsent(root.getCanonicalPath, _ => new Object)
    monitor.synchronized {
      val ch = FileChannel.open(
        lockFile.toPath, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body
        finally lock.release()
      } finally ch.close()
    }
  }
}
