package graft

import java.util.concurrent.atomic.AtomicBoolean
import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Staging

/** The cross-process staging guard: concurrent check-and-write sections on
  * the same staging root must serialize (the VERDICT-named hazard was a
  * bench run and the test suite interleaving `write(built, dir)` on shared
  * `target/` paths and serving a half-written table).
  */
class StagingSpec extends AnyFunSuite {

  test("withExclusiveLock: a second writer waits out the first — no interleaving") {
    val root = java.nio.file.Files.createTempDirectory("stg").toFile
    val inCritical = new AtomicBoolean(false)
    val overlapped = new AtomicBoolean(false)
    val firstEntered = new CountDownLatch(1)
    def enter(holdMs: Long): Unit = Staging.withExclusiveLock(root) {
      if (!inCritical.compareAndSet(false, true)) overlapped.set(true)
      firstEntered.countDown()
      Thread.sleep(holdMs)
      inCritical.set(false)
    }
    val t1 = new Thread(() => enter(300))
    t1.start()
    assert(firstEntered.await(5, TimeUnit.SECONDS), "first writer never entered")
    val t2 = new Thread(() => enter(0))
    t2.start()
    t1.join(5000); t2.join(5000)
    assert(!t1.isAlive && !t2.isAlive, "a writer deadlocked on the staging lock")
    assert(!overlapped.get, "two writers were inside the critical section at once")
  }

  test("withExclusiveLock: sequential reacquisition works (lock is released)") {
    val root = java.nio.file.Files.createTempDirectory("stg2").toFile
    val seen = Staging.withExclusiveLock(root)(1) + Staging.withExclusiveLock(root)(2)
    assert(seen === 3)
  }
}
