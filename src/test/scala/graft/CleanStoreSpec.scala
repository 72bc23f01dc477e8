package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CleanStore

/** The staging staleness contract: a table is rebuilt when the build LOGIC
  * changes, not only when the source file does — serving a staging the
  * current code never produced would silently break the pf3/feed oracles.
  */
class CleanStoreSpec extends AnyFunSuite with SparkFixture {

  test("staging rebuilds when the recorded build spec no longer matches") {
    CleanStore.events(spark, sf001).count() // materialize (or reuse)
    val specFile = new java.io.File(CleanStore.stagePath(sf001, "events"), "_graft_spec")
    assert(specFile.exists(), "spec fingerprint missing after build")
    val original = new String(Files.readAllBytes(specFile.toPath))
    assert(original.contains("ts"), s"spec should record schema+predicate: $original")

    // simulate a logic change from an older build: corrupt the fingerprint
    Files.write(specFile.toPath, "schema of an older build".getBytes)
    val n = CleanStore.events(spark, sf001).count()
    assert(n > 0)
    val rewritten = new String(Files.readAllBytes(specFile.toPath))
    assert(rewritten === original, "staging was not rebuilt on spec mismatch")
  }
}
