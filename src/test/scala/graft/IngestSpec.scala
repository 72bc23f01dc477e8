package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Ingest

/** S1 fetch semantics (app.py:7–15): download once, skip when present,
  * fail loudly, never leave partial files behind.
  */
class IngestSpec extends AnyFunSuite {

  test("fetch: downloads via URL, then skips when the destination exists") {
    val src = Files.createTempFile("ingest-src", ".parquet")
    Files.write(src, "payload-bytes".getBytes)
    val destDir = Files.createTempDirectory("ingest-dst")
    val dest = destDir.resolve("staged.parquet")

    assert(Ingest.fetch(src.toUri.toString, dest) === true)
    assert(new String(Files.readAllBytes(dest)) === "payload-bytes")

    // idempotent: second call must NOT re-download (source changes, dest doesn't)
    Files.write(src, "changed".getBytes)
    assert(Ingest.fetch(src.toUri.toString, dest) === false)
    assert(new String(Files.readAllBytes(dest)) === "payload-bytes")
  }

  test("fetchInto derives the file name from the URL path") {
    val src = Files.createTempFile("ingest-named", ".csv")
    Files.write(src, "a,b\n1,2\n".getBytes)
    val destDir = Files.createTempDirectory("ingest-dst2")
    val dest = Ingest.fetchInto(src.toUri.toString, destDir)
    assert(dest.getFileName.toString === src.getFileName.toString)
    assert(Files.exists(dest))
  }

  test("fetchInto: a root-path URL fails with the named require, not an NPE") {
    val destDir = Files.createTempDirectory("ingest-dst4")
    val e = intercept[IllegalArgumentException](
      Ingest.fetchInto("file:///", destDir))
    assert(e.getMessage.contains("cannot derive a file name"))
  }

  test("fetch: a missing source fails loudly and leaves no partial file") {
    val destDir = Files.createTempDirectory("ingest-dst3")
    val dest = destDir.resolve("never.parquet")
    intercept[java.io.IOException] {
      Ingest.fetch(s"${destDir.toUri}does-not-exist.bin", dest)
    }
    assert(!Files.exists(dest))
    assert(destDir.toFile.listFiles().isEmpty, "partial .part file left behind")
  }
}
