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

  // ------------------------------------------------------------- HTTP
  // The r17 verdict's last unexecuted protocol branch: every prior case
  // drove fetch over file:// URLs, so the HttpURLConnection status/
  // timeout handling (the reference's requests.get(stream=True,
  // timeout=30) + raise_for_status, app.py:7–15) had never actually run.
  // An in-process com.sun.net.httpserver listener (JDK-only, loopback,
  // ephemeral port) drives 200 / 404 / read-timeout / truncated-body /
  // skip-if-exists against the real protocol stack.

  /** Loopback HTTP server for one test body; counts requests per path. */
  private def withHttpServer[A](
      handlers: Map[String, com.sun.net.httpserver.HttpExchange => Unit])(
      body: (String, java.util.concurrent.ConcurrentHashMap[String, Integer]) => A): A = {
    import com.sun.net.httpserver.HttpServer
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val srv = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    handlers.foreach { case (path, h) =>
      srv.createContext(path, ex => {
        hits.merge(path, 1, (a, b) => a + b)
        try h(ex) finally ex.close()
      })
    }
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}", hits)
    finally srv.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      status: Int, bytes: Array[Byte]): Unit = {
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  test("http 200: streams the body, then skip-if-exists never re-contacts the server") {
    val payload = ("chunk" * 4000).getBytes // ~20 KB: multiple 8 KB chunks
    withHttpServer(Map("/data.bin" -> (ex => respond(ex, 200, payload)))) {
      (base, hits) =>
        val destDir = Files.createTempDirectory("ingest-http")
        val dest = destDir.resolve("data.bin")
        assert(Ingest.fetch(s"$base/data.bin", dest) === true)
        assert(java.util.Arrays.equals(Files.readAllBytes(dest), payload))
        assert(hits.get("/data.bin") === 1)
        // idempotent hit: no download AND no network round-trip at all
        assert(Ingest.fetch(s"$base/data.bin", dest) === false)
        assert(hits.get("/data.bin") === 1, "skip-if-exists contacted the server")
    }
  }

  test("http 404: fails with the status in the message, no partial file") {
    withHttpServer(Map("/gone.bin" -> (ex => respond(ex, 404, "nope".getBytes)))) {
      (base, _) =>
        val destDir = Files.createTempDirectory("ingest-http404")
        val dest = destDir.resolve("gone.bin")
        val e = intercept[java.io.IOException](Ingest.fetch(s"$base/gone.bin", dest))
        assert(e.getMessage.contains("HTTP 404"))
        assert(!Files.exists(dest))
        assert(destDir.toFile.listFiles().isEmpty, "partial .part file left behind")
    }
  }

  test("http read-timeout: a stalled body fails loudly, no partial file") {
    // headers sent, then the body stalls past the read timeout — the
    // mid-transfer hang case (a connect-phase test would race the
    // listener's backlog instead)
    withHttpServer(Map("/slow.bin" -> (ex => {
      ex.sendResponseHeaders(200, 100000L)
      ex.getResponseBody.write("start".getBytes)
      ex.getResponseBody.flush()
      Thread.sleep(2000)
    }))) { (base, _) =>
      val destDir = Files.createTempDirectory("ingest-httpslow")
      val dest = destDir.resolve("slow.bin")
      intercept[java.net.SocketTimeoutException](
        Ingest.fetch(s"$base/slow.bin", dest, timeoutMs = 300))
      assert(!Files.exists(dest))
      assert(destDir.toFile.listFiles().isEmpty, "partial .part file left behind")
    }
  }

  test("http truncated body: a transfer shorter than Content-Length never lands at dest") {
    // the killed-transfer case the temp-file + atomic-move design exists
    // for: Content-Length promises 50 KB, the connection dies after 5 —
    // dest must not exist afterward (a truncated file that skip-if-exists
    // would then trust forever is the failure mode)
    withHttpServer(Map("/trunc.bin" -> (ex => {
      ex.sendResponseHeaders(200, 50000L)
      ex.getResponseBody.write(new Array[Byte](5000))
      ex.getResponseBody.flush()
      // closing the exchange with 45 KB unsent aborts the connection
    }))) { (base, _) =>
      val destDir = Files.createTempDirectory("ingest-httptrunc")
      val dest = destDir.resolve("trunc.bin")
      intercept[java.io.IOException](Ingest.fetch(s"$base/trunc.bin", dest))
      assert(!Files.exists(dest), "truncated transfer was atomically moved into place")
      assert(destDir.toFile.listFiles().isEmpty, "partial .part file left behind")
      // and a later good transfer heals it
      withHttpServer(Map("/trunc.bin" -> (ex2 => respond(ex2, 200, "ok".getBytes)))) {
        (base2, _) =>
          assert(Ingest.fetch(s"$base2/trunc.bin", dest) === true)
          assert(new String(Files.readAllBytes(dest)) === "ok")
      }
    }
  }
}
