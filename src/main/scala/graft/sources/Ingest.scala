package graft.sources

import java.io.{FileOutputStream, InputStream}
import java.net.{URI, URLConnection}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** S1 — idempotent, streamed file fetch (the reference's `download_file`,
  * app.py:7–15 / assignment1.ipynb:38–49): skip when the destination
  * already exists, otherwise stream in fixed-size chunks with a timeout
  * and fail loudly on any error.
  *
  * Driver-side by design: this is a one-time staging step, not a Spark
  * operator (SURVEY.md §2.1) — the cluster reads the staged files. Two
  * hardenings over the reference:
  *  - the download streams into a temp file that is atomically moved into
  *    place, so a killed transfer can never leave a truncated file that
  *    the skip-if-exists check would then trust forever;
  *  - the chunk buffer is fixed (8 KB, matching the reference) so memory
  *    use is constant regardless of file size.
  */
object Ingest {

  final val ChunkBytes = 8192
  final val TimeoutMs = 30000

  /** Fetch `url` to `dest` unless `dest` already exists.
    *
    * @return true if a download happened, false if skipped (idempotent hit)
    */
  def fetch(url: String, dest: Path, timeoutMs: Int = TimeoutMs): Boolean = {
    if (Files.exists(dest)) return false
    Option(dest.getParent).foreach(Files.createDirectories(_))
    val conn: URLConnection = URI.create(url).toURL.openConnection()
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn match {
      case http: java.net.HttpURLConnection =>
        // mirror requests' raise_for_status (app.py:13)
        if (http.getResponseCode >= 400)
          throw new java.io.IOException(
            s"fetch $url failed: HTTP ${http.getResponseCode}")
      case _ => // file:// and friends have no status to check
    }
    val tmp = Files.createTempFile(
      Option(dest.getParent).getOrElse(Paths.get(".")), s".${dest.getFileName}", ".part")
    try {
      val in = conn.getInputStream
      val copied = try copy(in, tmp) finally in.close()
      // Truncation check (found by the r18 HTTP-listener test, not by
      // inspection): a server that dies mid-transfer after promising a
      // Content-Length can surface as a plain EOF — HttpURLConnection
      // does not always throw on a short fixed-length body — and an
      // unchecked atomic move would then install a truncated file that
      // the skip-if-exists check trusts forever, the exact failure the
      // temp-file design exists to prevent. When the length is declared,
      // the byte count must match; -1 (chunked/unknown) passes through.
      val expected = conn.getContentLengthLong
      if (expected >= 0 && copied != expected)
        throw new java.io.IOException(
          s"fetch $url truncated: got $copied of $expected bytes")
      Files.move(tmp, dest,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      true
    } catch { case e: Throwable =>
      Files.deleteIfExists(tmp)
      throw e
    }
  }

  /** Fetch into `destDir` keeping the URL's file name — the reference's
    * calling convention (`data/raw/<name>`, assignment1.ipynb:52–56).
    */
  def fetchInto(url: String, destDir: Path, timeoutMs: Int = TimeoutMs): Path = {
    // getFileName is null for root paths ("http://host/") — fold that into
    // the loud require instead of an accidental NPE
    val name = Option(Paths.get(URI.create(url).getPath).getFileName)
      .map(_.toString).getOrElse("")
    require(name.nonEmpty, s"cannot derive a file name from $url")
    val dest = destDir.resolve(name)
    fetch(url, dest, timeoutMs)
    dest
  }

  /** @return total bytes copied (for the declared-length check above) */
  private def copy(in: InputStream, to: Path): Long = {
    val out = new FileOutputStream(to.toFile)
    var total = 0L
    try {
      val buf = new Array[Byte](ChunkBytes)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) { out.write(buf, 0, n); total += n }
        n = in.read(buf)
      }
    } finally out.close()
    total
  }
}
