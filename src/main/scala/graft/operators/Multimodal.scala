package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata structs.
  *
  * PNG, JPEG and GIF payloads get a REAL pixel decode (pure-JVM
  * ImageIO — no native codec needed) inside the `mapPartitions` seam;
  * other formats fall back to a deterministic stub derived from the
  * bytes (this container carries no video/audio codecs). Everything
  * Spark-side — schema, batch shape, partition sizing, the metadata
  * contract — is real either way, and the `decoded` flag says per row
  * which path ran. In production the stub branch is replaced by the
  * remaining codec calls inside the same `mapPartitions` (one codec
  * init per partition, not per row).
  */
object Multimodal {

  /** Typed metadata contract for a decoded asset. `decoded` marks rows
    * whose dimensions/channels came from a real pixel decode; for those,
    * `pixel_md5` digests the row-major big-endian ARGB stream — proof the
    * actual pixel payload was materialized, not just the header.
    */
  final case class AssetMeta(
      doc_id: Long,
      byte_len: Long,
      content_md5: String,
      width: Int,
      height: Int,
      channels: Int,
      decoded: Boolean,
      pixel_md5: String)

  /** Pure-expression metadata over a binary payload — cheap fields that
    * never need the decoder (length, content hash, stub dimensions).
    */
  def binaryMeta(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    val len = length(payload).cast("long")
    docs.select(
        col("doc_id"),
        len.as("byte_len"),
        md5(col("text")).as("content_md5"),
        (pmod(len, lit(64)) + 16).cast("long").as("stub_width"),
        (pmod(floor(len / lit(7)).cast("long"), lit(64)) + 16).cast("long").as("stub_height"))
      .orderBy(col("doc_id"))
  }

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= PngMagic.length &&
      java.util.Arrays.equals(bytes, 0, PngMagic.length, PngMagic, 0, PngMagic.length)

  /** JFIF/EXIF JPEG: FF D8 FF — like PNG's 0x89, 0xFF is an invalid
    * UTF-8 lead byte, so this branch is PROVABLY dead on a prose corpus
    * (the mm2 oracle's all-stub assumption stays a proof, not a
    * probability).
    */
  private def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte &&
      bytes(2) == 0xFF.toByte

  /** GIF87a/GIF89a. Unlike the PNG/JPEG magics this is printable ASCII
    * and COULD open a prose document (the adversarial asset corpus
    * plants several), so the mm2 oracle can't treat the branch as dead
    * by UTF-8 argument alone. What IS dead from a VARCHAR corpus is a
    * successful DECODE: the logical screen's color-table flag byte
    * needs bit 7 set, unreachable at that offset from any ASCII header
    * ImageIO would accept — every magic-bearing prose doc fails ImageIO
    * and lands in the stub branch, verified differentially on the
    * planted headers (decoded=false pinned in the oracle; a payload
    * that ever truly decodes mismatches loudly).
    */
  private def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Decode stage: binary → [[AssetMeta]] via `mapPartitions`, the shape a
    * real codec needs (per-partition init, streaming iterator, no
    * collect). PNG, JPEG and GIF payloads are HONESTLY decoded with the
    * JDK's pure-Java ImageIO readers (JPEG: baseline and progressive;
    * GIF: palette and transparency, first frame of an animation;
    * CMYK/exotic streams a reader rejects fall back to the stub): real
    * width/height/channels plus a digest of the materialized ARGB pixel
    * stream (`decoded = true`). Everything else takes the deterministic
    * stub branch (`decoded = false`), which is where the remaining
    * production codecs plug in. The driver's corpus is UTF-8 prose
    * (neither 0x89 nor 0xFF can start a UTF-8 string) and all-lowercase
    * (so the ASCII GIF magic never occurs — see [[isGif]]), so its
    * oracle sees only stub rows; the PNG/JPEG/GIF branches are
    * exercised on real crafted bytes with golden-pixel digests in
    * MultimodalSpec — the same split mm5/mm6 use for their header
    * parsers.
    */
  def decodeAssets(
      docs: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "text"): Dataset[AssetMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // a NULL payload has nothing to decode — the decode stage skips it
    // (upstream null-routing is V4's job, and the typed AssetMeta row is
    // all-primitive); the oracle carries the same IS NOT NULL predicate
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .filter(col(payloadCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Codec init once per partition: no ImageIO disk-cache tmp files
        // on executors, one digest instance reused across rows.
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        def hexOf(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        it.map { case (id, bytes) =>
          val contentMd5 = { md.reset(); hexOf(md.digest(bytes)) }
          val img =
            if (isPng(bytes) || isJpeg(bytes) || isGif(bytes))
              // NonFatal, not just IOException: ImageIO's JPEG reader
              // throws unchecked errors on exotic/corrupt streams (CMYK
              // without an embedded profile, truncated scans) — any
              // undecodable payload must land in the stub branch, never
              // kill the task
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
            else null
          if (img != null) {
            // row-major, big-endian ARGB — a deterministic pixel digest
            // regardless of the PNG's internal color model
            val w = img.getWidth
            val h = img.getHeight
            md.reset()
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val argb = img.getRGB(x, y)
                md.update((argb >>> 24).toByte)
                md.update((argb >>> 16).toByte)
                md.update((argb >>> 8).toByte)
                md.update(argb.toByte)
                x += 1
              }
              y += 1
            }
            AssetMeta(id, bytes.length.toLong, contentMd5,
              w, h, img.getColorModel.getNumComponents,
              decoded = true, pixel_md5 = hexOf(md.digest()))
          } else
            AssetMeta(
              doc_id = id,
              byte_len = bytes.length.toLong,
              content_md5 = contentMd5,
              width = (bytes.length % 64) + 16,
              height = (bytes.length / 7 % 64) + 16,
              channels = 3,
              decoded = false,
              pixel_md5 = null)
        }
      }
  }

  /** mm3 — frame sampling: treat the binary payload as a sequence of
    * fixed-size frames, keep every `stride`-th frame up to `maxFrames`
    * (the video/audio frame-sampling shape: bounded output per asset no
    * matter how large the payload). The "frame decode" is byte-slicing —
    * a real codec would replace the substring with a frame-seek inside
    * the same per-row expression or a [[decodeAssets]]-style
    * mapPartitions — but the sampling plumbing (index generation, stride,
    * cap, per-frame metadata schema) is real and oracle-checked.
    */
  def frameSample(
      docs: DataFrame,
      frameSize: Int = 32, stride: Int = 4, maxFrames: Int = 8): DataFrame = {
    // frame_md5 hashes the HEX RENDERING of the frame bytes, not the raw
    // bytes: a byte slice of UTF-8 text is not valid VARCHAR, and
    // DuckDB's md5 is VARCHAR-only — hex is the portable byte-faithful
    // fingerprint both engines can compute (found by the adversarial
    // replay: the old char-sliced oracle silently agreed on ASCII and
    // diverged on any multibyte doc). Frames themselves are BYTE frames
    // (octet offsets/lengths) — a frame sampler addresses bytes.
    val frames = expr(
      s"""transform(
         |  slice(filter(sequence(0, int(ceil(octet_length(bin) / ${frameSize}.0)) - 1),
         |               i -> i % $stride = 0 AND i * $frameSize < octet_length(bin)),
         |        1, $maxFrames),
         |  i -> struct(
         |    CAST(i AS BIGINT) AS frame_idx,
         |    CAST(octet_length(substring(bin, i * $frameSize + 1, $frameSize)) AS BIGINT) AS frame_len,
         |    md5(hex(substring(bin, i * $frameSize + 1, $frameSize))) AS frame_md5))""".stripMargin)
    docs
      .select(col("doc_id"), col("text").cast("binary").as("bin"))
      .select(col("doc_id"), explode(frames).as("f"))
      .select(col("doc_id"), col("f.frame_idx"), col("f.frame_len"), col("f.frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** mm4 — resize planning: map each asset's (stub-decoded) dimensions to
    * the target box preserving aspect ratio (the ML-preprocessing
    * fit-within-224×224 convention). Pure integer/double arithmetic over
    * mm1's metadata — in production the scale plan feeds the actual
    * resampler inside the decode mapPartitions.
    */
  def resizePlan(docs: DataFrame, target: Int = 224): DataFrame = {
    val w = col("stub_width")
    val h = col("stub_height")
    val scale = least(lit(target.toDouble) / w, lit(target.toDouble) / h)
    binaryMeta(docs)
      .select(col("doc_id"), w, h,
        floor(w * scale).cast("long").as("out_width"),
        floor(h * scale).cast("long").as("out_height"),
        graft.functions.r6(scale).as("scale"))
      .orderBy(col("doc_id"))
  }

  /** mm5 — REAL image-container header decode via the native
    * [[graft.functions.ImageHeader]] expression: format, pixel dimensions
    * and channels parsed from actual PNG/JPEG/GIF header bytes (public
    * format specs, no codec library) — the step that replaces mm1's stub
    * dimensions the moment genuine image payloads flow through the
    * binary column. Map-only, codegen'd, no shuffle.
    *
    * Over the driver's text corpus every payload is UTF-8 prose: the
    * PNG/JPEG magics are invalid UTF-8 lead bytes and can never occur, so
    * those branches are provably dead here and are exercised on crafted
    * real image bytes in MultimodalSpec; the GIF magic IS printable
    * ASCII, so the oracle replicates that branch (including the
    * little-endian dimension parse) and the catch-all.
    */
  def imageHeaders(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs
      .select(col("doc_id"), length(payload).cast("long").as("byte_len"),
        call_function("image_header", payload).as("hdr"))
      .select(col("doc_id"), col("byte_len"),
        col("hdr.format").as("format"), col("hdr.width").as("width"),
        col("hdr.height").as("height"), col("hdr.channels").as("channels"))
      .orderBy(col("doc_id"))
  }

  /** mm6 — REAL audio-container header decode via the native
    * [[graft.functions.WavHeader]] expression: channels, sample rate, bit
    * depth, PCM data size and an exact-integer duration parsed from
    * actual RIFF/WAVE chunk bytes (public format spec, no codec) — the
    * audio twin of mm5, covering the second modality the binary-column
    * plumbing carries. Map-only, codegen'd, no shuffle.
    *
    * Over the driver's text corpus the 'RIFF' magic never occurs (the
    * corpus is lowercase ASCII — verified zero uppercase bytes), so only
    * the unknown branch is reachable and the oracle replicates exactly
    * that, guarded by a LIKE so a changed corpus surfaces as a mismatch
    * instead of silently passing; the WAV branch (fmt/data chunk walk,
    * word alignment, truncation handling) is exercised on crafted real
    * WAV bytes in MultimodalSpec.
    */
  def wavHeaders(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs
      .select(col("doc_id"), length(payload).cast("long").as("byte_len"),
        call_function("wav_header", payload).as("hdr"))
      .select(col("doc_id"), col("byte_len"),
        col("hdr.format").as("format"), col("hdr.channels").as("channels"),
        col("hdr.sample_rate").as("sample_rate"),
        col("hdr.bits_per_sample").as("bits_per_sample"),
        col("hdr.data_bytes").as("data_bytes"),
        col("hdr.duration_ms").as("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** mm7 — REAL video-container header decode via the native
    * [[graft.functions.Mp4Header]] expression: major brand, movie
    * timescale and duration parsed from actual ISO-BMFF box bytes
    * (ISO/IEC 14496-12, no codec) — the video modality beside mm5's
    * images and mm6's audio, completing the triple. A 100 TB video-data
    * audit (drop clips shorter than a second, bucket by brand) reads
    * exactly these fields, map-only at scan throughput. Codegen'd, no
    * shuffle.
    *
    * Over the driver's text corpus the `ftyp` magic never occurs at
    * byte offset 4 (verified — and for any ASCII prose every box "size"
    * word reads ≥ 0x20202020 ≈ 539 MB, so no box walk can ever parse),
    * so only the unknown branch is reachable; the oracle replicates it
    * behind the mm6 LIKE-guard convention: a future magic-bearing doc
    * mismatches LOUDLY on the fields, and the side to extend is the
    * oracle. The real box walk (ftyp brands, largesize, v0/v1 mvhd,
    * corrupt extents) is exercised on crafted MP4 bytes in
    * MultimodalSpec.
    */
  def mp4Headers(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs
      .select(col("doc_id"), length(payload).cast("long").as("byte_len"),
        call_function("mp4_header", payload).as("hdr"))
      .select(col("doc_id"), col("byte_len"),
        col("hdr.format").as("format"),
        col("hdr.major_brand").as("major_brand"),
        col("hdr.timescale").as("timescale"),
        col("hdr.duration_units").as("duration_units"),
        col("hdr.duration_ms").as("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** os2 — the `binaryFile` SOURCE roundtrip: a bounded document prefix
    * staged as one raw file per asset ([[Tables.binaryAssets]]) and read
    * back through Spark's file-per-row binary source — the ingest path a
    * multimodal pipeline actually starts from (a directory tree of
    * image/audio/video files), completing the source matrix beside
    * parquet/CSV/JSON-lines/ORC: here a ROW is a FILE. Emitted per
    * asset: the id parsed from the file name, the scan's metadata
    * length, and the md5 of the scanned BYTES — so the oracle (which
    * hashes the ORIGINAL parquet text) gate-checks the entire
    * write-file → list → scan → hash chain bit-for-bit. Scale: the scan
    * parallelizes across files and prunes on metadata at listing time;
    * decode stages (mm2/mm5–mm7) compose directly on `content`.
    */
  def os2BinaryAssets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.binaryAssets(spark, sfDir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("byte_len"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))

  /** mm8 — REAL tensor-file header decode via the native
    * [[graft.functions.NpyHeader]] expression: dtype, memory order,
    * dimensionality and exact element count parsed from actual NPY
    * header bytes (NEP 1 / numpy format.py — no numpy needed). The
    * TENSOR modality beside mm5 images, mm6 audio, mm7 video:
    * embedding dumps and feature caches ship as `.npy`, and a 100 TB
    * tensor audit (wrong-dtype drop, shape bucketing, element
    * accounting) reads exactly these fields map-only at scan
    * throughput.
    *
    * Over the text corpus the `\\x93NUMPY` magic is UNREACHABLE in
    * principle: 0x93 is a UTF-8 continuation byte, so no valid string
    * can begin with it (the mm2/mm5 PNG argument) — the oracle is the
    * constant unknown branch, and the real header parse (v1/v2 length
    * fields, dict fields, 0-d/1-d/n-d shapes, truncation) is
    * spec-exercised on crafted NPY bytes in MultimodalSpec.
    */
  def npyHeaders(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs
      .select(col("doc_id"), length(payload).cast("long").as("byte_len"),
        call_function("npy_header", payload).as("hdr"))
      .select(col("doc_id"), col("byte_len"),
        col("hdr.format").as("format"),
        col("hdr.version").as("version"),
        col("hdr.dtype").as("dtype"),
        col("hdr.fortran_order").as("fortran_order"),
        size(col("hdr.shape")).cast("int").as("n_dims"),
        col("hdr.n_elems").as("n_elems"))
      .orderBy(col("doc_id"))
  }

  /** mm9 — REAL archive-container walk via the native
    * [[graft.functions.TarMembers]] expression: member/file counts,
    * payload mass and the first member name from actual USTAR header
    * blocks (POSIX.1-1988 layout) — the CONTAINER format beside the
    * per-asset headers: large multimodal training sets ship as tar
    * shards of samples (the WebDataset convention), and a 100 TB shard
    * audit (members per shard, payload accounting, corrupt-shard
    * detection) reads ONLY the 512-byte headers, skipping every
    * payload. Map-only, codegen'd, no shuffle.
    *
    * Over the benign corpus the `ustar` magic at byte offset 257 never
    * occurs; the real walk — octal sizes, 512-block rounding,
    * typeflags, zero-block termination, corrupt-header stop — is
    * exercised on crafted tar bytes in MultimodalSpec AND (r14)
    * differentially against the oracle's recursive-CTE mirror of the
    * same walk on the adversarial asset corpus's planted all-ASCII
    * tars (valid, bad-octal, and payload-overrun members).
    */
  def tarMembers(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs
      .select(col("doc_id"), length(payload).cast("long").as("byte_len"),
        call_function("tar_members", payload).as("hdr"))
      .select(col("doc_id"), col("byte_len"),
        col("hdr.format").as("format"),
        col("hdr.n_members").as("n_members"),
        col("hdr.n_files").as("n_files"),
        col("hdr.total_payload").as("total_payload"),
        col("hdr.first_name").as("first_name"))
      .orderBy(col("doc_id"))
  }

  /** mm10 — asset-store RECONCILIATION: full-outer join the staging
    * manifest (what the writer believes it staged: name + byte length,
    * [[Tables.assetManifest]]) against the `binaryFile` scan's metadata
    * (what Spark can actually list), and classify every asset:
    * `ok` (present, sizes agree), `size_mismatch` (present, truncated or
    * grown), `missing_from_scan` (in the manifest but invisible to the
    * scan — the zero-byte class Spark's file listing silently DROPS,
    * found by the adversarial-corpus run and until now only documented),
    * `unexpected_in_scan` (an orphan file no manifest row claims).
    *
    * This is the close-the-loop operator for the os2 posture ("a
    * pipeline that must account for every asset"): the scan alone can
    * never see what the listing dropped, so accounting REQUIRES the
    * manifest join. Scale: the scan side projects only (path, length) —
    * the binaryFile source prunes `content`, so no payload bytes are
    * read; both sides are file-count-scale metadata and the join keys
    * are unique per side. The registry oracle re-derives the verdict
    * from the source corpus under the pinned listing-drop contract
    * (empty/NULL text ⇒ `missing_from_scan`, else `ok`), so a hostile
    * corpus with empty docs hash-VERIFIES the catch; the orphan and
    * size-drift classes are exercised on planted fixtures in
    * `MultimodalSpec` and by tools/advassets.py tamper replays.
    */
  def assetReconcile(manifest: DataFrame, scan: DataFrame): DataFrame = {
    val scanMeta = scan.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
      col("length").as("scan_bytes"))
    manifest.join(scanMeta, Seq("file_name"), "full_outer")
      .select(col("file_name"), col("manifest_bytes"), col("scan_bytes"),
        when(col("manifest_bytes").isNull, lit("unexpected_in_scan"))
          .when(col("scan_bytes").isNull, lit("missing_from_scan"))
          .when(col("manifest_bytes") === col("scan_bytes"), lit("ok"))
          .otherwise(lit("size_mismatch")).as("status"))
      .orderBy(col("file_name"))
  }

  /** The mm10 registry instantiation over the os2 staged store. */
  def assetReconcileQ(spark: SparkSession, sfDir: String): DataFrame =
    assetReconcile(
      Tables.assetManifest(spark, sfDir),
      Tables.binaryAssets(spark, sfDir))

  /** mm11 — WEBDATASET sample ASSEMBLY: group a file-per-modality store
    * ([[Tables.wdSamples]] — `sample_%05d.{txt,cls,json}`) back into
    * training SAMPLES keyed by the basename stem, and report each
    * sample's modality inventory and completeness verdict — the
    * assembly step every multimodal dataloader runs before it can batch
    * (WebDataset's sample-grouping contract: files sharing a stem ARE
    * one sample). `complete` requires the payload (`.txt`) and the
    * metadata (`.json`); the label (`.cls`) is optional and simply
    * shows in the inventory. The `.txt` payload rides through as
    * (bytes, md5), so the verdict row also hash-gates the staged bytes
    * end-to-end (the os2 posture).
    *
    * Scale: one aggregate keyed by sample id — map-side combined, and
    * the only payload column that crosses the exchange is the bytes a
    * sample actually needs (binaryFile prunes `content` per-column
    * per-file). The honest 100 TB note: file-per-modality stores pay
    * this stem-group shuffle, which is exactly why WebDataset TARS
    * shards so sample parts sit ADJACENT in one stream — mm9's tar
    * enumeration is that layout's scan; this operator is the
    * un-tarred / re-shard path (and the audit that finds incomplete
    * samples BEFORE tarring).
    */
  def sampleAssembly(scan: DataFrame): DataFrame = {
    val assembled = scan.select(
        regexp_extract(col("path"), "sample_(\\d+)\\.[a-z]+$", 1)
          .cast("long").as("sample_id"),
        regexp_extract(col("path"), "\\.([a-z]+)$", 1).as("ext"),
        col("length").as("n_bytes"), col("content"))
      .groupBy(col("sample_id"))
      .agg(count(lit(1)).as("n_parts"),
        array_join(sort_array(collect_list(col("ext"))), ",").as("exts"),
        max(when(col("ext") === "txt", md5(col("content")))).as("txt_md5"),
        max(when(col("ext") === "txt", col("n_bytes"))).as("txt_bytes"),
        coalesce(max(when(col("ext") === "txt", lit(1))), lit(0)).as("has_txt"),
        coalesce(max(when(col("ext") === "json", lit(1))), lit(0)).as("has_json"))
    assembled
      .select(col("sample_id"), col("n_parts"), col("exts"),
        col("txt_md5"), col("txt_bytes"),
        (col("has_txt") === 1 && col("has_json") === 1).as("complete"))
      .orderBy(col("sample_id"))
  }

  def sampleAssemblyQ(spark: SparkSession, sfDir: String): DataFrame =
    sampleAssembly(Tables.wdSamples(spark, sfDir))

  /** mm12 — the TAR-PATH twin of [[sampleAssembly]]: the same per-sample
    * completeness verdict computed from the tarred WebDataset SHARD
    * ([[Tables.wdTarShard]] — the same fixtures mm11 assembles from the
    * un-tarred store) via the `tar_samples` expression, which walks the
    * shard's USTAR members and assembles stems IN PLACE. This closes
    * mm11's honest 100 TB loop: mm11's scaladoc notes the
    * file-per-modality layout pays a stem-group SHUFFLE and that
    * WebDataset tars shards so parts sit adjacent — this operator
    * proves the tar path really can replace that shuffle: a map-only
    * `binaryFile` scan (parallelism = shard count), zero exchanges
    * before the output sort, and the SAME oracle text as mm11
    * (hash-gated equivalence of the two paths, including the `.txt`
    * payload md5s — the bytes survived staging, tarring, scanning and
    * the in-expression walk unchanged). The completeness POLICY
    * (txt ∧ json) stays here in the query; the expression only reports
    * the inventory.
    */
  def tarAssemblyQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.wdTarShard(spark, sfDir)
      // tar_samples returns NULL for an out-of-scope (PAX/GNU) shard;
      // exploding a NULL would silently drop the whole shard from the
      // assembly, so coalesce it into a raise_error naming the shard —
      // out-of-scope input fails the query, never thins its output.
      .select(explode(coalesce(
        call_function("tar_samples", col("content")),
        raise_error(concat(lit("tar_samples: out-of-scope PAX/GNU shard "),
          col("path"))))).as("s"))
      .select(
        regexp_extract(col("s.stem"), "sample_(\\d+)$", 1)
          .cast("long").as("sample_id"),
        col("s.n_parts"), col("s.exts"), col("s.txt_md5"), col("s.txt_bytes"),
        (array_contains(split(col("s.exts"), ","), "txt") &&
          array_contains(split(col("s.exts"), ","), "json")).as("complete"))
      .orderBy(col("sample_id"))

  /** mm13 shard byte budget — single source for the engine default AND
    * the generated oracle literal (the Mm11SampleCount pattern). Sized
    * so the staged fixture packs into a handful of shards; production
    * values are the usual 100 MB–1 GB.
    */
  val Mm13ShardBudget: Long = 4096L

  /** mm13 — WebDataset RE-SHARD planner: assign every sample of a
    * file-per-modality store to a byte-budgeted shard — the plan the
    * tar writer ([[Tables.wdTarShard]]'s production form) consumes, and
    * the missing step between mm11 (audit the un-tarred store) and mm12
    * (scan the tarred shard): shard = exclusive running byte total ÷
    * budget over samples in id order, whole-sample semantics (a sample
    * never splits across shards — sa9's posture for training docs).
    *
    * Scale: per-sample byte totals are mm11's aggregation grain; the
    * running total is sa6's DISTRIBUTED two-phase prefix sum keyed on a
    * sample-id span (per-span sums map-side combined; the offset window
    * sees only the bounded span grid; the intra cumsum partitions by
    * span) — never a global-window sort over the catalog. The oracle IS
    * the naive global cumsum.
    */
  def shardPlan(scan: DataFrame, budgetBytes: Long = Mm13ShardBudget,
      buckets: Int = 64): DataFrame = {
    val sizes = scan.select(
        regexp_extract(col("path"), "sample_(\\d+)\\.[a-z]+$", 1)
          .cast("long").as("sample_id"),
        col("length").as("b"))
      .groupBy(col("sample_id")).agg(sum(col("b")).as("n_bytes"))
    val span = sizes.agg((floor(max(col("sample_id")) / buckets) + 1)
      .cast("long").as("span"))
    val bucketed = sizes.crossJoin(broadcast(span))
      .withColumn("bk", expr("sample_id div span"))
    val offW = Window.orderBy(col("bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bk")).agg(sum(col("n_bytes")).as("bw"))
      .withColumn("off", coalesce(sum(col("bw")).over(offW), lit(0L)))
      .select(col("bk"), col("off"))
    val intra = Window.partitionBy(col("bk")).orderBy(col("sample_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("bk"))
      .withColumn("excl",
        col("off") + coalesce(sum(col("n_bytes")).over(intra), lit(0L)))
      .select(col("sample_id"), col("n_bytes"),
        expr(s"excl div $budgetBytes").as("shard_id"))
      .orderBy(col("sample_id"))
  }

  def shardPlanQ(spark: SparkSession, sfDir: String): DataFrame =
    shardPlan(Tables.wdSamples(spark, sfDir))

  /** mm14 — IMAGE near-duplicate pairs over the binary payload column:
    * the multimodal member of the dedup family (dd1 exact, dd4/dd15
    * MinHash, dd5 SimHash, dd6 embedding — all TEXT/vector; training
    * pipelines dedup their image sides too, and re-encoded/resized
    * copies defeat exact hashing). Recipe: a 60-bit perceptual
    * fingerprint per payload via the native `phash60p` expression
    * ([[graft.functions.PHash60]] with `perceptual = true`, r19):
    * payloads that genuinely DECODE as images (PNG/JPEG/GIF/BMP via the
    * JDK's deterministic ImageIO readers — mm2's decode) hash the
    * coarse-grid intensity bits of the decoded LUMA plane, so a
    * re-encoded copy of the same picture (different compression ⇒
    * different bytes) lands at Hamming 0 — the class the operator is
    * named for, gated on real re-encoded images in MultimodalSpec.
    * Undecodable payloads take the integer-exact byte-segment compute
    * (oracle-twinnable bit-for-bit — the only branch reachable from a
    * UTF-8 prose corpus, which is what keeps the registry query
    * hash-gated). Then EXACTLY the dd5b machinery: radius-3 pigeonhole
    * banding, bucket posting lists, `Dd5MaxBucket`-capped hub-and-spoke
    * pair emission, exact Hamming verify — the banding is
    * signature-agnostic, so the image pipeline inherits the proven
    * scale posture (banded/bucketed, never all-pairs; bounded output on
    * megaclusters) without new machinery. Payloads under 60 bytes carry
    * no signature (NULL phash) and are routed out — exact-hash dedup
    * (dd1) owns them.
    */
  def phashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.bandedHammingPairsCapped(
      docs.select(col("doc_id"),
          call_function("phash60p", col("text").cast("binary")).as("sig"))
        .filter(col("sig").isNotNull),
      maxHamming, Dedup.Dd5MaxBucket, "phashNearDups")

  /** mm14's registry doc_id offset for the derived near-copies — one
    * literal shared with the generated oracle text (the dd18 pattern).
    */
  val PhashPerturbOffset = 10000000L

  /** The byte-stream PHash60 re-derivation as SQL CTEs over a prior CTE
    * named `corpus(doc_id, text)` — pb/pv/pseg/ptot/sig, ending in
    * `sig(doc_id, sig)`. ONE text shared by mm14's oracle and the
    * streaming door's (st27), so the two can never drift on what the
    * signature is. Exact on any corpus where phash60p's decode branch is
    * dead (every oracle corpus — see the mm14 oracle comment).
    */
  private[graft] val PhashSigCtesSql: String =
    s"""pb AS (SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS L
       |  FROM corpus WHERE octet_length(encode(text)) >= 60
       |    AND octet_length(encode(text)) <= 150000000),
       |pv AS (SELECT doc_id, L, (j * 60) // L AS s,
       |    ('0x' || substring(hx, CAST(2 * j + 1 AS BIGINT), 2))::BIGINT AS v
       |  FROM (SELECT doc_id, hx, L,
       |          unnest(generate_series(0, L - 1)) AS j FROM pb)),
       |pseg AS (SELECT doc_id, L, s,
       |    sum(v) AS segsum, count(*) AS seglen
       |  FROM pv GROUP BY 1, 2, 3),
       |ptot AS (SELECT doc_id, sum(segsum) AS total FROM pseg GROUP BY 1),
       |sig AS MATERIALIZED (SELECT g.doc_id,
       |    CAST(sum(CASE WHEN g.segsum * g.L > t.total * g.seglen
       |      THEN (1::BIGINT << CAST(g.s AS INTEGER)) ELSE 0 END) AS BIGINT) AS sig
       |  FROM pseg g JOIN ptot t USING (doc_id) GROUP BY g.doc_id)""".stripMargin

  /** The mm14 registry instantiation: the driver corpus is benign prose
    * with no natural perceptual near-dups (the raw operator emits zero
    * pairs on it — a vacuous gate), so the query runs over the corpus
    * UNION its deterministically-derived near-copies (first character
    * replaced by 'Z' at doc_id + [[PhashPerturbOffset]] — the dd18
    * one-corpus-two-snapshots derivation): a one-byte perturbation is
    * exactly the re-encoded-copy class the operator exists to catch, so
    * most (original, copy) pairs land within the radius and the
    * banding/cap/verify pipeline is gated on REAL matches. The oracle
    * applies the identical derivation; a real deployment passes its
    * asset frame to [[phashNearDups]] directly.
    */
  def phashNearDupsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val copies = docs.select(
      (col("doc_id") + PhashPerturbOffset).as("doc_id"),
      concat(lit("Z"), expr("substring(text, 2)")).as("text"))
    phashNearDups(docs.unionAll(copies))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm14_phash_neardup" -> (phashNearDupsQ _),
    "mm13_shard_plan" -> (shardPlanQ _),
    "mm12_tar_assembly" -> (tarAssemblyQ _),
    "mm11_sample_assembly" -> (sampleAssemblyQ _),
    "mm10_asset_reconcile" -> (assetReconcileQ _),
    "mm9_tar_members" -> ((s: SparkSession, d: String) =>
      tarMembers(Tables.documents(s, d))),
    "mm8_npy_headers" -> ((s: SparkSession, d: String) =>
      npyHeaders(Tables.documents(s, d))),
    "os2_binary_assets" -> (os2BinaryAssets _),
    "mm7_mp4_headers" -> ((s: SparkSession, d: String) =>
      mp4Headers(Tables.documents(s, d))),
    "mm6_wav_headers" -> ((s: SparkSession, d: String) =>
      wavHeaders(Tables.documents(s, d))),
    "mm5_image_headers" -> ((s: SparkSession, d: String) =>
      imageHeaders(Tables.documents(s, d))),
    "mm1_binary_meta" -> ((s: SparkSession, d: String) => binaryMeta(Tables.documents(s, d))),
    // mm2 exercises the mapPartitions decode path end-to-end (real
    // ImageIO pixel decode for PNG payloads, deterministic stub for the
    // rest — both branches deterministic, so fully oracle-checkable).
    "mm2_decode_assets" -> ((s: SparkSession, d: String) =>
      decodeAssets(Tables.documents(s, d)).toDF().orderBy(col("doc_id"))),
    "mm3_frame_sample" -> ((s: SparkSession, d: String) =>
      frameSample(Tables.documents(s, d))),
    "mm4_resize_plan" -> ((s: SparkSession, d: String) =>
      resizePlan(Tables.documents(s, d))))

  /** The ONE per-sample verdict oracle both assembly paths must match:
    * re-derives every sample's part inventory from the source corpus
    * under the shared staging constants and skip rules (drop mods; the
    * no-bytes-no-file contract), so mm11 (un-tarred store, stem-group
    * aggregation) and mm12 (tarred shard, in-expression walk) are
    * hash-gated against the SAME text — the two physical paths cannot
    * drift from each other without one of them failing verify.
    */
  private val SampleVerdictSql: String =
    s"""WITH d AS (SELECT doc_id, text, lang FROM documents
       |           WHERE doc_id < ${Tables.Mm11SampleCount}),
       |parts AS (
       |  SELECT doc_id, 'txt' AS ext, md5(text) AS m,
       |    octet_length(encode(text)) AS b FROM d
       |    WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
       |  UNION ALL SELECT doc_id, 'cls', CAST(NULL AS VARCHAR), NULL
       |    FROM d WHERE doc_id % ${Tables.Mm11ClsDropMod} != ${Tables.Mm11ClsDropRem}
       |      AND lang IS NOT NULL AND octet_length(encode(lang)) > 0
       |  UNION ALL SELECT doc_id, 'json', CAST(NULL AS VARCHAR), NULL
       |    FROM d WHERE doc_id % ${Tables.Mm11JsonDropMod} != ${Tables.Mm11JsonDropRem})
       |SELECT doc_id AS sample_id, count(*) AS n_parts,
       |  array_to_string(list_sort(list(ext)), ',') AS exts,
       |  max(m) AS txt_md5, CAST(max(b) AS BIGINT) AS txt_bytes,
       |  (max(CASE WHEN ext = 'txt' THEN 1 ELSE 0 END) = 1
       |    AND max(CASE WHEN ext = 'json' THEN 1 ELSE 0 END) = 1) AS complete
       |FROM parts GROUP BY doc_id ORDER BY sample_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // mm14: re-derives the BYTE-STREAM PHash60 signature DECLARATIVELY.
    // The engine runs `phash60p`, whose decoded-luma branch is PROVABLY
    // dead on a UTF-8 prose corpus (0x89/0xFF can't start UTF-8; the
    // ASCII GIF/BMP magics never ImageIO-decode from prose — the pinned
    // mm2 differential), so on every oracle corpus phash60p ≡ phash60
    // and this SQL stays bit-exact; the decode branch is gated on real
    // re-encoded images in MultimodalSpec instead. Bytes via
    // the hex rendering of the UTF-8 payload (hex chars are ASCII, so
    // VARCHAR substring positions are byte positions — the mm3 lesson),
    // segment-of-byte via the same floor(j*60/L) map, the bit via the
    // same cross-multiplied integer mean compare, then dd5b's banding/
    // cap/verify SQL verbatim from the SHARED band literals
    // (simhashBandsSql) and the SHARED Dd5MaxBucket — both engines
    // regenerate every constant, so a scheme retune regenerates both
    // sides. Payloads under 60 bytes are excluded in both engines.
    "mm14_phash_neardup" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + $PhashPerturbOffset,
         |    'Z' || substring(text, 2) FROM documents),
         |$PhashSigCtesSql,
         |bands(b, oi, oj) AS (VALUES ${Dedup.simhashBandsSql}),
         |bk AS MATERIALIZED (SELECT s.doc_id, s.sig,
         |    CAST(b.b AS BIGINT) * 16777216
         |      + ((s.sig >> b.oi) & 4095) * 4096
         |      + ((s.sig >> b.oj) & 4095) AS key
         |  FROM sig s CROSS JOIN bands b),
         |grp AS MATERIALIZED (SELECT key, count(*) AS n, min(doc_id) AS hub
         |  FROM bk GROUP BY key HAVING count(*) > 1),
         |pairs AS MATERIALIZED (SELECT DISTINCT doc_a, doc_b FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.key = b.key AND a.doc_id < b.doc_id
         |  JOIN grp g ON g.key = a.key
         |  WHERE g.n <= ${Dedup.Dd5MaxBucket}
         |  UNION ALL
         |  SELECT g.hub AS doc_a, b.doc_id AS doc_b
         |  FROM grp g JOIN bk b ON b.key = g.key AND b.doc_id > g.hub
         |  WHERE g.n > ${Dedup.Dd5MaxBucket}))
         |SELECT p.doc_a, p.doc_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM pairs p JOIN sig a ON a.doc_id = p.doc_a
         |             JOIN sig b ON b.doc_id = p.doc_b
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the mm6 convention, EXTENDED (r14, forced by the adversarial
    // asset corpus planting real all-ASCII tars): the guard mirrors the
    // engine's classification (512-byte minimum + `ustar` magic at byte
    // offset 257, inside an ASCII-verified prefix so char positions ARE
    // byte positions), and for a classified archive whose WHOLE text is
    // ASCII (octet_length = length, so every offset the walk touches is
    // a byte offset) the member walk itself is mirrored as a recursive
    // CTE — the same stop rules as TarMembers.compute: zero lead byte
    // ends the archive, a non-ustar or bad-octal header stops with
    // counts kept, a member whose payload overruns EOF is still
    // counted. The octal field regexp is the engine's parse (leading
    // space/NUL skipped, digits, first space/NUL after digits
    // terminates, any other byte invalidates). A tar-classified doc
    // with non-ASCII bytes beyond the prefix keeps NULL fields and
    // mismatches LOUDLY — that remains the extend-this-oracle class.
    "mm9_tar_members" ->
      """WITH RECURSIVE m AS (SELECT doc_id, text,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  octet_length(encode(text)) >= 512
        |    AND length(text) >= 262
        |    AND octet_length(encode(substring(text, 1, 262))) = 262
        |    AND substring(text, 258, 5) = 'ustar' AS is_tar,
        |  octet_length(encode(text)) = length(text) AS is_ascii
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |    CAST(0 AS BIGINT) AS off, 0 AS members, 0 AS files,
        |    CAST(0 AS BIGINT) AS payload,
        |    CAST(NULL AS VARCHAR) AS first_name, false AS done
        |  FROM m WHERE is_tar AND is_ascii
        |  UNION ALL
        |  SELECT doc_id, text, n,
        |    CASE WHEN hdr_ok AND step <= n - off THEN off + step ELSE off END,
        |    members + CASE WHEN hdr_ok THEN 1 ELSE 0 END,
        |    files + CASE WHEN hdr_ok AND is_file THEN 1 ELSE 0 END,
        |    payload + CASE WHEN hdr_ok AND is_file THEN sz ELSE 0 END,
        |    CASE WHEN hdr_ok AND first_name IS NULL THEN nm ELSE first_name END,
        |    NOT coalesce(hdr_ok AND step <= n - off, false) AS done
        |  FROM (
        |    SELECT *, (magic_ok AND sz IS NOT NULL) AS hdr_ok,
        |      CASE WHEN sz IS NOT NULL
        |        THEN 512 + 512 * ((sz + 511) // 512) END AS step
        |    FROM (
        |      SELECT *,
        |        (off + 512 <= n AND substring(text, off + 1, 1) != chr(0)
        |          AND off + 263 <= n
        |          AND substring(text, off + 258, 5) = 'ustar') AS magic_ok,
        |        CASE WHEN regexp_extract(substring(text, off + 125, 12),
        |               '^[ ' || chr(0) || ']*([0-7]+)($|[ ' || chr(0) || '].*)', 1) = ''
        |          THEN NULL
        |          ELSE list_reduce(list_transform(string_split(
        |            regexp_extract(substring(text, off + 125, 12),
        |              '^[ ' || chr(0) || ']*([0-7]+)($|[ ' || chr(0) || '].*)', 1), ''),
        |            x -> CAST(x AS BIGINT)), (a, b) -> a * 8 + b) END AS sz,
        |        substring(text, off + 157, 1) IN ('0', chr(0)) AS is_file,
        |        regexp_extract(substring(text, off + 1, 100),
        |          '^[^' || chr(0) || ']*') AS nm
        |      FROM w WHERE NOT done) a) b),
        |r AS (SELECT doc_id, members, files, payload, first_name
        |      FROM w WHERE done)
        |SELECT m.doc_id, m.byte_len,
        |  CASE WHEN m.text IS NULL THEN CAST(NULL AS VARCHAR)
        |       WHEN m.is_tar THEN 'tar' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN m.is_tar THEN r.members END AS INTEGER) AS n_members,
        |  CAST(CASE WHEN m.is_tar THEN r.files END AS INTEGER) AS n_files,
        |  CAST(CASE WHEN m.is_tar THEN r.payload END AS BIGINT) AS total_payload,
        |  CASE WHEN m.is_tar THEN r.first_name END AS first_name
        |FROM m LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,
    // the NPY magic byte 0x93 is a UTF-8 CONTINUATION byte — no valid
    // string starts with it, so over a VARCHAR corpus only the unknown
    // branch is reachable in principle (the mm2/mm5 PNG argument; no
    // LIKE guard can even express the magic). The real parse is
    // spec-exercised on crafted bytes in MultimodalSpec.
    "mm8_npy_headers" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CASE WHEN text IS NULL THEN CAST(NULL AS VARCHAR)
        |       ELSE 'unknown' END AS format,
        |  CAST(NULL AS VARCHAR) AS version,
        |  CAST(NULL AS VARCHAR) AS dtype,
        |  CAST(NULL AS BOOLEAN) AS fortran_order,
        |  CAST(NULL AS INTEGER) AS n_dims,
        |  CAST(NULL AS BIGINT) AS n_elems
        |FROM documents ORDER BY doc_id""".stripMargin,
    // hashes the ORIGINAL parquet text for the staged id prefix — a
    // match proves the file export + binaryFile scan were byte-exact.
    // The non-empty predicate mirrors Spark's pinned listing-drop
    // contract: a zero-byte asset never reaches the scan (mm10 is
    // where it surfaces), so the oracle must not expect its row
    "os2_binary_assets" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |  md5(text) AS content_md5
         |FROM documents WHERE doc_id < ${Tables.Os2AssetCount}
         |  AND coalesce(octet_length(encode(text)), 0) > 0
         |ORDER BY doc_id""".stripMargin,
    // the staged fixture is non-empty by construction, so the truthful
    // reconciliation is all-'ok' with manifest == scan == UTF-8 byte
    // length of the source text; the engine computes it from the REAL
    // manifest file and the REAL binaryFile listing, so any staging or
    // listing defect (dropped file, truncation, orphan) hash-mismatches
    // loudly. The degenerate statuses are spec-exercised on planted
    // fixtures (MultimodalSpec) — DuckDB cannot list Spark's scan.
    // the staged store is DERIVED from the documents prefix by the
    // shared drop rules, so the oracle re-derives each sample's part
    // list from the same constants; md5(varchar) hashes the UTF-8
    // rendering, matching the engine's md5 over the staged bytes
    "mm11_sample_assembly" -> SampleVerdictSql,
    // re-derives each STAGED file's byte size from the source corpus
    // under the shared drop/skip rules — including the .json payload's
    // rendered length (escape arithmetic: +1 byte per quote/backslash,
    // +5 per control char the writer renders as a 6-byte \uXXXX) — then
    // the NAIVE global exclusive cumsum the distributed two-phase plan
    // must reproduce (prototyped byte-exact against the real staged
    // store before wiring)
    "mm13_shard_plan" ->
      s"""WITH d AS (SELECT doc_id, text, lang, source FROM documents
         |           WHERE doc_id < ${Tables.Mm11SampleCount}),
         |parts AS (
         |  SELECT doc_id, octet_length(encode(text)) AS b FROM d
         |    WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
         |  UNION ALL SELECT doc_id, octet_length(encode(lang))
         |    FROM d WHERE doc_id % ${Tables.Mm11ClsDropMod} != ${Tables.Mm11ClsDropRem}
         |      AND lang IS NOT NULL AND octet_length(encode(lang)) > 0
         |  UNION ALL SELECT doc_id,
         |    octet_length(encode('{"doc_id":' || CAST(doc_id AS VARCHAR)
         |      || ',"source":""}'))
         |    + octet_length(encode(coalesce(source, '')))
         |    + (length(coalesce(source, ''))
         |       - length(replace(coalesce(source, ''), '"', '')))
         |    + (length(coalesce(source, ''))
         |       - length(replace(coalesce(source, ''), '\\', '')))
         |    + 5 * (length(coalesce(source, ''))
         |       - length(regexp_replace(coalesce(source, ''),
         |           '[\\x00-\\x1f]', '', 'g')))
         |    FROM d WHERE doc_id % ${Tables.Mm11JsonDropMod} != ${Tables.Mm11JsonDropRem}),
         |sz AS (SELECT doc_id AS sample_id, CAST(sum(b) AS BIGINT) AS n_bytes
         |       FROM parts GROUP BY doc_id)
         |SELECT sample_id, n_bytes,
         |  CAST(coalesce(SUM(n_bytes) OVER (ORDER BY sample_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    // ${Mm13ShardBudget} AS BIGINT) AS shard_id
         |FROM sz ORDER BY sample_id""".stripMargin,
    // the SAME text, verbatim: mm12 is the tar-path twin of mm11 over
    // the same fixtures — sharing one oracle string IS the hash-gated
    // equivalence claim (neither path can drift from the other)
    "mm12_tar_assembly" -> SampleVerdictSql,
    // re-derives the full-outer verdict from the source corpus: every
    // staged doc has a manifest row (NULL text stages as 0 bytes); a
    // scan row exists iff the asset has bytes (the pinned listing-drop
    // contract) — so on a hostile corpus with empty docs the oracle
    // VERIFIES the reconcile catches exactly the dropped class
    "mm10_asset_reconcile" ->
      s"""SELECT printf('doc_%05d.bin', doc_id) AS file_name,
         |  CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT)
         |    AS manifest_bytes,
         |  CASE WHEN coalesce(octet_length(encode(text)), 0) > 0
         |    THEN CAST(octet_length(encode(text)) AS BIGINT) END
         |    AS scan_bytes,
         |  CASE WHEN coalesce(octet_length(encode(text)), 0) > 0
         |    THEN 'ok' ELSE 'missing_from_scan' END AS status
         |FROM documents WHERE doc_id < ${Tables.Os2AssetCount}
         |ORDER BY file_name""".stripMargin,
    // the mm5/mm6 convention: the guard mirrors the engine's FULL
    // classification test (ftyp four-character-code at byte offset 4,
    // inside a 12-byte ASCII-verified prefix so char positions ARE byte
    // positions); major_brand mirrors the engine's printable-ASCII rule.
    // timescale/duration stay NULL for ANY ASCII prose by construction:
    // every box-size word the walk would read is >= 0x20202020 (~539 MB)
    // > byte_len, so no moov/mvhd can ever parse — a doc that defeats
    // this is binary, outside VARCHAR's domain, and the box walk is
    // spec-exercised on real bytes in MultimodalSpec
    "mm7_mp4_headers" ->
      """WITH m AS (SELECT doc_id, text,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  length(text) >= 12
        |    AND octet_length(encode(substring(text, 1, 12))) = 12
        |    AND substring(text, 5, 4) = 'ftyp' AS is_mp4
        |  FROM documents)
        |SELECT doc_id, byte_len,
        |  CASE WHEN text IS NULL THEN CAST(NULL AS VARCHAR)
        |       WHEN is_mp4 THEN 'mp4' ELSE 'unknown' END AS format,
        |  CASE WHEN is_mp4
        |      AND ascii(substring(text, 9, 1)) BETWEEN 32 AND 126
        |      AND ascii(substring(text, 10, 1)) BETWEEN 32 AND 126
        |      AND ascii(substring(text, 11, 1)) BETWEEN 32 AND 126
        |      AND ascii(substring(text, 12, 1)) BETWEEN 32 AND 126
        |    THEN substring(text, 9, 4) ELSE CAST(NULL AS VARCHAR) END
        |    AS major_brand,
        |  CAST(NULL AS INTEGER) AS timescale,
        |  CAST(NULL AS BIGINT) AS duration_units,
        |  CAST(NULL AS BIGINT) AS duration_ms
        |FROM m ORDER BY doc_id""".stripMargin,
    // The corpus is VARCHAR (valid UTF-8): PNG's 0x89 and JPEG's 0xFF are
    // continuation/invalid lead bytes that cannot start a UTF-8 string,
    // so only the (printable-ASCII) GIF branch and the unknown catch-all
    // are reachable. The oracle's GIF branch is scoped to a 10-char,
    // 10-BYTE prefix — the domain where character positions ARE byte
    // positions, so ascii() equals the byte value the engine reads.
    // DuckDB VARCHAR has no byte indexing, so a text doc whose GIF magic
    // is followed by non-ASCII within the dimension chars is outside the
    // oracle's expressible domain (the engine reads its UTF-8 encoding
    // bytes; the driver corpus is all-ASCII and cannot produce it).
    // PNG/JPEG parsing is spec-verified on real bytes in MultimodalSpec.
    // the guard mirrors the engine's FULL 12-byte magic (RIFF....WAVE
    // inside an ASCII-verified prefix so char positions ARE byte
    // positions), and — r14, forced by the adversarial asset corpus
    // planting a real all-ASCII PCM header — the fmt/data CHUNK WALK is
    // mirrored as a recursive CTE for all-ASCII payloads: the same
    // rules as WavHeader.compute (little-endian fields via ascii(),
    // chunk word-alignment pad, overrun-chunk stop, walk ends once both
    // fmt and data are seen, sample_rate > INT32_MAX degrades to NULL,
    // duration = data_bytes·1000 / byte_rate integer division). A
    // wav-classified doc with non-ASCII bytes keeps NULL fields and
    // mismatches loudly — the extend-this-oracle class
    "mm6_wav_headers" ->
      """WITH RECURSIVE m AS (SELECT doc_id, text,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  length(text) >= 12
        |    AND octet_length(encode(substring(text, 1, 12))) = 12
        |    AND substring(text, 1, 4) = 'RIFF'
        |    AND substring(text, 9, 4) = 'WAVE' AS is_wav,
        |  octet_length(encode(text)) = length(text) AS is_ascii
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |    CAST(12 AS BIGINT) AS i,
        |    CAST(NULL AS INTEGER) AS channels,
        |    CAST(NULL AS INTEGER) AS sample_rate,
        |    CAST(NULL AS INTEGER) AS bits, CAST(0 AS BIGINT) AS byte_rate,
        |    CAST(NULL AS BIGINT) AS data_bytes, false AS done
        |  FROM m WHERE is_wav AND is_ascii
        |  UNION ALL
        |  SELECT doc_id, text, n,
        |    CASE WHEN can_read THEN
        |      CASE WHEN sz + (sz % 2) > n - i - 8 THEN n
        |           ELSE i + 8 + sz + (sz % 2) END
        |      ELSE i END,
        |    CASE WHEN can_read AND is_fmt
        |      THEN CAST(ascii(substring(text, i + 11, 1))
        |        + 256 * ascii(substring(text, i + 12, 1)) AS INTEGER)
        |      ELSE channels END,
        |    CASE WHEN can_read AND is_fmt THEN
        |      CASE WHEN sr <= 2147483647 THEN CAST(sr AS INTEGER) END
        |      ELSE sample_rate END,
        |    CASE WHEN can_read AND is_fmt
        |      THEN CAST(ascii(substring(text, i + 23, 1))
        |        + 256 * ascii(substring(text, i + 24, 1)) AS INTEGER)
        |      ELSE bits END,
        |    CASE WHEN can_read AND is_fmt THEN br ELSE byte_rate END,
        |    CASE WHEN can_read AND substring(text, i + 1, 4) = 'data'
        |      THEN sz ELSE data_bytes END,
        |    NOT can_read AS done
        |  FROM (
        |    SELECT *,
        |      substring(text, i + 1, 4) = 'fmt '
        |        AND sz >= 16 AND i + 24 <= n AS is_fmt,
        |      ascii(substring(text, i + 13, 1))
        |        + 256 * ascii(substring(text, i + 14, 1))
        |        + 65536 * ascii(substring(text, i + 15, 1))
        |        + 16777216 * ascii(substring(text, i + 16, 1)) AS sr,
        |      ascii(substring(text, i + 17, 1))
        |        + 256 * ascii(substring(text, i + 18, 1))
        |        + 65536 * ascii(substring(text, i + 19, 1))
        |        + 16777216 * ascii(substring(text, i + 20, 1)) AS br
        |    FROM (
        |      SELECT *,
        |        i + 8 <= n AND (channels IS NULL OR data_bytes IS NULL)
        |          AS can_read,
        |        ascii(substring(text, i + 5, 1))
        |          + 256 * ascii(substring(text, i + 6, 1))
        |          + 65536 * ascii(substring(text, i + 7, 1))
        |          + 16777216 * ascii(substring(text, i + 8, 1)) AS sz
        |      FROM w WHERE NOT done) a) b),
        |r AS (SELECT doc_id, channels, sample_rate, bits, byte_rate,
        |        data_bytes
        |      FROM w WHERE done)
        |SELECT m.doc_id, m.byte_len,
        |  CASE WHEN m.text IS NULL THEN CAST(NULL AS VARCHAR)
        |       WHEN m.is_wav THEN 'wav' ELSE 'unknown' END AS format,
        |  CASE WHEN m.is_wav THEN r.channels END AS channels,
        |  CASE WHEN m.is_wav THEN r.sample_rate END AS sample_rate,
        |  CASE WHEN m.is_wav THEN r.bits END AS bits_per_sample,
        |  CAST(CASE WHEN m.is_wav THEN r.data_bytes END AS BIGINT)
        |    AS data_bytes,
        |  CAST(CASE WHEN m.is_wav AND r.data_bytes IS NOT NULL
        |         AND r.byte_rate > 0
        |       THEN r.data_bytes * 1000 // r.byte_rate END AS BIGINT)
        |    AS duration_ms
        |FROM m LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,
    "mm5_image_headers" ->
      """WITH m AS (SELECT doc_id, text,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  length(text) >= 10
        |    AND octet_length(encode(substring(text, 1, 10))) = 10
        |    AND (text LIKE 'GIF87a%' OR text LIKE 'GIF89a%') AS is_gif
        |  FROM documents)
        |SELECT doc_id, byte_len,
        |  CASE WHEN text IS NULL THEN CAST(NULL AS VARCHAR)
        |       WHEN is_gif THEN 'gif' ELSE 'unknown' END AS format,
        |  CASE WHEN is_gif THEN CAST(ascii(substring(text, 7, 1))
        |         + 256 * ascii(substring(text, 8, 1)) AS INTEGER)
        |       ELSE CAST(NULL AS INTEGER) END AS width,
        |  CASE WHEN is_gif THEN CAST(ascii(substring(text, 9, 1))
        |         + 256 * ascii(substring(text, 10, 1)) AS INTEGER)
        |       ELSE CAST(NULL AS INTEGER) END AS height,
        |  CAST(NULL AS INTEGER) AS channels
        |FROM m ORDER BY doc_id""".stripMargin,
    "mm1_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CAST(octet_length(encode(text)) % 64 + 16 AS BIGINT) AS stub_width,
        |  CAST(octet_length(encode(text)) // 7 % 64 + 16 AS BIGINT) AS stub_height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // decoded = FALSE for every row: neither PNG's 0x89 nor JPEG's
    // 0xFF lead byte can occur in UTF-8, and a GIF-MAGIC doc (plantable
    // in prose — the adversarial asset corpus does) still cannot carry
    // a decodable image, because the logical-screen's color-table flag
    // byte needs bit 7 set, unreachable at that byte offset from any
    // ASCII header ImageIO would accept — every magic-bearing prose doc
    // fails ImageIO and lands in the stub branch (decoded false),
    // verified differentially on the planted GIF headers. A payload
    // that ever DOES decode mismatches LOUDLY here, and that is the
    // signal to extend this oracle. The real ImageIO PNG/JPEG/GIF
    // branches are golden-pixel-tested in MultimodalSpec. NULL payloads
    // are skipped by the decode stage on both sides.
    "mm2_decode_assets" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CAST(octet_length(encode(text)) % 64 + 16 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) // 7 % 64 + 16 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels,
        |  false AS decoded,
        |  CAST(NULL AS VARCHAR) AS pixel_md5
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,
    "mm4_resize_plan" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 64 + 16 AS BIGINT) AS stub_width,
        |  CAST(octet_length(encode(text)) // 7 % 64 + 16 AS BIGINT) AS stub_height
        |  FROM documents)
        |SELECT doc_id, stub_width, stub_height,
        |  CAST(floor(stub_width * least(CAST(224.0 AS DOUBLE) / stub_width, CAST(224.0 AS DOUBLE) / stub_height)) AS BIGINT) AS out_width,
        |  CAST(floor(stub_height * least(CAST(224.0 AS DOUBLE) / stub_width, CAST(224.0 AS DOUBLE) / stub_height)) AS BIGINT) AS out_height,
        |  round(least(CAST(224.0 AS DOUBLE) / stub_width, CAST(224.0 AS DOUBLE) / stub_height) * 1e6) / 1e6 AS scale
        |FROM m ORDER BY doc_id""".stripMargin,
    // DuckDB cannot substring a BLOB; the corpus is pure ASCII (verified:
    // length(text) == octet_length(encode(text)) for every row), so VARCHAR
    // slicing is byte slicing and md5(varchar) hashes the same bytes.
    // BYTE frames via the hex rendering (2 hex chars per byte, so the
    // char-sliced hex string addresses exact byte offsets), md5 over the
    // hex — the engine hashes the same uppercase hex of the same bytes
    "mm3_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(length(substring(hex(encode(text)), CAST(i * 64 + 1 AS INT), 64)) // 2 AS BIGINT) AS frame_len,
        |  md5(substring(hex(encode(text)), CAST(i * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM documents, LATERAL unnest(
        |  [x FOR x IN range(CAST(ceil(octet_length(encode(text)) / 32.0) AS INT)) IF x % 4 = 0][1:8]) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
