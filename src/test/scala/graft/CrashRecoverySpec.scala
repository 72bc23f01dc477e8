package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CleanStore, Similarity}
import graft.sources.{BucketStore, Tables}

/** Crash-consistency fault injection on the staging stores (r14 verdict
  * item 2): StagingSpec proves mutual exclusion between LIVE writers,
  * but nothing killed a writer mid-write and proved the next READER
  * recovers. Each test here constructs the exact on-disk state a kill
  * at a given protocol point leaves behind — the marker/spec/stamp
  * write ORDER in the ensure bodies defines the reachable states — then
  * drives the normal serve path and asserts it rebuilds (never serves a
  * torn table) or legally reuses (never pays a rebuild the protocol
  * makes unnecessary).
  *
  * Reachable kill states, per the write orders:
  *  - CleanStore.ensure: [data+Spark _SUCCESS] → [_graft_partitions] →
  *    [_graft_spec] → [_graft_source]. A kill mid-parquet-job leaves
  *    part files + `_temporary` and NO _SUCCESS (Spark commits the
  *    marker last); later kills leave data with a missing suffix of the
  *    marker files.
  *  - BucketStore / Similarity.ensureLearnedIvf /
  *    Similarity.ensurePqCodebooks (r16: pointer-swap ManifestStore):
  *    [snap=<id> fully written] → [ATOMIC_MOVE pointer swap] → [GC].
  *    A kill mid-write leaves an UNPOINTED orphan snapshot — readers
  *    never see it (the pointer still names the previous generation) and
  *    the next publisher sweeps it; a kill during the swap is impossible
  *    by ATOMIC_MOVE; a kill after the swap leaves extra snapshots the
  *    next publish GCs. A garbage pointer (disk corruption, not a crash)
  *    must rebuild loud.
  *
  * NOT in scope: a state with ALL completion markers intact but torn
  * data — no single kill can produce it (markers are written strictly
  * after data, and Spark's job commit orders _SUCCESS after task
  * files), so it is bit-rot, not crash recovery. Compaction's
  * mid-rename window has its own repair test in CompactionSpec.
  */
class CrashRecoverySpec extends AnyFunSuite with SparkFixture {

  private def rm(f: File): Unit = {
    Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
  }

  /** Recursive (relative-name, mtime, length) signature of a directory's
    * parquet data files — rebuild/reuse evidence.
    */
  private def dataSig(root: File): Set[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).toSeq
        // hidden paths (_temporary, .trash_*) are not data — the same
        // listing rule Spark's file index applies
        .filterNot(c => c.getName.startsWith("_") && c.isDirectory)
        .filterNot(_.getName.startsWith("."))
        .flatMap(walk)
      else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => s"${f.getAbsolutePath.stripPrefix(root.getAbsolutePath)}" +
        s"@${f.lastModified}#${f.length}").toSet
  }

  // ------------------------------------------------------- CleanStore

  test("CleanStore: every kill point in the marker sequence recovers to the exact clean table") {
    val tmpSf = Files.createTempDirectory("graft_crash_cs").toFile
    val stageDir = new File(CleanStore.stagePath(tmpSf.getAbsolutePath, "events"))
    try {
      // 2-date source carved from the driver corpus
      val base = Tables.events(spark, sf001)
      val dates = base.select(to_date(col("ts")).as("d")).distinct()
        .orderBy(col("d")).limit(2).collect().map(_.getDate(0).toString)
      base.filter(to_date(col("ts")).cast("string").isin(dates: _*))
        .write.parquet(new File(tmpSf, "events.parquet").getAbsolutePath)

      def serve() = CleanStore.events(spark.newSession(), tmpSf.getAbsolutePath)
      val ref = serve()
      val (refN, refSum) =
        (ref.count(), ref.agg(sum(col("value"))).head.getDouble(0))
      assert(refN > 0)
      def assertServed(label: String): Unit = {
        val df = serve()
        assert(df.count() === refN, s"$label: wrong row count")
        assert(math.abs(df.agg(sum(col("value"))).head.getDouble(0) - refSum) < 1e-9,
          s"$label: wrong content")
      }

      // kill state A — mid parquet job: torn part file + _temporary
      // debris, no _SUCCESS, no marker suffix at all
      val partDir = new File(stageDir, s"event_date=${dates(0)}")
      val victim = Option(partDir.listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).head
      assert(victim.delete())
      val tmpDebris = new File(stageDir, "_temporary/0/attempt_0")
      tmpDebris.mkdirs()
      Files.write(new File(tmpDebris, "part-00000-torn.parquet").toPath,
        Array.fill[Byte](128)(0x13))
      Seq("_SUCCESS", "_graft_partitions", "_graft_spec", "_graft_source")
        .foreach(n => new File(stageDir, n).delete())
      assertServed("A: mid-write kill")
      assert(!new File(stageDir, "_temporary").exists() ||
        Option(tmpDebris.listFiles).forall(_.isEmpty),
        "A: rebuild left the torn _temporary debris as live state")
      assert(new File(stageDir, "_graft_spec").exists(), "A: spec not rewritten")

      // kill state B — data + _SUCCESS committed, fingerprints never
      // written (killed before _graft_partitions): full rebuild
      assert(new File(stageDir, "_graft_partitions").delete())
      assert(new File(stageDir, "_graft_spec").delete())
      assertServed("B: data-before-fingerprints kill")

      // kill state C — fingerprints written, spec missing
      assert(new File(stageDir, "_graft_spec").delete())
      assertServed("C: data-before-spec kill")

      // kill state D — spec written, source stamp missing: the recovery
      // must take the CHEAP incremental re-check (no date changed ⇒ no
      // data rewrite), then restore the stamp
      val sigBefore = dataSig(stageDir)
      assert(new File(stageDir, "_graft_source").delete())
      assertServed("D: spec-before-stamp kill")
      assert(new File(stageDir, "_graft_source").exists(), "D: stamp not restored")
      assert(dataSig(stageDir) === sigBefore,
        "D: recovery rewrote data the fingerprints prove unchanged")

      // kill state E — a LATER incremental refresh killed mid-job:
      // committed store intact, _temporary debris only. Serving must
      // ignore the debris (hidden-path listing) and reuse as-is.
      val debris2 = new File(stageDir, "_temporary/0")
      debris2.mkdirs()
      Files.write(new File(debris2, "part-00001-torn.parquet").toPath,
        Array.fill[Byte](64)(0x37))
      assertServed("E: mid-incremental kill debris")
      assert(dataSig(stageDir) === sigBefore,
        "E: fresh store was rebuilt just because debris existed")
    } finally { rm(tmpSf); rm(stageDir) }
  }

  // ------------------------------------------------------- BucketStore

  test("BucketStore: a publisher killed before the pointer swap ⇒ orphan swept, rebuilt, swapped") {
    // r16 manifest model: the bucketed write COMMITTED its snapshot dir
    // but the kill landed before the ATOMIC_MOVE of the pointer — the
    // snapshot is an orphan nothing references. The next builder must
    // sweep it and publish a proven generation; a garbage pointer must
    // likewise rebuild rather than serve unproven files.
    BucketStore.ordersByOrderkey(spark, sf001)
    val root = new File(BucketStore.dataDir(sf001, "orders"))
    val ptr = new File(root, "_manifest")
    assert(ptr.exists())
    val pointed = graft.sources.ManifestStore.currentPointer(root).get._1
    // kill window: pointer gone, committed snapshot left as an orphan
    assert(ptr.delete())
    val served = BucketStore.ordersByOrderkey(spark, sf001)
    assert(served.count() === Tables.orders(spark, sf001).count())
    val repub = graft.sources.ManifestStore.currentPointer(root)
      .getOrElse(fail("no pointer republished"))
    assert(repub._1 > pointed, "orphan generation must not be re-pointed")
    assert(!graft.sources.ManifestStore.snapDir(root, pointed).exists(),
      "orphan snapshot not swept")
    val snap = graft.sources.ManifestStore.snapDir(root, repub._1)
    assert(dataSig(snap).size === BucketStore.NumBuckets)
    // garbage pointer = no pointer: rebuild, never serve unproven bytes
    java.nio.file.Files.write(ptr.toPath, "not a pointer".getBytes)
    assert(BucketStore.ordersByOrderkey(spark, sf001).count() ===
      Tables.orders(spark, sf001).count())
    assert(graft.sources.ManifestStore.currentPointer(root).exists(_._1 > repub._1))
  }

  // ----------------------------------------------------- learned IVF

  test("learned IVF index: kill windows rebuild; an intact artifact is reused byte-stable") {
    // unique (k, iters) ⇒ a private artifact path, no interference with
    // the registry's derived-k index. r16 manifest model: the only kill
    // windows are orphan-snapshot (publisher died mid-write, before the
    // pointer swap — even a half-written centroids-without-cells snapshot
    // is INVISIBLE to readers because nothing points at it) and a torn/
    // garbage pointer, which the ATOMIC_MOVE makes impossible to produce
    // by crash but must still rebuild loud if disk corruption fakes one.
    val kCells = 2
    val root = new File(Similarity.learnedIvfPath(sf001, kCells, 1))
    rm(root) // start from the never-built state
    try {
      val admN = Similarity.adm(spark, sf001).count()
      def assertWhole(path: String, label: String): Unit = {
        val c = spark.read.parquet(s"$path/centroids")
        assert(c.count() === kCells.toLong, s"$label: centroid count")
        val idx = spark.read.parquet(s"$path/cells")
        assert(idx.count() === admN, s"$label: index must hold every admitted vector")
      }
      val snap1 = Similarity.ensureLearnedIvf(spark, sf001, kCells, 1)
      assertWhole(snap1, "fresh build")

      // kill state A — a publisher died mid-write: centroids written,
      // cells never started, pointer never swapped. Readers keep serving
      // the pointed generation; the next publish sweeps the orphan.
      val orphan = new File(root, "snap=99")
      new File(orphan, "centroids").mkdirs() // half-written debris, no cells
      java.nio.file.Files.write(
        new File(orphan, "centroids/part-junk.parquet").toPath, "torn".getBytes)
      val servedPath = Similarity.ensureLearnedIvf(spark, sf001, kCells, 1)
      assert(servedPath === snap1, "A: intact pointed generation must serve as-is")
      assertWhole(servedPath, "A: orphan beside a valid pointer")

      // kill state B — garbage pointer: no proof of any generation ⇒
      // sweep everything unpointed, rebuild, swap a fresh pointer
      java.nio.file.Files.write(
        new File(root, "_manifest").toPath, "garbage".getBytes)
      val snap2 = Similarity.ensureLearnedIvf(spark, sf001, kCells, 1)
      assertWhole(snap2, "B: garbage-pointer rebuild")
      assert(!orphan.exists(), "B: orphan snapshot not swept")

      // intact artifact — serve must NOT rewrite anything
      val sigB = dataSig(root)
      val snap3 = Similarity.ensureLearnedIvf(spark, sf001, kCells, 1)
      assert(snap3 === snap2 && dataSig(root) === sigB, "intact index was rebuilt")
    } finally rm(root)
  }

  // ---------------------------------------------------- PQ codebooks

  test("PQ codebooks: kill windows rebuild to the SAME codebooks; intact artifact reused") {
    // unique (m, ks, iters) ⇒ private artifact path. r16 manifest model:
    // a publisher killed before the swap leaves an unpointed orphan; a
    // lost/garbage pointer proves nothing about any snapshot ⇒ rebuild.
    // Training is deterministic (init=lowest-ids, ties=cid, quantized
    // means), so every recovery must land on the IDENTICAL codebooks —
    // the strongest possible recovery statement for a train-class artifact.
    val (m, ks, iters, dim) = (2, 4, 1, 64)
    val root = new File(Similarity.pqCodebookPath(sf001, m, ks, iters))
    rm(root)
    try {
      val ref = Similarity.ensurePqCodebooks(spark, sf001, m, ks, iters, dim)
      assert(ref.length === m && ref.forall(_.nonEmpty))
      val gen1 = graft.sources.ManifestStore.currentPointer(root).get._1

      // kill window — pointer lost (publisher died before any swap could
      // be observed): rebuild, republish, identical codebooks
      assert(new File(root, "_manifest").delete())
      val afterA = Similarity.ensurePqCodebooks(spark, sf001, m, ks, iters, dim)
      assert(afterA === ref, "A: retrained codebooks diverged from pre-crash")
      val gen2 = graft.sources.ManifestStore.currentPointer(root).get._1
      assert(gen2 > gen1, "A: recovery must publish a NEW proven generation")

      // intact — reuse without rewrite
      val sigB = dataSig(root)
      val again = Similarity.ensurePqCodebooks(spark, sf001, m, ks, iters, dim)
      assert(again === ref && dataSig(root) === sigB, "intact codebooks were rebuilt")
    } finally rm(root)
  }
}
