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
  *  - BucketStore.ensure: [drop+delete] → [data+_SUCCESS via
  *    saveAsTable] → [_graft_spec].
  *  - Similarity.ensureLearnedIvf: [centroids/] → [cells/] →
  *    [_graft_spec] → [_marker].
  *  - Similarity.ensurePqCodebooks: [codebooks/] → [_graft_spec] →
  *    [_marker].
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

  test("BucketStore: killed after the bucketed write but before the spec ⇒ next builder rebuilds") {
    // complements BucketStoreSpec's torn-first-build (no _SUCCESS at
    // all): here the saveAsTable job COMMITTED (data + _SUCCESS) and the
    // kill landed in the window before _graft_spec — without the spec
    // there is no proof of which logic/bucket layout wrote the files,
    // so the next builder must rebuild, not trust them
    BucketStore.ordersByOrderkey(spark, sf001)
    val dir = new File(BucketStore.dataDir(sf001, "orders"))
    assert(new File(dir, "_SUCCESS").exists())
    val sigBefore = dataSig(dir)
    assert(new File(dir, "_graft_spec").delete())
    val served = BucketStore.ordersByOrderkey(spark, sf001)
    assert(served.count() === Tables.orders(spark, sf001).count())
    assert(new File(dir, "_graft_spec").exists(), "spec not rewritten")
    assert(dataSig(dir) !== sigBefore,
      "unproven bucket files were served without a rebuild")
    assert(dataSig(dir).size === BucketStore.NumBuckets)
  }

  // ----------------------------------------------------- learned IVF

  test("learned IVF index: kill windows rebuild; an intact artifact is reused byte-stable") {
    // unique (k, iters) ⇒ a private artifact path, no interference with
    // the registry's derived-k index
    val kCells = 2
    val path = new File(Similarity.learnedIvfPath(sf001, kCells, 1))
    rm(path) // start from the never-built state
    try {
      Similarity.ensureLearnedIvf(spark, sf001, kCells, 1)
      val centroids = new File(path, "centroids")
      val cells = new File(path, "cells")
      val admN = Similarity.adm(spark, sf001).count()
      def assertWhole(label: String): Unit = {
        val c = spark.read.parquet(centroids.getAbsolutePath)
        assert(c.count() === kCells.toLong, s"$label: centroid count")
        val idx = spark.read.parquet(cells.getAbsolutePath)
        assert(idx.count() === admN, s"$label: index must hold every admitted vector")
        assert(new File(path, "_marker").exists() &&
          new File(path, "_graft_spec").exists(), s"$label: markers missing")
      }
      assertWhole("fresh build")

      // kill state A — centroids written, cells never started (no
      // spec/marker): rebuild both
      rm(cells)
      new File(path, "_marker").delete()
      new File(path, "_graft_spec").delete()
      Similarity.ensureLearnedIvf(spark, sf001, kCells, 1)
      assertWhole("A: centroids-without-cells kill")

      // kill state B — spec written, marker missing (the last write
      // window): marker is the completion bit, so REBUILD — a spec
      // without its marker proves nothing about the data beside it
      val sigA = dataSig(path)
      assert(new File(path, "_marker").delete())
      Similarity.ensureLearnedIvf(spark, sf001, kCells, 1)
      assertWhole("B: spec-before-marker kill")
      assert(dataSig(path) !== sigA, "B: unproven index served without rebuild")

      // intact artifact — serve must NOT rewrite anything
      val sigB = dataSig(path)
      Similarity.ensureLearnedIvf(spark, sf001, kCells, 1)
      assert(dataSig(path) === sigB, "intact index was rebuilt")
    } finally rm(path)
  }

  // ---------------------------------------------------- PQ codebooks

  test("PQ codebooks: kill windows rebuild to the SAME codebooks; intact artifact reused") {
    // unique (m, ks, iters) ⇒ private artifact path
    val (m, ks, iters, dim) = (2, 4, 1, 64)
    val path = new File(Similarity.pqCodebookPath(sf001, m, ks, iters))
    rm(path)
    try {
      val ref = Similarity.ensurePqCodebooks(spark, sf001, m, ks, iters, dim)
      assert(ref.length === m && ref.forall(_.nonEmpty))

      // kill state A — codebooks written, spec never written
      assert(new File(path, "_graft_spec").delete())
      new File(path, "_marker").delete()
      val afterA = Similarity.ensurePqCodebooks(spark, sf001, m, ks, iters, dim)
      // training is deterministic (init=lowest-ids, ties=cid, quantized
      // means), so recovery must land on the IDENTICAL codebooks — the
      // strongest possible recovery statement for a `train`-class artifact
      assert(afterA === ref, "A: retrained codebooks diverged from pre-crash")

      // kill state B — spec written, marker missing
      val sigA = dataSig(path)
      assert(new File(path, "_marker").delete())
      val afterB = Similarity.ensurePqCodebooks(spark, sf001, m, ks, iters, dim)
      assert(afterB === ref, "B: retrained codebooks diverged")
      assert(dataSig(path) !== sigA, "B: unproven codebooks served without rebuild")

      // intact — reuse without rewrite
      val sigB = dataSig(path)
      val again = Similarity.ensurePqCodebooks(spark, sf001, m, ks, iters, dim)
      assert(again === ref && dataSig(path) === sigB, "intact codebooks were rebuilt")
    } finally rm(path)
  }
}
