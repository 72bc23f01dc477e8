package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CleanStore, LayoutHealth}
import graft.sources.ManifestStore

/** The z-layout drift loop drilled end-to-end (r16 verdict item 4):
  * cheap raw-delta appends erode the z-store's box skipping (the
  * executed-metrics read-amplification probe sees it), the alarm trips,
  * the maintenance tick re-lays-out with fresh bounds through the
  * pointer-swap ManifestStore, skipping is restored, and the served
  * CONTENT is hash-identical through every step — the layout is pure
  * execution state.
  */
class ZOrderDriftSpec extends AnyFunSuite with SparkFixture {

  // uniform (user × hour) grid: user and hour derived from DIFFERENT id
  // digits so the two dimensions are independent, not lattice-correlated.
  // `scatter` decorrelates hour from id ORDER (multiplicative scramble):
  // without it, each written file's contiguous-id slice carries a NARROW
  // hour min-max, so delta files are accidentally time-clustered and the
  // box's ts predicate prunes most of them (measured: erosion 5.99
  // instead of ~14) — real worst-case appends arrive with no clustering
  // on either box dimension, which is what the drill must model
  private def grid(idLo: Long, n: Long, scatter: Boolean = false): DataFrame = {
    val hour = if (scatter) "(id * 7919) % 480" else "(id div 200) % 480"
    spark.range(idLo, idLo + n).select(
      (col("id") % 200).as("user_id"),
      expr(s"timestamp_micros(1704067200000000 + ($hour) * 3600000000)").as("ts"),
      (col("id") % 97).cast("double").as("value"))
  }

  // the probe box: an axis-aligned sub-quadrant of the normalized grid
  // whose EDGES sit mid-bucket — user 44/199 ≈ rank 22.5% → bucket ~57,
  // hour 95/479 ≈ 20% → bucket ~51, both safely inside the <64 quadrant.
  // (A first cut used exactly 25% edges: rank 24.6% lands ON the
  // bucket-64 boundary, and ±1 bucket of approxQuantile slack flips the
  // edge coordinate's top bit, scattering box rows across FOUR z-interval
  // files — measured healthy amplification 4.37, a knife-edge against
  // the alarm. Mid-bucket edges keep the whole box z < 4096 → one file.)
  private val (uLo, uHi) = (0L, 44L)
  private val tsLo = "2024-01-01 00:00:00"
  private val tsHi = "2024-01-04 23:59:59"

  private def amp(path: String): Double =
    LayoutHealth.readAmplification(spark, path, uLo, uHi, tsLo, tsHi)

  private def currentPath(root: File): String = {
    val (id, _) = ManifestStore.currentPointer(root).get
    ManifestStore.snapDir(root, id).getAbsolutePath
  }

  /** order-free multiset content hash (the RestartDrill form). */
  private def contentHash(path: String): (Long, String) = {
    val df = spark.read.parquet(path)
    val r = df.select(
      count(lit(1)).as("n"),
      sum(xxhash64(struct(df.columns.sorted.map(col): _*))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h")).head()
    (r.getLong(0), r.getDecimal(1).toBigInteger.toString)
  }

  test("layout drift loop: deltas erode skipping, alarm trips, relayout restores, content identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_zdrift").toFile
    try {
      // publish the base layout: 400k uniform rows, fresh equidepth bounds
      ManifestStore.ensureSnapshot(root, "drill-base")(
        p => CleanStore.writeZOrdered(grid(0L, 400000L), p))
      val amp0 = amp(currentPath(root))
      assert(amp0 <= LayoutHealth.AlarmAmplification,
        s"fresh layout must probe healthy: amplification $amp0")
      val (keep0, ampK) = LayoutHealth.maintenanceTick(
        spark, root, uLo, uHi, tsLo, tsHi)
      assert(keep0 === "keep" && ampK === amp0,
        "healthy store must not trigger a re-layout")
      val (idAfterKeep, _) = ManifestStore.currentPointer(root).get
      // three cheap delta appends, each spanning the FULL domain — raw
      // files whose min-max stats prune nothing under the box
      for (k <- 1 to 3)
        LayoutHealth.deltaAppend(spark, root,
          grid(400000L + 150000L * (k - 1), 150000L, scatter = true))
      val preHash = contentHash(currentPath(root))
      assert(preHash._1 === 850000L)
      val amp1 = amp(currentPath(root))
      assert(amp1 > LayoutHealth.AlarmAmplification,
        s"unclustered deltas must erode skipping past the alarm: $amp1 " +
          s"(healthy was $amp0)")
      info(f"amplification: fresh $amp0%.2f -> after 3 raw deltas $amp1%.2f")
      // the tick sees the erosion and pays for the re-layout
      val (action, measured) = LayoutHealth.maintenanceTick(
        spark, root, uLo, uHi, tsLo, tsHi)
      assert(action === "relayout" && measured > LayoutHealth.AlarmAmplification)
      val amp2 = amp(currentPath(root))
      assert(amp2 <= LayoutHealth.AlarmAmplification,
        s"re-layout must restore skipping: $amp2")
      info(f"amplification restored: $amp2%.2f")
      // serving is invisible: identical multiset content through the swap
      assert(contentHash(currentPath(root)) === preHash,
        "re-layout changed served content")
      // and the loop armed again: a further tick keeps
      val (again, _) = LayoutHealth.maintenanceTick(spark, root, uLo, uHi, tsLo, tsHi)
      assert(again === "keep")
      // the relayout was a genuine new snapshot (pointer advanced)
      assert(ManifestStore.currentPointer(root).get._1 > idAfterKeep)
    } finally graft.sources.Staging.deleteRecursively(root)
  }

  test("deltaAppend publishes by reference: content = base ∪ delta, base untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft_zdelta").toFile
    try {
      ManifestStore.ensureSnapshot(root, "drill-base")(
        p => CleanStore.writeZOrdered(grid(0L, 50000L), p))
      val (baseId, _) = ManifestStore.currentPointer(root).get
      LayoutHealth.deltaAppend(spark, root, grid(50000L, 10000L))
      val (newId, _) = ManifestStore.currentPointer(root).get
      assert(newId > baseId)
      assert(contentHash(currentPath(root))._1 === 60000L)
      // by-reference reuse: every base part file appears (as a link) in
      // the new snapshot — the delta publish wrote only delta bytes
      val baseParts = ManifestStore.snapDir(root, baseId).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getName).toSet
      val newParts = ManifestStore.snapDir(root, newId).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getName).toSet
      assert(baseParts.subsetOf(newParts) && newParts.size > baseParts.size)
    } finally graft.sources.Staging.deleteRecursively(root)
  }
}
