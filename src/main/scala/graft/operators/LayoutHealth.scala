package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.ManifestStore

/** The z-layout DRIFT loop (r16 verdict item 4) — the maintenance half
  * pf5's serving story was missing. [[CleanStore.eventsZOrdered]]
  * recomputes equidepth bounds on every stamped republish, so a store
  * that can afford a full re-layout per source change never drifts. At
  * 100 TB it can't: appends land as CHEAP delta snapshots (previous
  * files reused by reference, new rows written raw), and raw delta
  * files span the whole (user × time) domain — their min-max stats
  * prune nothing, so every box probe reads every delta row and the
  * z-store's skipping win erodes silently as deltas accumulate. That
  * erosion is invisible in plan text (the predicates are still listed
  * as pushed — the r16 INT96 lesson) and only visible in EXECUTED scan
  * metrics, which is what this probe reads — the PlanSpec pf5 audit
  * turned into a periodic health signal, exactly the sim15-recall
  * pattern: measure the end effect on the serving cadence, alarm on a
  * documented threshold, trigger the expensive rebuild only when the
  * measurement says it pays.
  *
  * Loop shape (the Compaction.maintenanceTick pattern):
  * [[readAmplification]] probes the canonical box → above
  * [[AlarmAmplification]], [[maintenanceTick]] re-lays-out the full
  * content with FRESH bounds (the nightly OPTIMIZE ZORDER) and
  * publishes through the pointer-swap ManifestStore — readers keep the
  * previous snapshot, serve hashes unchanged; below it, the tick costs
  * one bounded probe. ZOrderDriftSpec drills the whole loop: skewed
  * deltas erode skipping, the alarm trips, the re-layout restores the
  * ratio, content identical throughout.
  */
object LayoutHealth {

  /** Alarm threshold on the probe's read amplification (rows the scan
    * delivers ÷ rows matching the box). A fresh equidepth layout probes
    * 2–3 at the 16-file staging granularity (the box reads only the
    * z-interval files it intersects, plus range-sampling and quantile
    * boundary slack — ZOrderDriftSpec measured 3.0 fresh, 2.1 after a
    * re-layout at larger volume; finer file counts probe lower);
    * unclustered deltas push it toward total ÷ matched (the drill
    * measures 12.5 after three raw appends). 4 splits the measured
    * regimes with margin on both sides, and the drill pins them, so a
    * layout change that moves healthy amplification past the alarm
    * fails a test before it ships a flapping monitor.
    */
  val AlarmAmplification = 4.0

  /** Read amplification of a (user ∧ time) box against a parquet layout:
    * rows the scan DELIVERS after file/row-group stats skipping (the
    * executed `numOutputRows` of the scan node — not a plan string)
    * divided by rows actually matching. Both predicates are simple
    * column comparisons, so they reach the scan as pushed filters; the
    * one probe job returns matched rows as its count and scanned rows
    * from the scan metric. Cost: one box-bounded scan — a monitoring
    * query, run on the serving cadence.
    */
  def readAmplification(
      spark: SparkSession, path: String,
      uLo: Long, uHi: Long, tsLo: String, tsHi: String): Double = {
    val df = spark.read.parquet(path).filter(
      col("user_id").between(uLo, uHi) &&
        col("ts").between(lit(tsLo).cast("timestamp"), lit(tsHi).cast("timestamp")))
    val matched = df.queryExecution.toRdd.count()
    // The scan node lives under AdaptiveSparkPlanExec when AQE wraps the
    // probe (AQE treats the wrapper as a LEAF for collect, so a top-level
    // collect finds nothing; the probe plan today is scan→filter with no
    // exchange, but a conf flip like adaptive.forceApply — reachable via
    // SPARK_GRAFT_CONF — would wrap it): unwrap to the executed plan
    // first, and FAIL LOUDLY if no scan node is found — a probe that
    // sums scanned=0 would read amplification ~0 and permanently,
    // silently disarm the drift alarm (r17 advisor).
    val executed = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = executed.collect { case s: FileSourceScanExec => s }
    require(scans.nonEmpty,
      s"readAmplification: no FileSourceScanExec found in the executed probe " +
        s"plan over $path — the drift alarm would be silently disarmed")
    val scanned = scans.map(_.metrics("numOutputRows").value).sum
    require(scanned >= matched,
      s"readAmplification: scan delivered $scanned rows < $matched matched — " +
        "the probe is not measuring the scan that served the box")
    scanned.toDouble / math.max(matched, 1L)
  }

  /** CHEAP delta refresh: publish a new immutable snapshot that reuses
    * the previous snapshot's parquet files BY REFERENCE (hardlinks —
    * the local-filesystem stand-in for a manifest's file-reference
    * reuse; a lakehouse table format records the same files in the new
    * snapshot's manifest without copying a byte) and appends the delta
    * rows raw. Delta-scaled cost, full content identity — and the
    * deliberate trade this module exists to monitor: raw delta files
    * carry whole-domain min-max stats, so each append erodes box
    * skipping until [[maintenanceTick]]'s re-layout. ManifestStore GC
    * of the superseded snapshot is safe under links (data survives
    * until the last link goes).
    */
  def deltaAppend(spark: SparkSession, root: File, delta: DataFrame): File = {
    val (prevId, prevSpec) = ManifestStore.currentPointer(root).getOrElse(
      throw new IllegalStateException(
        s"deltaAppend: no published base snapshot under $root"))
    val prevDir = ManifestStore.snapDir(root, prevId)
    // the base lineage in the spec makes consecutive appends distinct
    // publishes (ensureSnapshot is a no-op on an unchanged spec)
    val spec = prevSpec + s"\n+delta base=$prevId"
    ManifestStore.ensureSnapshot(root, spec) { path =>
      val dst = new File(path)
      dst.mkdirs()
      Option(prevDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
        .foreach(f => Files.createLink(new File(dst, f.getName).toPath, f.toPath))
      delta.write.mode("append").parquet(path)
    }
  }

  /** One maintenance decision over a z-store root: probe the box's read
    * amplification on the CURRENT snapshot; above [[AlarmAmplification]]
    * re-layout the full content with fresh equidepth bounds (one
    * bounds-aggregate + one range-shuffle write — the nightly OPTIMIZE,
    * paid only when the measurement says skipping has eroded) and
    * publish via pointer swap; below it, keep. Returns (action,
    * amplification) with action ∈ {"keep", "relayout"} — the journal
    * line a production scheduler records per tick.
    */
  def maintenanceTick(
      spark: SparkSession, root: File,
      uLo: Long, uHi: Long, tsLo: String, tsHi: String): (String, Double) = {
    val (id, spec) = ManifestStore.currentPointer(root).getOrElse(
      throw new IllegalStateException(s"maintenanceTick: no snapshot under $root"))
    val cur = ManifestStore.snapDir(root, id).getAbsolutePath
    val amp = readAmplification(spark, cur, uLo, uHi, tsLo, tsHi)
    if (amp <= AlarmAmplification) ("keep", amp)
    else {
      // spec: the pre-drift base layout line + a relayout generation tied
      // to the snapshot this rebuild supersedes — unique and monotone, so
      // repeated ticks above the alarm don't republish identical specs
      val relaidSpec = spec + s"\nrelayout supersedes=$id"
      val full = spark.read.parquet(cur)
      ManifestStore.ensureSnapshot(root, relaidSpec)(
        p => CleanStore.writeZOrdered(full, p))
      ("relayout", amp)
    }
  }
}
