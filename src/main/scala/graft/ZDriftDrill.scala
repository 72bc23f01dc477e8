package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CleanStore, LayoutHealth}
import graft.sources.ManifestStore

/** The z-layout drift loop at MAGNITUDE (r17 verdict item 8):
  * ZOrderDriftSpec drills erode → alarm → re-layout at test scale
  * (400 k base rows); this main replays the identical arc at an
  * sf1-class volume (default 10 M base + 3 × 2 M raw deltas) and
  * records what the spec cannot — the measured COST of each piece on
  * the serving cadence: probe seconds (paid every maintenance tick),
  * delta-append seconds (the cheap path whose cheapness is the whole
  * point), and re-layout seconds (the expensive rebuild the alarm
  * exists to defer until it pays). Proves `AlarmAmplification = 4`
  * splits the regimes at real volume too, with the served content
  * multiset-hash identical through every snapshot swap.
  *
  * The grid and probe box are the spec's own (same mid-bucket edges,
  * same scatter decorrelation — see ZOrderDriftSpec for why both
  * matter), scaled: user/hour cardinalities stay fixed so the BOX
  * SELECTIVITY is scale-invariant and the amplification thresholds
  * carry over; only row volume grows.
  *
  * Output: one JSON record (default `bench/r18_zdrift_sf1.json`);
  * exits non-zero if any leg of the arc fails (healthy start, erosion
  * past the alarm, restoration, content identity) — a drill that
  * degenerates must not record a green-looking file.
  */
object ZDriftDrill {

  private def grid(
      spark: org.apache.spark.sql.SparkSession, idLo: Long, n: Long,
      scatter: Boolean = false): DataFrame = {
    val hour = if (scatter) "(id * 7919) % 480" else "(id div 200) % 480"
    spark.range(idLo, idLo + n).select(
      (col("id") % 200).as("user_id"),
      expr(s"timestamp_micros(1704067200000000 + ($hour) * 3600000000)").as("ts"),
      (col("id") % 97).cast("double").as("value"))
  }

  private val (uLo, uHi) = (0L, 44L)
  private val tsLo = "2024-01-01 00:00:00"
  private val tsHi = "2024-01-04 23:59:59"

  def main(args: Array[String]): Unit = {
    val baseRows = sys.env.getOrElse("SPARK_GRAFT_ZDRIFT_BASE", "10000000").toLong
    val deltaRows = sys.env.getOrElse("SPARK_GRAFT_ZDRIFT_DELTA", "2000000").toLong
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_ZDRIFT_OUT", "bench/r18_zdrift_sf1.json")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val root = java.nio.file.Files.createTempDirectory("graft_zdrift_sf1").toFile

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def amp(): (Double, Double) = {
      val (id, _) = ManifestStore.currentPointer(root).get
      val p = ManifestStore.snapDir(root, id).getAbsolutePath
      timed(LayoutHealth.readAmplification(spark, p, uLo, uHi, tsLo, tsHi))
    }
    def contentHash(): (Long, String) = {
      val (id, _) = ManifestStore.currentPointer(root).get
      val df = spark.read.parquet(ManifestStore.snapDir(root, id).getAbsolutePath)
      val r = df.select(
        count(lit(1)).as("n"),
        sum(xxhash64(struct(df.columns.sorted.map(col): _*))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h")).head()
      (r.getLong(0), r.getDecimal(1).toBigInteger.toString)
    }

    try {
      val (_, baseSec) = timed(ManifestStore.ensureSnapshot(root, "drill-base")(
        p => CleanStore.writeZOrdered(grid(spark, 0L, baseRows), p)))
      val (amp0, probe0Sec) = amp()
      System.err.println(f"[zdrift] base $baseRows rows laid out in $baseSec%.1f s; " +
        f"fresh amplification $amp0%.2f (probe $probe0Sec%.2f s)")
      val deltaSecs = (1 to 3).map { k =>
        val (_, s) = timed(LayoutHealth.deltaAppend(spark, root,
          grid(spark, baseRows + deltaRows * (k - 1), deltaRows, scatter = true)))
        s
      }
      val preHash = contentHash()
      val (amp1, probe1Sec) = amp()
      System.err.println(f"[zdrift] after 3 raw deltas (${deltaSecs.map(s => f"$s%.1f").mkString("/")} s): " +
        f"amplification $amp1%.2f (probe $probe1Sec%.2f s)")
      val ((action, measured), tickSec) = timed(
        LayoutHealth.maintenanceTick(spark, root, uLo, uHi, tsLo, tsHi))
      val (amp2, probe2Sec) = amp()
      val postHash = contentHash()
      val ((again, _), _) = timed(
        LayoutHealth.maintenanceTick(spark, root, uLo, uHi, tsLo, tsHi))
      System.err.println(f"[zdrift] tick: $action (measured $measured%.2f) took $tickSec%.1f s; " +
        f"restored amplification $amp2%.2f (probe $probe2Sec%.2f s); re-armed tick: $again")

      val okArc = amp0 <= LayoutHealth.AlarmAmplification &&
        amp1 > LayoutHealth.AlarmAmplification &&
        action == "relayout" &&
        amp2 <= LayoutHealth.AlarmAmplification &&
        again == "keep" &&
        preHash == postHash &&
        preHash._1 == baseRows + 3 * deltaRows
      val cpuCanary = Bench.canaryCpu()
      val takeId = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now()) + "-p" + ProcessHandle.current().pid()
      val rec =
        s"""{"take_id":"$takeId","base_rows":$baseRows,"delta_rows":$deltaRows,""" +
          s""""canary_cpu_sec":$cpuCanary,""" +
          s""""alarm_amplification":${LayoutHealth.AlarmAmplification},""" +
          s""""amp_fresh":$amp0,"amp_after_deltas":$amp1,"amp_restored":$amp2,""" +
          s""""probe_sec_fresh":$probe0Sec,"probe_sec_eroded":$probe1Sec,""" +
          s""""probe_sec_restored":$probe2Sec,""" +
          s""""base_layout_sec":$baseSec,""" +
          s""""delta_append_sec":[${deltaSecs.mkString(",")}],""" +
          s""""relayout_tick_sec":$tickSec,""" +
          s""""content_rows":${preHash._1},"content_hash":"${preHash._2}",""" +
          s""""content_identical":${preHash == postHash},""" +
          s""""rearmed_tick":"$again","arc_ok":$okArc}"""
      val out = java.nio.file.Paths.get(outPath)
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, rec)
      println(rec)
      spark.stop()
      if (!okArc) {
        System.err.println("[zdrift] ARC FAILED — see record")
        sys.exit(1)
      }
    } finally graft.sources.Staging.deleteRecursively(root)
  }
}
