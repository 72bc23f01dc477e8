package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The materialized CLEAN serving layer — the reference's
  * write-clean-then-re-read pattern (assignment1.ipynb:223 writes the
  * cleaned frame to parquet; app.py:97 serves every dashboard refresh from
  * that staged file, never from the raw inputs). At 100 TB this layer is
  * the whole point of staging: the clean tables are DATE-PARTITIONED, so a
  * dashboard's F1 date-range filter becomes partition pruning — a refresh
  * reads only the selected dates' files instead of rescanning the raw
  * corpus, and the cleaning predicates run once at staging time instead of
  * once per widget interaction.
  *
  * Two stores, one write shape each:
  *  - `lineitem`: the Pipeline's stage-2 output (cleaning rules + derived
  *    time features), partitioned by `ship_date`;
  *  - `events`: the telemetry stream after the critical-column null drop
  *    (V4 applied to events; the driver corpus has no null keys, so the
  *    clean rows equal the raw rows — which is exactly what lets the pf3
  *    oracle run over the raw `events` table and still hash-match),
  *    partitioned by `event_date`.
  *
  * The canonical store lives under `target/clean/<sf>/` (same idempotent
  * marker-and-mtime scheme as [[Tables.nationCsv]]) for registry queries,
  * which only receive a scale dir; [[graft.Pipeline]] writes the SAME
  * shapes under its own `outDir` and re-reads those — the end-to-end flow
  * serves from exactly what it just staged.
  */
object CleanStore {

  /** Critical-column null drop for the events stream (V4 over telemetry):
    * a row with no timestamp, user, type, or value is unusable by every
    * downstream aggregate.
    */
  def cleanEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(Cleaning.notNull(Seq("ts", "user_id", "event_type", "value")))

  /** The derive stage over an already-CLEANED lineitem frame — one source
    * of truth for the synthetic receipt date and the time-feature bundle
    * (the Pipeline cleans with `cleanAndCount` for its accounting and
    * hands the cleaned frame here; editing the derive in one place keeps
    * the Pipeline-served feeds and the canonical staging identical).
    */
  def deriveCleaned(cleaned: DataFrame): DataFrame =
    Derive.withTimeFeatures(
      cleaned.withColumn("l_receiptdate", expr("l_shipdate + INTERVAL 2 DAYS")),
      start = "l_shipdate", end = "l_receiptdate", distance = "l_quantity")

  /** The Pipeline's stage-2 body, defined once: cleaning rules (shared with
    * q02/q17) + [[deriveCleaned]].
    */
  def derivedLineitem(spark: SparkSession, sfDir: String): DataFrame =
    deriveCleaned(Cleaning.clean(Tables.lineitem(spark, sfDir), Analytics.cleaningRules))

  /** Date-partitioned parquet write. The `repartition` on the partition
    * column lands all rows of a date in ONE writer task → one file per
    * date; without it every task opens a file per date it sees (tasks ×
    * dates tiny files). At 100 TB over ~7 years that is ~2.5k partitions
    * of ~40 GB — the right pruning granularity.
    */
  def writePartitioned(df: DataFrame, tsCol: String, partCol: String, path: String): Unit =
    df.withColumn(partCol, to_date(col(tsCol)))
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  def writeEvents(df: DataFrame, path: String): Unit =
    writePartitioned(df, "ts", "event_date", path)

  def writeLineitem(df: DataFrame, path: String): Unit =
    writePartitioned(df, "l_shipdate", "ship_date", path)

  // ---------------------------------------------------- canonical store

  /** Canonical staging location for a clean table of a scale dir. */
  def stagePath(sfDir: String, name: String): String =
    s"${sys.props("user.dir")}/target/clean/${new java.io.File(sfDir).getName}/$name"

  /** Build-logic fingerprint of a staged frame: schema + every Filter
    * predicate + every Project list. The Project lists matter — a change
    * to a derive FORMULA (the receiptdate interval, a time-feature
    * expression) alters values without touching schema or filters, and a
    * schema+filters-only spec would silently serve a staging the current
    * code never produced. `Expression.sql` is stable across sessions
    * (no exprIds), unlike the full plan string. Computing the spec
    * analyzes the lazy plan but runs no job.
    */
  private def buildSpec(built: DataFrame): String = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    built.schema.catalogString + "\n" +
      built.queryExecution.analyzed.collect {
        case f: Filter => "F:" + f.condition.sql
        case p: Project => "P:" + p.projectList.map(_.sql).mkString(", ")
      }.mkString("\n")
  }

  /** Per-date (row count, order-independent xxhash64 XOR) fingerprints of
    * the frame to stage — the incremental-refresh diff key. One map-side
    * aggregation scan; the date cardinality is bounded (~2.5k dates at
    * 100 TB), so the collect is a driver-side map of a few thousand
    * entries, never data-scaled.
    */
  private def partitionFingerprints(
      df: DataFrame, tsCol: String, partCol: String): Map[String, (Long, Long)] = {
    val cols = df.columns.map(col).toSeq
    df.select(to_date(col(tsCol)).cast("string").as(partCol),
        xxhash64(struct(cols: _*)).as("h"))
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("hx"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  private def writeFingerprints(
      f: java.io.File, fps: Map[String, (Long, Long)]): Unit =
    java.nio.file.Files.write(f.toPath,
      fps.toSeq.sorted.map { case (d, (n, h)) => s"$d\t$n\t$h" }
        .mkString("\n").getBytes)

  private def readFingerprints(f: java.io.File): Map[String, (Long, Long)] =
    new String(java.nio.file.Files.readAllBytes(f.toPath)).linesIterator
      .filter(_.nonEmpty)
      .map { l => val p = l.split('\t'); p(0) -> ((p(1).toLong, p(2).toLong)) }
      .toMap

  private def deleteDir(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles).getOrElse(Array.empty).foreach(deleteDir)
    f.delete(); ()
  }

  /** Serve the staged table, (re)building only what is actually stale:
    *
    *  - build-logic change (spec mismatch) or first build ⇒ FULL rebuild;
    *  - source newer but spec unchanged ⇒ INCREMENTAL refresh: diff
    *    per-date fingerprints and rewrite ONLY the changed/missing dates
    *    via dynamic partition overwrite, delete dates gone from the
    *    source. An appended day costs one fingerprint scan plus one
    *    date's write — not a rewrite of the whole history (at 100 TB a
    *    full restage of ~7 years to ingest yesterday is the difference
    *    between minutes and a day);
    *  - otherwise serve as-is (marker fresh).
    *
    * The whole check-and-write runs under the cross-process staging lock,
    * double-checked: a concurrent builder's finished marker+spec makes
    * the re-check serve instead of re-writing — two JVMs sharing
    * `target/` can no longer interleave a half-written table.
    */
  private def ensure(
      spark: SparkSession, sfDir: String, name: String, sourceTable: String,
      tsCol: String, partCol: String)(build: => DataFrame): DataFrame = {
    val dir = stagePath(sfDir, name)
    graft.sources.Staging.withExclusiveLock(new java.io.File(dir).getParentFile) {
      val marker = new java.io.File(s"$dir/_SUCCESS")
      val source = new java.io.File(Tables.path(sfDir, sourceTable))
      val specFile = new java.io.File(s"$dir/_graft_spec")
      val fpFile = new java.io.File(s"$dir/_graft_partitions")
      lazy val built = build
      lazy val spec = buildSpec(built)
      val specFresh = marker.exists() && specFile.exists() && fpFile.exists() &&
        new String(java.nio.file.Files.readAllBytes(specFile.toPath)) == spec
      if (!specFresh) {
        writePartitioned(built, tsCol, partCol, dir)
        writeFingerprints(fpFile, partitionFingerprints(built, tsCol, partCol))
        java.nio.file.Files.write(specFile.toPath, spec.getBytes)
      } else if (marker.lastModified() < source.lastModified()) {
        val current = partitionFingerprints(built, tsCol, partCol)
        val recorded = readFingerprints(fpFile)
        val changed = current.keySet.filter(d => !recorded.get(d).contains(current(d)))
        val removed = recorded.keySet -- current.keySet
        if (changed.nonEmpty) {
          // dynamic mode: only the partitions present in the written data
          // are replaced — untouched dates keep their existing files
          val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          try {
            built.withColumn(partCol, to_date(col(tsCol)))
              .filter(col(partCol).cast("string").isin(changed.toSeq: _*))
              .repartition(col(partCol))
              .write.mode("overwrite").partitionBy(partCol).parquet(dir)
          } finally prev match {
            case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
            case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
          }
        }
        removed.foreach(d => deleteDir(new java.io.File(dir, s"$partCol=$d")))
        writeFingerprints(fpFile, current)
        // the no-op case (mtime touch, content unchanged) refreshes the
        // marker so the next ensure takes the fast path without a scan
        if (!marker.exists()) java.nio.file.Files.createFile(marker.toPath)
        marker.setLastModified(System.currentTimeMillis()); ()
      }
    }
    spark.read.parquet(dir)
  }

  /** The clean events table, materialized once per scale dir. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    ensure(spark, sfDir, "events", "events", "ts", "event_date")(
      cleanEvents(spark, sfDir))

  /** The clean derived lineitem table, materialized once per scale dir. */
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    ensure(spark, sfDir, "lineitem", "lineitem", "l_shipdate", "ship_date")(
      derivedLineitem(spark, sfDir))
}
