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

  private def ensure(
      spark: SparkSession, sfDir: String, name: String, sourceTable: String)(
      build: => DataFrame)(write: (DataFrame, String) => Unit): DataFrame = {
    val dir = stagePath(sfDir, name)
    val marker = new java.io.File(s"$dir/_SUCCESS")
    val source = new java.io.File(Tables.path(sfDir, sourceTable))
    // The staging is stale when the SOURCE is newer — or when the BUILD
    // LOGIC changed: the spec file records the built frame's schema plus
    // the cleaning predicate, so an edit to the rules or the derive
    // columns rebuilds instead of silently serving a table the current
    // code never produced. (Computing the spec analyzes the lazy plan but
    // runs no job.)
    val specFile = new java.io.File(s"$dir/_graft_spec")
    lazy val built = build
    def spec: String =
      built.schema.catalogString + "\n" +
        built.queryExecution.analyzed.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.sql
        }.mkString("\n")
    val fresh = marker.exists() &&
      marker.lastModified() >= source.lastModified() &&
      specFile.exists() &&
      new String(java.nio.file.Files.readAllBytes(specFile.toPath)) == spec
    if (!fresh) {
      write(built, dir)
      java.nio.file.Files.write(specFile.toPath, spec.getBytes)
    }
    spark.read.parquet(dir)
  }

  /** The clean events table, materialized once per scale dir. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    ensure(spark, sfDir, "events", "events")(
      cleanEvents(spark, sfDir))(writeEvents)

  /** The clean derived lineitem table, materialized once per scale dir. */
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    ensure(spark, sfDir, "lineitem", "lineitem")(
      derivedLineitem(spark, sfDir))(writeLineitem)
}
