package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions._
import graft.sources.Tables

/** The dashboard-interaction surface (SURVEY.md §2.4/§2.9, app.py:82–148):
  * parameterized date-range / hour-range / membership filters over a
  * CACHED base table, plus the seeded-sample test-mode knob and the CSV
  * dimension variant.
  *
  * Scale posture: the cache is the Spark twin of `@st.cache_data`
  * (app.py:82) — the base table is persisted once per scale dir, so every
  * widget interaction re-filters memory-resident data instead of
  * rescanning raw parquet. The filters themselves are plain conjunctive
  * predicates: on an UNcached scan they push down to the parquet reader
  * (and at 100 TB, a date-partitioned clean table turns F1 into partition
  * pruning, SURVEY.md §7.4).
  */
object Params {

  /** Sidebar parameter bundle (app.py:129–148). The upper date bound is the
    * midnight INSTANT of the end date, inclusive of exactly that instant —
    * the reference's quirk (app.py:143–144), reproduced literally by
    * `between`'s closed interval.
    */
  final case class EventParams(
      tsLo: String, tsHi: String,
      hourLo: Int, hourHi: Int,
      types: Seq[String])

  val defaultParams: EventParams = EventParams(
    "2024-01-05 00:00:00", "2024-01-20 00:00:00", 6, 18,
    Seq("view", "click", "purchase"))

  // --------------------------------------------------------------- cache

  // Keyed per session so one session's persisted frames are never handed
  // to another. STRONG references, deliberately: a cached Dataset itself
  // strongly reaches its SparkSession, so a weak-keyed map could never
  // actually collect an entry (the value would keep the key alive) — the
  // map is honestly documented as bounded by process lifetime × live
  // sessions, which is small here (each main builds exactly one session;
  // the test suite shares one fixture).
  private val cache = new java.util.concurrent.ConcurrentHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, DataFrame]]()

  /** S7 — the persisted base table (one per scale dir, MEMORY_AND_DISK so
    * an executor-memory shortfall spills instead of OOMing). If something
    * unpersisted the memoized frame behind our back (`spark.catalog
    * .clearCache()` — Bench runs it between queries), re-persist instead of
    * silently returning an uncached frame and losing the S7 contract.
    */
  def cachedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val df = cache
      .computeIfAbsent(spark, _ => scala.collection.concurrent.TrieMap.empty)
      .getOrElseUpdate(
        sfDir, Tables.events(spark, sfDir).persist(StorageLevel.MEMORY_AND_DISK))
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }

  // ------------------------------------------------------------- filters

  /** F1 ∧ F2 ∧ F3 as one conjunctive predicate. */
  def paramPredicate(p: EventParams): Column =
    col("ts").between(lit(p.tsLo).cast("timestamp"), lit(p.tsHi).cast("timestamp")) &&
      hour(col("ts")).between(p.hourLo, p.hourHi) &&
      col("event_type").isin(p.types: _*)

  def paramFilter(events: DataFrame, p: EventParams): DataFrame =
    events.filter(paramPredicate(p))

  /** pf1 — the dashboard refresh: filter the cached base with the default
    * widget parameters, aggregate the feed.
    */
  def pf1ParamFilter(spark: SparkSession, sfDir: String): DataFrame =
    paramFilter(cachedEvents(spark, sfDir), defaultParams)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
      .orderBy(col("event_type"))

  // ------------------------------------------------------------- sample

  /** SA1 — deterministic exact-n sample (app.py:99 `sample(n=100000,
    * random_state=42)`). `orderBy(rand(seed), tiebreak).limit(n)` plans as
    * TakeOrderedAndProject: per-partition top-n heaps, one tiny shuffle of
    * n rows per partition — no global sort, scales with the scan. Row
    * identity is engine-RNG-dependent by nature (pandas RNG ≠ Spark RNG),
    * so this is a rows-only check: no oracle can exist (SURVEY.md §7.4).
    */
  def seededSample(df: DataFrame, n: Int, seed: Long, tiebreak: Seq[String]): DataFrame =
    df.orderBy(rand(seed) +: tiebreak.map(col): _*).limit(n)

  def sa1SeededSample(spark: SparkSession, sfDir: String): DataFrame =
    seededSample(Tables.lineitem(spark, sfDir), 1000, 42L,
      Seq("l_orderkey", "l_linenumber"))

  // ----------------------------------------------------------- csv dim

  /** cs1 — S3: the dimension join with the dim read from CSV (the
    * reference's zones lookup path, assignment1.ipynb:239). Values
    * round-trip losslessly, so the oracle runs on the parquet twin.
    */
  def cs1CsvDimJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nationCsv(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pf1_param_filter" -> (pf1ParamFilter _),
    "sa1_seeded_sample" -> (sa1SeededSample _),
    "cs1_csv_dim_join" -> (cs1CsvDimJoin _))

  val oracles: Map[String, String] = Map(
    "pf1_param_filter" ->
      """SELECT event_type, count(*) AS n,
        |round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value), 6) AS avg_value
        |FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
        |  AND hour(ts) BETWEEN 6 AND 18
        |  AND event_type IN ('view', 'click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cs1_csv_dim_join" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  // sa1 is engine-RNG-specific by design → rows-only check (exactly n rows).
}
