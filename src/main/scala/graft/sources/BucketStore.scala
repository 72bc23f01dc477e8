package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed staging for the fact⋈fact join path — the co-location move
  * that makes a 100 TB lineitem⋈orders join run WITHOUT shuffling either
  * side: both tables are written `bucketBy(N, joinKey)` once at staging
  * time, so every join on that key afterwards reads bucket i of one table
  * against bucket i of the other (a zero-Exchange sort-merge join,
  * audited in PlanSpec). At scale this is the difference between
  * re-shuffling 100 TB per join and shuffling it once per RE-STAGE —
  * exactly the trade a nightly-build serving layer wants, and the same
  * write-once-serve-many philosophy as [[graft.operators.CleanStore]]
  * (date partitioning prunes time predicates; bucketing pre-partitions
  * join keys).
  *
  * Mechanics worth noting:
  *  - `bucketBy` requires a CATALOG table (`saveAsTable`): bucket
  *    metadata lives in the catalog, not in parquet. With the in-memory
  *    catalog a NEW session sees the files but not the table, so `ensure`
  *    re-registers an external bucketed table over the existing data
  *    (CREATE TABLE … CLUSTERED BY … LOCATION) instead of rebuilding —
  *    bucket ids are also encoded in the file names, which is what lets a
  *    re-registration trust them.
  *  - The build repartitions by the bucket expression first: bucketing
  *    and `repartition` share the same Murmur3 `pmod` assignment, so each
  *    write task holds exactly one bucket's rows ⇒ ONE file per bucket.
  *    One file per bucket also preserves the `sortBy` order at read time,
  *    letting the sort-merge join skip its per-partition sorts.
  *  - Same cross-process discipline as every other staging area: the
  *    whole check-then-maybe-write runs under the exclusive lock,
  *    double-checked, with a build-logic spec file (schema + bucket spec)
  *    invalidating stale layouts.
  */
object BucketStore {

  /** 8 buckets ≈ the driver corpus's parallelism sweet spot. At 100 TB
    * the number is sized so one bucket of the LARGER table fits a single
    * executor's scan budget (e.g. 4096 buckets × ~25 GB); both sides of
    * a co-located join must share the count, so it is part of the staged
    * spec and a change forces a coordinated re-stage.
    */
  val NumBuckets = 8

  private def sfKey(sfDir: String): String =
    new File(sfDir).getName.replaceAll("[^A-Za-z0-9_]", "_")

  def dataDir(sfDir: String, table: String): String =
    s"${sys.props("user.dir")}/target/buckets/${new File(sfDir).getName}/$table"

  def tableName(sfDir: String, table: String, key: String): String =
    s"graft_${sfKey(sfDir)}_${table}_by_$key"

  /** Serve the bucketed table from a pointer-swap SNAPSHOT (r16,
    * replacing the in-place delete-and-rewrite that kept the documented
    * refresh-abort window): a re-stage builds a NEW immutable
    * `snap=<id>` directory and swaps the manifest pointer, so a
    * co-located join scanning the previous generation completes against
    * intact files. Bucket metadata lives in the catalog, not in parquet,
    * and a catalog table pins ONE location — so each snapshot gets its
    * own table name (`…_s<id>`): registration is idempotent per
    * snapshot, readers holding the previous generation's table keep a
    * valid catalog entry until its snapshot ages out of the
    * {current, previous} horizon, and a stale-table query past that
    * fails LOUD on missing files, never torn. The build writes through a
    * transient `…_build` name (bucketBy requires saveAsTable) dropped
    * immediately — external tables keep their files.
    */
  private def ensure(
      spark: SparkSession, sfDir: String, table: String, key: String): DataFrame = {
    val dir = dataDir(sfDir, table)
    val name = tableName(sfDir, table, key)
    val source = new File(Tables.path(sfDir, table))
    val src = Tables(spark, sfDir, table)
    val spec = s"buckets=$NumBuckets key=$key\n" + Staging.planSpec(src) +
      "\n" + Staging.sourceStamp(Seq(source))
    val snap = ManifestStore.ensureSnapshot(new File(dir), spec,
        ManifestStore.IndexReaderGraceMs) { snapPath =>
      val buildName = s"${name}_build"
      spark.sql(s"DROP TABLE IF EXISTS $buildName")
      src.repartition(NumBuckets, col(key))
        .write.format("parquet")
        .bucketBy(NumBuckets, key)
        .sortBy(key)
        .option("path", snapPath)
        .mode("overwrite")
        .saveAsTable(buildName)
      spark.sql(s"DROP TABLE IF EXISTS $buildName") // external: files stay
      ()
    }
    val snapName = s"${name}_s${snap.getName.stripPrefix("snap=")}"
    // catalog registration is session-local — serialize same-process
    // callers; cross-process needs none (each session registers its own)
    this.synchronized {
      if (!spark.catalog.tableExists(snapName))
        spark.sql(
          s"""CREATE TABLE $snapName (${src.schema.toDDL})
             |USING PARQUET
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS
             |LOCATION '${snap.getAbsolutePath}'""".stripMargin)
      else
        // ids are never reused (ManifestStore claims pre-sweep), so an
        // existing entry always names THIS snapshot's location — but its
        // cached file listing may predate a concurrent publisher in
        // another session having GC'd and re-listed; refresh is
        // metadata-only and keeps the serve loud-proof
        spark.sql(s"REFRESH TABLE $snapName")
    }
    spark.table(snapName)
  }

  def lineitemByOrderkey(spark: SparkSession, sfDir: String): DataFrame =
    ensure(spark, sfDir, "lineitem", "l_orderkey")

  def ordersByOrderkey(spark: SparkSession, sfDir: String): DataFrame =
    ensure(spark, sfDir, "orders", "o_orderkey")

  /** Events bucketed by user: bucketing satisfies not just join
    * co-location but WINDOW and groupBy distribution requirements — every
    * per-user window chain (gaps, funnels, as-of anchors, snapshots)
    * reads this staging with ZERO hash exchange. The nanos→µs timestamp
    * normalization is materialized into the staged files, so it is paid
    * once at stage time, not per query.
    */
  def eventsByUser(spark: SparkSession, sfDir: String): DataFrame =
    ensure(spark, sfDir, "events", "user_id")
}
