package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.functions._

/** Incremental MATERIALIZED-VIEW maintenance over the event stream —
  * `foreachBatch` + idempotent partition-level upsert into a serving
  * table. This is the always-on twin of a nightly `GROUP BY` rebuild: the
  * daily (day × event_type) aggregate stays queryable and
  * seconds-fresh while each micro-batch touches ONLY the date partitions
  * it carries rows for. At 100 TB the full rebuild rescans years of
  * history per refresh; this path reads one micro-batch plus the handful
  * of affected partitions of the (tiny, pre-aggregated) serving table.
  *
  * Correctness mechanics:
  *  - the serving row is a MERGEABLE state: (n, exact DECIMAL(38,6) sum).
  *    Merging partial aggregates is associative/commutative, so any batch
  *    arrival order yields the same table — the same reason Spark's own
  *    partial aggregation is correct. The avg is derived at read time
  *    (never stored: an avg is not mergeable).
  *  - `foreachBatch` is at-least-once: a batch can re-run after a crash
  *    BETWEEN the serving write and the checkpoint commit. The upsert is
  *    made idempotent the standard way — the serving table records the
  *    last applied batch id (written AFTER its data, inside the same
  *    lock) and re-deliveries of a batch id ≤ the recorded one are
  *    dropped before touching data.
  *  - the writer holds the cross-process staging lock for the
  *    read-merge-write, so a concurrent batch reader of the serving table
  *    never interleaves with a half-written upsert (same discipline as
  *    every other staging area; a transactional table format replaces the
  *    lock at deployment scale).
  */
object MaterializedView {

  private val Exact = DecimalType(38, 6)

  /** Serving-table schema (data columns; `day` is the partition column). */
  private def servingSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("n", LongType),
    StructField("sum_value", Exact),
    StructField("day", DateType)))

  /** Aggregate ONE micro-batch to its mergeable per-(day, type) deltas. */
  private def batchDeltas(batch: DataFrame): DataFrame =
    batch.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(Exact)).as("sum_value"))

  /** Idempotent partition-level upsert of one micro-batch into the serving
    * table at `dir`. Public for the spec, which drives it directly with
    * replayed batch ids.
    */
  def upsertBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new File(dir)
    graft.sources.Staging.withExclusiveLock(root) {
      val idFile = new File(root, "_graft_last_batch")
      val lastApplied =
        if (idFile.exists())
          new String(java.nio.file.Files.readAllBytes(idFile.toPath)).trim.toLong
        else -1L
      if (batchId > lastApplied) {
        // the delta set is bounded (days-in-batch × event types) — collect
        // once so the merge below re-reads rows, not the batch plan
        val deltas = batchDeltas(batch)
        val rows = deltas.collect()
        if (rows.nonEmpty) {
          val days = rows.map(_.getAs[java.sql.Date]("day").toString).distinct.toSeq
          val deltaDf = spark.createDataFrame(
            new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), deltas.schema)
          val dataDir = new File(root, "data")
          val existing =
            if (new File(dataDir, "_SUCCESS").exists() ||
                Option(dataDir.listFiles).exists(_.exists(_.getName.startsWith("day="))))
              spark.read.schema(servingSchema).parquet(dataDir.getAbsolutePath)
                .filter(col("day").cast("string").isin(days: _*))
            else spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), servingSchema)
          val merged = existing
            .unionByName(deltaDf.select(col("event_type"), col("n"), col("sum_value"), col("day")))
            .groupBy(col("day"), col("event_type"))
            .agg(sum(col("n")).cast(LongType).as("n"),
              sum(col("sum_value")).cast(Exact).as("sum_value"))
          val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          try merged
            .repartition(col("day"))
            .write.mode("overwrite").partitionBy("day")
            .parquet(dataDir.getAbsolutePath)
          finally prev match {
            case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
            case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
          }
        }
        java.nio.file.Files.write(idFile.toPath, batchId.toString.getBytes)
        ()
      }
    }
  }

  /** Read the serving table (exact sums → derived avg, ordered). */
  def readServing(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(servingSchema).parquet(new File(dir, "data").getAbsolutePath)
      .select(col("day").cast("timestamp_ntz").as("day"), col("event_type"),
        col("n"),
        r6(col("sum_value").cast("double") / col("n")).as("avg_value"))
      .orderBy(col("day"), col("event_type"))

  /** st9 — drive the event stream through the maintenance loop
    * (AvailableNow drains the backlog), then return the serving table.
    * Stateless source → no watermark needed; exactly-once effect comes
    * from the checkpoint + the idempotent upsert.
    */
  def st9MvMaintenance(spark: SparkSession, sfDir: String): DataFrame = {
    val base = EventStreams.stagingDir("st9_mv")
    val serve = new File(base, "serve").getAbsolutePath
    val chk = new File(base, "chk").getAbsolutePath
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      EventStreams.GateStatePartitions.toString)
    try EventStreams.eventStream(spark, sfDir)
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) => upsertBatch(b, serve, id))
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    readServing(spark, serve)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st9_mv_maintenance" -> (st9MvMaintenance _))

  val oracles: Map[String, String] = Map(
    // the maintained view must equal the from-scratch batch aggregate
    "st9_mv_maintenance" ->
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type,
        |count(*) AS n,
        |round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |  * 1e6) / 1e6 AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
