package graft

import java.io.File
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.MaterializedView

/** The maintenance loop's contracts, driven batch-by-batch (what the
  * single-file AvailableNow gate cannot show): merging across batches,
  * idempotent replay, and partition-level incrementality.
  */
class MaterializedViewSpec extends AnyFunSuite with SparkFixture {

  private def events(rows: (String, String, Double)*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (ts, t, v) =>
        org.apache.spark.sql.Row(Timestamp.valueOf(ts), t, v)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType))))
  }

  private def freshDir(name: String): String = {
    val d = new File(sys.props("java.io.tmpdir"), s"graft_mv_spec/$name")
    graft.sources.Staging.deleteRecursively(d)
    d.getAbsolutePath
  }

  private def servingRows(dir: String): Seq[(String, String, Long, Double)] =
    MaterializedView.readServing(spark, dir).collect()
      // timestamp_ntz collects as java.time.LocalDateTime
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("batches merge: two overlapping-day batches equal the from-scratch aggregate") {
    val dir = freshDir("merge")
    val b0 = events(
      ("2024-01-01 10:00:00", "view", 1.0), ("2024-01-01 11:00:00", "view", 2.0),
      ("2024-01-02 09:00:00", "click", 4.0))
    val b1 = events(
      ("2024-01-02 10:00:00", "click", 6.0), ("2024-01-03 08:00:00", "view", 10.0))
    MaterializedView.upsertBatch(b0, dir, 0L)
    MaterializedView.upsertBatch(b1, dir, 1L)
    assert(servingRows(dir) === Seq(
      ("2024-01-01T00:00", "view", 2L, 1.5),
      ("2024-01-02T00:00", "click", 2L, 5.0),
      ("2024-01-03T00:00", "view", 1L, 10.0)))
  }

  test("replayed batch ids are dropped — the upsert is idempotent") {
    val dir = freshDir("replay")
    val b0 = events(("2024-01-01 10:00:00", "view", 1.0))
    MaterializedView.upsertBatch(b0, dir, 0L)
    val once = servingRows(dir)
    // at-least-once redelivery of the SAME batch id must be a no-op
    MaterializedView.upsertBatch(b0, dir, 0L)
    assert(servingRows(dir) === once)
    // and a stale id arriving after a newer one is dropped too
    MaterializedView.upsertBatch(events(("2024-01-01 10:00:00", "view", 99.0)), dir, 0L)
    assert(servingRows(dir) === once)
  }

  test("a batch rewrites ONLY the date partitions it touches") {
    val dir = freshDir("incremental")
    MaterializedView.upsertBatch(events(
      ("2024-01-01 10:00:00", "view", 1.0), ("2024-01-02 10:00:00", "view", 2.0)), dir, 0L)
    val day1 = new File(dir, "data/day=2024-01-01")
    val before = Option(day1.listFiles).get
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.lastModified).toMap
    MaterializedView.upsertBatch(events(("2024-01-02 12:00:00", "view", 4.0)), dir, 1L)
    val after = Option(day1.listFiles).get
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.lastModified).toMap
    assert(after === before, "untouched partition was rewritten")
    assert(servingRows(dir) === Seq(
      ("2024-01-01T00:00", "view", 1L, 1.0),
      ("2024-01-02T00:00", "view", 2L, 3.0)))
  }

  test("crash between data write and commit: recovery restores, redelivery applies ONCE") {
    val dir = freshDir("crash_precommit")
    MaterializedView.upsertBatch(events(("2024-01-01 10:00:00", "view", 1.0)), dir, 0L)
    val before = servingRows(dir)
    // simulate the torn state batch 1 leaves when it dies AFTER its data
    // write but BEFORE the commit flip: original partition renamed aside,
    // an (uncommitted) rewrite in its place, state still pending
    val data = new File(dir, "data")
    val live = new File(data, "day=2024-01-01")
    val bak = new File(data, ".bak_day=2024-01-01")
    assert(live.renameTo(bak))
    assert(live.mkdirs()) // stand-in for the uncommitted rewrite
    java.nio.file.Files.write(new File(dir, "_graft_state").toPath,
      "pending 1 0 2024-01-01:old".getBytes)
    // redelivery of batch 1: recovery must restore the original, then
    // apply the batch exactly once — NOT double-count
    MaterializedView.upsertBatch(events(("2024-01-01 11:00:00", "view", 3.0)), dir, 1L)
    assert(servingRows(dir) === Seq(("2024-01-01T00:00", "view", 2L, 2.0)))
    assert(before === Seq(("2024-01-01T00:00", "view", 1L, 1.0)))
  }

  test("crash mid-write of a brand-new partition: the partial dir is discarded") {
    val dir = freshDir("crash_newday")
    MaterializedView.upsertBatch(events(("2024-01-01 10:00:00", "view", 1.0)), dir, 0L)
    val data = new File(dir, "data")
    val partial = new File(data, "day=2024-01-02")
    assert(partial.mkdirs()) // uncommitted partial write, no backup
    java.nio.file.Files.write(new File(dir, "_graft_state").toPath,
      "pending 1 0 2024-01-02:new".getBytes)
    MaterializedView.upsertBatch(events(("2024-01-02 09:00:00", "click", 4.0)), dir, 1L)
    assert(servingRows(dir) === Seq(
      ("2024-01-01T00:00", "view", 1L, 1.0),
      ("2024-01-02T00:00", "click", 1L, 4.0)))
  }

  test("post-commit backup leftovers are swept, data untouched") {
    val dir = freshDir("leftover")
    MaterializedView.upsertBatch(events(("2024-01-01 10:00:00", "view", 1.0)), dir, 0L)
    val stray = new File(dir, "data/.bak_day=2024-01-01")
    assert(stray.mkdirs())
    MaterializedView.upsertBatch(events(("2024-01-01 12:00:00", "view", 5.0)), dir, 1L)
    assert(!stray.exists(), "post-commit backup not swept")
    assert(servingRows(dir) === Seq(("2024-01-01T00:00", "view", 2L, 3.0)))
  }

  test("empty batches advance the applied-id watermark without writing data") {
    val dir = freshDir("empty")
    MaterializedView.upsertBatch(events(), dir, 0L)
    MaterializedView.upsertBatch(events(("2024-01-01 10:00:00", "view", 1.0)), dir, 1L)
    assert(servingRows(dir) === Seq(("2024-01-01T00:00", "view", 1L, 1.0)))
  }

  // ------------------------------------------------- st13 latest-per-key

  private def uevents(rows: (Long, String, String, Double, Long)*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (u, ts, t, v, id) =>
        org.apache.spark.sql.Row(u, Timestamp.valueOf(ts), t, v, id)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType))))
  }

  private def latestRows(dir: String): Seq[(Long, String, String, Long)] =
    MaterializedView.readLatest(spark, dir).collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getString(2), r.getLong(4)))
      .toSeq

  test("st13: newer batches override, older events never resurrect, replay is a no-op") {
    val dir = freshDir("latest")
    MaterializedView.upsertLatest(uevents(
      (1L, "2024-01-01 09:00:00", "view", 1.0, 99L),
      (1L, "2024-01-01 10:00:00", "click", 2.0, 100L),
      (2L, "2024-01-01 11:00:00", "view", 3.0, 101L)), dir, 0L)
    assert(latestRows(dir) === Seq(
      (1L, "2024-01-01T10:00", "click", 100L),
      (2L, "2024-01-01T11:00", "view", 101L)))
    // batch 1: user 1 advances; user 2 gets an OLDER event (must not win)
    val b1 = uevents(
      (1L, "2024-01-01 12:00:00", "purchase", 4.0, 102L),
      (2L, "2024-01-01 08:00:00", "view", 9.0, 50L),
      (16L, "2024-01-01 13:00:00", "view", 5.0, 103L))
    MaterializedView.upsertLatest(b1, dir, 1L)
    val after = Seq(
      (1L, "2024-01-01T12:00", "purchase", 102L),
      (2L, "2024-01-01T11:00", "view", 101L),
      (16L, "2024-01-01T13:00", "view", 103L))
    assert(latestRows(dir) === after)
    // at-least-once redelivery must be a no-op
    MaterializedView.upsertLatest(b1, dir, 1L)
    assert(latestRows(dir) === after)
  }

  test("st13: a batch rewrites only the key buckets it touches") {
    val dir = freshDir("latest_buckets")
    // users 1 (bucket 1), 2 (bucket 2), 16 (bucket 0)
    MaterializedView.upsertLatest(uevents(
      (1L, "2024-01-01 09:00:00", "view", 1.0, 1L),
      (2L, "2024-01-01 09:00:00", "view", 1.0, 2L),
      (16L, "2024-01-01 09:00:00", "view", 1.0, 3L)), dir, 0L)
    val bucket2 = new File(dir, "data/bucket=2")
    val before = Option(bucket2.listFiles).get
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.lastModified).toMap
    // batch touches buckets 0 and 1 only
    MaterializedView.upsertLatest(uevents(
      (1L, "2024-01-01 10:00:00", "click", 2.0, 4L),
      (16L, "2024-01-01 10:00:00", "click", 2.0, 5L)), dir, 1L)
    val after = Option(bucket2.listFiles).get
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.lastModified).toMap
    assert(after === before, "untouched key bucket was rewritten")
    assert(latestRows(dir).map(t => (t._1, t._4)) === Seq((1L, 4L), (2L, 2L), (16L, 5L)))
  }
}
