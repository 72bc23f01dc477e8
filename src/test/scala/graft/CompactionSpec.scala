package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Compaction

class CompactionSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): File = {
    val d = new File(sys.props("java.io.tmpdir"), s"graft_compact_spec/$name")
    graft.sources.Staging.deleteRecursively(d)
    d
  }

  private def dataFiles(part: File): Array[File] =
    Option(part.listFiles).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  /** A fragmented two-day table: 4 files per date partition. */
  private def writeFragmented(dir: File): Unit = {
    import spark.implicits._
    (1 to 400).map(i => (s"2024-01-0${i % 2 + 1}", i.toLong, i * 1.5))
      .toDF("day", "k", "v")
      .repartition(4)
      .write.partitionBy("day").parquet(dir.getAbsolutePath)
  }

  test("fragmented partitions collapse to one file each; content identical") {
    val dir = freshDir("basic")
    writeFragmented(dir)
    val beforeRows = spark.read.parquet(dir.getAbsolutePath)
      .collect().map(_.toString).sorted.toSeq
    val beforeFiles = new File(dir, "day=2024-01-01")
    assert(dataFiles(beforeFiles).length === 4)
    val report = Compaction.compact(spark, dir.getAbsolutePath)
    assert(report.partitionsCompacted === 2)
    assert(report.filesBefore === 8 && report.filesAfter === 2)
    assert(dataFiles(new File(dir, "day=2024-01-01")).length === 1)
    assert(dataFiles(new File(dir, "day=2024-01-02")).length === 1)
    val afterRows = spark.read.parquet(dir.getAbsolutePath)
      .collect().map(_.toString).sorted.toSeq
    assert(afterRows === beforeRows, "compaction changed the data")
  }

  test("a second compaction is a no-op") {
    val dir = freshDir("idempotent")
    writeFragmented(dir)
    Compaction.compact(spark, dir.getAbsolutePath)
    val again = Compaction.compact(spark, dir.getAbsolutePath)
    assert(again === Compaction.Report(0, 0, 0))
  }

  test("a crash between the swap renames is repaired on the next run") {
    val dir = freshDir("repair")
    writeFragmented(dir)
    // simulate the torn state: partition moved to trash, swap-in never ran
    val part = new File(dir, "day=2024-01-01")
    val rows = spark.read.parquet(dir.getAbsolutePath).count()
    assert(part.renameTo(new File(dir, ".trash_day=2024-01-01")))
    val report = Compaction.compact(spark, dir.getAbsolutePath)
    assert(report.partitionsCompacted === 2)
    assert(spark.read.parquet(dir.getAbsolutePath).count() === rows,
      "repair lost the trashed partition")
  }

  test("streaming file-sink tables are refused") {
    val dir = freshDir("sink")
    writeFragmented(dir)
    assert(new File(dir, "_spark_metadata").mkdirs())
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, dir.getAbsolutePath)
    }
    assert(e.getMessage.contains("_spark_metadata"))
  }

  test("the serving table stays queryable through compaction (MV tie-in)") {
    import java.sql.Timestamp
    val dir = freshDir("mv")
    // three upserts fragment day=2024-01-01 across three writes... each
    // dynamic overwrite REPLACES the partition, so fragment it the honest
    // way: distinct days per batch, then compact the multi-file day
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val batch = spark.createDataFrame(
      (1 to 64).map(i => org.apache.spark.sql.Row(
        Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"), "view", i.toDouble)).asJava,
      schema).repartition(6)
    graft.streaming.MaterializedView.upsertBatch(batch, dir.getAbsolutePath, 0L)
    val servedBefore = graft.streaming.MaterializedView
      .readServing(spark, dir.getAbsolutePath).collect().map(_.toString).toSeq
    Compaction.compact(spark, new File(dir, "data").getAbsolutePath, minFiles = 2)
    val servedAfter = graft.streaming.MaterializedView
      .readServing(spark, dir.getAbsolutePath).collect().map(_.toString).toSeq
    assert(servedAfter === servedBefore)
  }
}
