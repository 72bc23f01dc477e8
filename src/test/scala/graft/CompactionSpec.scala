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

  test("compaction POLICY loop: installments fragment a cell segment until the threshold trips; the tick compacts; serve hash unchanged, layout restored") {
    // The r15 residual: sim8 compacts on demand, nothing decided WHEN.
    // The loop under drill: streaming installments append ~1 file per
    // touched cell per micro-batch; Compaction.layout is the metadata-
    // scale monitor, compactionDue the decision, maintenanceTick the
    // remedy — the sim20 pattern (the monitor drives its own fix).
    import spark.implicits._
    val dir = freshDir("policy")
    def serveHash(): Seq[String] =
      spark.read.parquet(dir.getAbsolutePath)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .collect().map(_.toString).sorted.toSeq
    // ingest installments: each append writes one file into each of 2 cells
    var tripped = -1
    var preTripHash: Seq[String] = null
    (1 to Compaction.DueFilesPerPartition).foreach { i =>
      (1 to 50).map(j => (j % 2, i.toLong * 1000 + j, j * 0.5))
        .toDF("cell", "k", "v")
        .repartition(1)
        .write.mode("append").partitionBy("cell").parquet(dir.getAbsolutePath)
      val l = Compaction.layout(dir.getAbsolutePath)
      assert(l.maxFilesPerPartition === i, s"installment $i: $l")
      if (Compaction.compactionDue(l) && tripped < 0) {
        tripped = i
        preTripHash = serveHash()
      } else if (tripped < 0)
        assert(!Compaction.compactionDue(l),
          s"policy fired early at installment $i: $l")
    }
    assert(tripped === Compaction.DueFilesPerPartition,
      "the policy must trip exactly at the documented threshold")
    // the tick runs the remedy
    val (lDue, report) = Compaction.maintenanceTick(spark, dir.getAbsolutePath)
    assert(report.isDefined, s"tick must compact when due: $lDue")
    assert(serveHash() === preTripHash,
      "compaction changed the served content")
    val after = Compaction.layout(dir.getAbsolutePath)
    assert(after.maxFilesPerPartition === 1 && after.dataFiles === 2,
      s"layout not restored to one file per cell: $after")
    // a healthy table's next tick is a no-op listing
    val (lOk, none) = Compaction.maintenanceTick(spark, dir.getAbsolutePath)
    assert(none.isEmpty && !Compaction.compactionDue(lOk))
  }
}
