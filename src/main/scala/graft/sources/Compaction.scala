package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession

/** Small-file compaction for the partitioned staging tables — the missing
  * third step of the ingest lifecycle (stage → serve → COMPACT). Batch
  * staging writes one file per partition, but incremental paths fragment:
  * every [[graft.operators.CleanStore]] incremental refresh and every
  * [[graft.streaming.MaterializedView]] upsert rewrites its partitions as
  * fresh files, and a long-running streaming ingest appends files per
  * micro-batch. At 100 TB, fragmentation is a first-order cost: a scan's
  * task count (and its scheduler + footer-read overhead) scales with FILE
  * count, not byte count — a day that should be 4 × 256 MB files but is
  * 4,000 × 256 KB files costs 1000× the per-task fixed overhead and
  * defeats row-group-level pruning.
  *
  * Mechanics: per partition directory, if there are ≥ `minFiles` data
  * files, rewrite them as `ceil(bytes / targetBytes)` files and swap the
  * directory in. The swap is two renames (partition → trash, rewritten →
  * partition) under the cross-process staging lock; a crash between them
  * leaves the partition recoverable from trash, and [[compact]] repairs
  * exactly that state on its next run before doing anything else. Data
  * files are byte-identical row-wise (one coalesced read-write, no
  * re-partitioning, no re-sort), so content fingerprints
  * (CleanStore's `_graft_partitions`) stay valid.
  *
  * Deliberately REFUSED for streaming file-sink output dirs
  * (`_spark_metadata` present): the sink's transaction log pins the exact
  * file set of committed batches, so replacing files behind it would make
  * readers miss the compacted data. The production posture for sink
  * output is the one st9 models — upsert micro-batches into a serving
  * table (which this CAN compact) and treat the raw sink dir as an
  * immutable landing zone.
  */
object Compaction {

  final case class Report(
      partitionsCompacted: Int, filesBefore: Int, filesAfter: Int)

  private def isDataFile(f: File): Boolean =
    f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")

  private def partitionDirs(root: File): Seq[File] =
    Option(root.listFiles).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.contains("=")).toSeq

  /** Repair a crash between the two swap renames: a `.trash_<part>` whose
    * partition directory is missing is the OLD data — restore it.
    * Completed swaps leave trash next to a live partition — delete it.
    */
  private def repair(root: File): Unit =
    Option(root.listFiles).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(".trash_"))
      .foreach { trash =>
        val part = new File(root, trash.getName.stripPrefix(".trash_"))
        if (!part.exists())
          require(trash.renameTo(part), s"repair failed: could not restore $trash")
        else Staging.deleteRecursively(trash)
      }

  def compact(
      spark: SparkSession, tableDir: String,
      targetBytes: Long = 128L << 20, minFiles: Int = 2): Report = {
    val root = new File(tableDir)
    require(!new File(root, "_spark_metadata").exists(),
      s"$tableDir is a streaming file-sink table: its _spark_metadata log pins " +
        "the committed file set, so in-place compaction would hide data from " +
        "readers. Upsert the sink's batches into a serving table (see " +
        "MaterializedView) and compact THAT.")
    Staging.withExclusiveLock(root) {
      repair(root)
      var (parts, before, after) = (0, 0, 0)
      partitionDirs(root).foreach { part =>
        val files = Option(part.listFiles).getOrElse(Array.empty).filter(isDataFile)
        if (files.length >= minFiles) {
          val bytes = files.map(_.length).sum
          val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
          if (nOut < files.length) {
            val rewritten = new File(root, s".compact_${part.getName}")
            Staging.deleteRecursively(rewritten)
            // read THIS partition's data files only (partition value lives
            // in the dir name, not the files) and rewrite them coalesced —
            // no shuffle, no re-sort, content unchanged
            spark.read.parquet(part.getAbsolutePath)
              .coalesce(nOut)
              .write.mode("overwrite").parquet(rewritten.getAbsolutePath)
            val trash = new File(root, s".trash_${part.getName}")
            Staging.deleteRecursively(trash)
            require(part.renameTo(trash), s"swap-out failed for $part")
            require(rewritten.renameTo(part), s"swap-in failed for $part")
            Staging.deleteRecursively(trash)
            parts += 1
            before += files.length
            after += Option(part.listFiles).getOrElse(Array.empty)
              .count(isDataFile)
          }
        }
      }
      Report(parts, before, after)
    }
  }
}
