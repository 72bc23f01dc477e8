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

  /** Layout statistics of a partitioned table dir — the metadata-scale
    * health signal the maintenance POLICY reads (one directory listing,
    * never a data scan; at 100 TB this is a catalog/manifest query). The
    * skew component (`maxFilesPerPartition`) matters independently of
    * the total: one hot date/cell fragmenting 100× slows every scan that
    * prunes TO it even when the table-wide mean looks healthy — the same
    * tail argument as sim17's cell-imbalance monitor.
    */
  final case class Layout(
      partitions: Int, dataFiles: Int, maxFilesPerPartition: Int)

  def layout(tableDir: String): Layout = {
    val parts = partitionDirs(new File(tableDir))
    val counts = parts.map(p =>
      Option(p.listFiles).getOrElse(Array.empty).count(isDataFile))
    Layout(parts.length, counts.sum, if (counts.isEmpty) 0 else counts.max)
  }

  /** Policy threshold: a partition holding this many data files is due.
    * Each incremental refresh / upsert / micro-batch leaves ~1 extra file
    * per touched partition, so the threshold is "how many refreshes may
    * accumulate before the sweep" — small here so the spec drill trips
    * it in a handful of installments; production tunes it to the refresh
    * cadence (e.g. 24 hourly upserts → nightly sweep).
    */
  val DueFilesPerPartition = 3

  /** The maintenance DECISION — r16, closing the "sim8 compacts on
    * demand; nothing decides when" gap: compaction is due when any
    * partition's fragment count reaches the threshold. Pure function of
    * [[layout]] so the spec drill and any scheduler read the same rule.
    */
  def compactionDue(l: Layout,
      maxFilesPerPartition: Int = DueFilesPerPartition): Boolean =
    l.maxFilesPerPartition >= maxFilesPerPartition

  /** One maintenance TICK: measure → decide → (maybe) compact — the loop
    * body a nightly maintenance job runs per staged table (the sim20
    * pattern: the monitor's alarm drives its own remedy). Returns the
    * observed layout and the compaction report when the policy fired;
    * a healthy table costs exactly one directory listing.
    */
  def maintenanceTick(
      spark: SparkSession, tableDir: String,
      targetBytes: Long = 128L << 20,
      maxFilesPerPartition: Int = DueFilesPerPartition): (Layout, Option[Report]) = {
    val l = layout(tableDir)
    if (compactionDue(l, maxFilesPerPartition))
      (l, Some(compact(spark, tableDir, targetBytes, minFiles = 2)))
    else (l, None)
  }

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
