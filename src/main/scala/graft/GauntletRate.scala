package graft

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{EventStreams, StreamDedup}

/** Sustained-throughput record for the streaming ADMISSION surface (r17
  * verdict item 6): the nine stateless gates claim "source throughput at
  * 100 TB" from plan shape — correct reasoning (scan → project → sink, no
  * watermark, no state store, no shuffle), but a claim without a number
  * has no regression gate. This main measures the two headline frames at
  * an sf1-class volume and stamps rows/sec beside the host canaries:
  *
  *  - st24 (the fused five-screen gauntlet) over the documents corpus —
  *    the whole corpus is gated (`arrivalsFrom = 0`), because the
  *    registry's 50-doc arrival batch cannot carry a rate claim; the
  *    door ARTIFACTS (vocab/LM/bloom) still build from the real history
  *    split and their build cost is timed separately (`door_build_sec`,
  *    a once-per-corpus-version cost, not a per-row one);
  *  - st8 (clean-layer ingestion, date-partitioned parquet sink) over
  *    the events table.
  *
  * Both sources are restaged as 16-file directories and drained with
  * `maxFilesPerTrigger = 2` (the restart drill's admission bound), so the
  * measured rate covers 8 sustained micro-batches including commit
  * machinery — the honest per-arrival cost, not one giant batch's
  * amortized scan. The drain is timed from query start to termination;
  * rows are counted from the sink read-back (same rows the source holds —
  * both frames are row-preserving at these inputs).
  *
  * Regression gate — ARMED BY DEFAULT since r19 (the r18 verdict's
  * "floor gate guards nothing" point): the run exits 1 if either frame
  * lands under its floor. Floors default to the conservative
  * clean-window bars [[DefaultFloors]] (st8 ≥ 60 k rows/s, st24 ≥
  * 1.5 k docs/s — half the r18 canary-clean measurements, so host
  * variance doesn't false-trip but a real 2× regression cannot hide).
  * SPARK_GRAFT_RATE_FLOOR_ROWS_SEC overrides: a bare number applies to
  * both frames, `st8=60000,st24=1500` sets them separately, `0`
  * disarms. The armed floors are stamped into the record
  * (`floors`) so a green record visibly claims the bar it cleared.
  *
  * Output: one JSON record (default `bench/r19_gauntlet_rate.json`).
  */
object GauntletRate {

  val SourceFiles = 16
  val MaxFilesPerTrigger = 2

  /** Conservative clean-window floors (rows/sec), armed when the env
    * knob is unset: half of r18's canary-clean measurements (st8
    * 120.2 k, st24 2.9 k — bench/r18_gauntlet_rate.json).
    */
  val DefaultFloors: Map[String, Double] =
    Map("st8" -> 60000.0, "st24" -> 1500.0)

  /** Parse the floor knob: None/"" → defaults; "0" → disarmed; a bare
    * number → both frames; "st8=N,st24=M" → per-frame.
    */
  private[graft] def parseFloors(env: Option[String]): Map[String, Double] =
    env.map(_.trim).filter(_.nonEmpty) match {
      case None => DefaultFloors
      case Some("0") => Map.empty
      case Some(s) if s.contains("=") =>
        s.split(",").iterator.map(_.split("=")).collect {
          case Array(k, v) => k.trim -> v.trim.toDouble
        }.toMap
      case Some(s) => Map("st8" -> s.toDouble, "st24" -> s.toDouble)
    }

  /** The gate itself, pure so the synthetic-slowdown test can trip it:
    * names of frames whose measured rate is under their armed floor.
    */
  private[graft] def floorViolations(
      rates: Map[String, Double], floors: Map[String, Double]): Seq[String] =
    rates.toSeq.sortBy(_._1).collect {
      case (k, r) if floors.get(k).exists(r < _) =>
        f"$k: $r%.0f rows/s < floor ${floors(k)}%.0f"
    }

  /** Drain a streaming frame to a parquet sink and time it. Returns
    * (rows emitted, drain seconds, micro-batches committed).
    */
  private def timedDrain(
      spark: SparkSession, frame: DataFrame, name: String): (Long, Double, Long) = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_rate/p${ProcessHandle.current().pid()}/$name")
    graft.sources.Staging.deleteRecursively(base)
    val out = new File(base, "out").getAbsolutePath
    val chk = new File(base, "chk").getAbsolutePath
    val t0 = System.nanoTime()
    val q = frame.writeStream
      .outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val batches = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L)
    val rows = spark.read.schema(frame.schema).parquet(out).count()
    graft.sources.Staging.deleteRecursively(base)
    (rows, secs, batches)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      s"${sys.props("user.dir")}/target/sf1synth")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_RATE_OUT", "bench/r19_gauntlet_rate.json")
    val floors = parseFloors(sys.env.get("SPARK_GRAFT_RATE_FLOOR_ROWS_SEC"))
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val opts = Map("maxFilesPerTrigger" -> MaxFilesPerTrigger.toString)

    // ---- st8: event ingestion ------------------------------------------
    val evSf = graft.sources.Staging.stageMultiFile(
      spark, sfDir, "events", SourceFiles, "rate_src")
    val (evRows, evSecs, evBatches) = timedDrain(spark,
      EventStreams.st8Frame(EventStreams.eventStream(spark, evSf, opts)),
      "st8_rate")
    val evRate = evRows / evSecs
    System.err.println(
      f"[rate] st8_stream_ingest: $evRows rows / $evSecs%.2f s = $evRate%.0f rows/s ($evBatches batches)")

    // ---- st24: fused admission gauntlet --------------------------------
    val docSf = graft.sources.Staging.stageMultiFile(
      spark, sfDir, "documents", SourceFiles, "rate_src")
    // door artifacts build inside frame construction — timed apart
    val tb0 = System.nanoTime()
    val gated = StreamDedup.st24GatedFrame(
      spark, docSf, arrivalsFrom = Some(0L), sourceOptions = opts)
    val doorBuildSecs = (System.nanoTime() - tb0) / 1e9
    val (docRows, docSecs, docBatches) = timedDrain(spark, gated, "st24_rate")
    val docRate = docRows / docSecs
    System.err.println(
      f"[rate] st24_stream_gauntlet: $docRows docs / $docSecs%.2f s = $docRate%.0f docs/s " +
        f"($docBatches batches; door artifacts $doorBuildSecs%.2f s, once per corpus version)")

    // host canaries beside the rates, so a slower box reads as a slower
    // box instead of a throughput regression (the Bench discipline)
    val cpuCanary = Bench.canaryCpu()
    val sparkCanary = Bench.canarySpark(spark)
    val takeId = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now()) + "-p" + ProcessHandle.current().pid()
    val rec =
      s"""{"sf":"$sfDir","take_id":"$takeId",""" +
        s""""source_files":$SourceFiles,"max_files_per_trigger":$MaxFilesPerTrigger,""" +
        s""""canary_cpu_sec":$cpuCanary,"canary_spark_sec":$sparkCanary,""" +
        s""""st8_stream_ingest":{"rows":$evRows,"drain_sec":$evSecs,""" +
        s""""batches":$evBatches,"rows_per_sec":$evRate},""" +
        s""""st24_stream_gauntlet":{"rows":$docRows,"drain_sec":$docSecs,""" +
        s""""batches":$docBatches,"rows_per_sec":$docRate,""" +
        s""""door_build_sec":$doorBuildSecs},""" +
        s""""floors":${floors.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")}}"""
    val out = java.nio.file.Paths.get(outPath)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, rec)
    println(rec)
    spark.stop()
    val violations =
      floorViolations(Map("st8" -> evRate, "st24" -> docRate), floors)
    if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[rate] FLOOR VIOLATION: $v"))
      sys.exit(1)
    }
  }
}
