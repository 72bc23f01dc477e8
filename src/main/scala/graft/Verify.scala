package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. A query that
  * throws is loud: recorded in `errors.json` AND stderr (its parquet dir is
  * absent, so the driver marks it failed rather than silently skipping).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev workflow): comma-separated query-name subset
    val only = args.lift(2).map(_.split(',').toSet)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + GraftSession.jsonEscape(s) + "\""
    // Environment stamp (the Bench contended-gate lesson, r11): a
    // correctness cycle that ran slow-but-green on a loaded machine must
    // be attributable after the fact. Same fields, same threshold.
    locally {
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0").toDouble
      Files.writeString(Paths.get(s"$outDir/env.json"),
        s"""{"load_avg_start":$load,"max_load":$maxLoad,""" +
          s""""contended":${load > maxLoad},""" +
          s""""n_procs":${Runtime.getRuntime.availableProcessors}}""")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = selected.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        Some(name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
      }
    }
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
