package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Results are forced through the `noop` sink so the full plan executes
  * (a bare `count()` lets Catalyst skip projections and UDF-free scans).
  *
  * Failures are LOUD: a query that throws is excluded from `queries` and
  * recorded under `errors` with its exception — never a fake wall time.
  *
  * Optional args: query names to restrict the run to (iteration aid);
  * no args = the full registry.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once so per-query numbers measure the
    // query, not first-call classloading.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val selected = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (name, _) => args.isEmpty || args.contains(name) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + esc(e.take(300)) + "\""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${results.size - ok.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
