package graft

/** Dev tool: dump `.explain("formatted")` for a set of registry queries to
  * files — `runMain graft.ExplainAll <outDir> <suffix> [query ...]` (no
  * queries = whole bench registry). One JVM for the whole batch, so the
  * round's plans/r19/<query>_before.txt / _after.txt deliverables don't
  * pay 202 session startups.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1) // e.g. "before" / "after"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val registry = SparkEntry.benchQueries
    val names =
      if (args.length > 2) args.drop(2).toSeq else registry.keys.toSeq.sorted
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val fn = registry.getOrElse(name, sys.error(s"unknown query '$name'"))
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          dir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"[explainall] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[explainall] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
