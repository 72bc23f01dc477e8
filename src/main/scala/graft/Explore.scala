package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of a registry query and
  * time it (noop sink). `runMain graft.Explore <query> [sfDir]`.
  */
object Explore {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = SparkEntry.benchQueries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.benchQueries.keys.toSeq.sorted.mkString(", ")}")
    )(spark, sfDir)
    println("=== EXPLAIN " + name + " ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"=== TIME ${(System.nanoTime() - t0) / 1e9}%.2f s (cold) ===")
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"=== TIME ${(System.nanoTime() - t1) / 1e9}%.2f s (warm) ===")
    spark.stop()
  }
}
