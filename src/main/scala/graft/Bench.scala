package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Results are forced through the `noop` sink so the full plan executes
  * (a bare `count()` lets Catalyst skip projections and UDF-free scans).
  *
  * Failures are LOUD: a query that throws is excluded from `queries` and
  * recorded under `errors` with its exception — never a fake wall time.
  * Unknown query names in args are an immediate error, not a silent
  * empty run.
  *
  * Per-query independence: the catalog cache is cleared between queries so
  * an operator that persists (pf1's dashboard cache) cannot donate its
  * InMemoryRelation to later queries via plan-fragment matching — each
  * number measures the operator over parquet.
  *
  * Optional args: query names to restrict the run to (iteration aid);
  * no args = the full registry.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val registry = SparkEntry.benchQueries
    val unknown = args.filterNot(registry.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"[bench] unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    // Warm the JVM/codegen paths once so per-query numbers measure the
    // query, not first-call classloading.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val selected = registry.toSeq.sortBy(_._1)
      .filter { case (name, _) => args.isEmpty || args.contains(name) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // no cross-query cache donation
      (name, sec, err)
    }
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + GraftSession.jsonEscape(e.take(300)) + "\""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${results.size - ok.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
