package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Results are forced through the `noop` sink so the full plan executes
  * (a bare `count()` lets Catalyst skip projections and UDF-free scans).
  *
  * Methodology: each query runs once COLD, then `SPARK_GRAFT_BENCH_RUNS−1`
  * more times (default 2 more), and `queries`/`value` report the BEST
  * post-cold run — a single-shot number charges one-time JIT and
  * plan-compile cost to whichever query hits a code path first (round 2's
  * official q01 was 27 s cold vs 2.9 s in isolation), and a single warm
  * run still inherits JVM-wide noise from its 119 neighbors (round 7's
  * record showed td4 at 2.8 s vs 0.77 s isolated — GC/compile contention,
  * not a plan change). Min-of-warm-runs is the standard noise floor.
  * The cold first-run times are kept honestly as `cold_queries`/
  * `cold_total`. Query order is the fixed registry sort, so rounds run
  * the same schedule.
  *
  * Failures are LOUD: a query that throws is excluded from `queries` and
  * recorded under `errors` with its exception — never a fake wall time.
  * Unknown query names in args are an immediate error, not a silent
  * empty run.
  *
  * Per-query independence: the catalog cache is cleared between queries so
  * an operator that persists (pf1's dashboard cache) cannot donate its
  * InMemoryRelation to later queries via plan-fragment matching — each
  * number measures the operator over parquet. (Within a query the runs
  * share whatever the operator itself caches — that IS its warm behavior.)
  *
  * Besides stdout (which log capturers have truncated in past rounds,
  * losing every per-query number), the full record is WRITTEN to
  * `SPARK_GRAFT_BENCH_OUT` (default `bench/last_run.json`) including a
  * PLAN FINGERPRINT per query — md5 of the canonicalized physical plan —
  * so a plan regression (lost broadcast, new exchange) diffs loudly
  * between rounds even when timings are noisy. `tools/benchdiff.py`
  * compares two records.
  *
  * Optional args: query names to restrict the run to (iteration aid);
  * no args = the full registry.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(2)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/last_run.json")
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
      // (seconds, canonicalized-plan fingerprint) — the fingerprint hashes
      // the plan Spark SELECTED, so a silent strategy regression (lost
      // broadcast, extra exchange) flags even when wall time is noisy.
      // Canonicalization normalizes exprIds but NOT the session-global
      // [plan_id=N] tags on Exchange nodes (or run-local checkpoint/
      // stream-output paths) — scrub those so the same plan hashes the
      // same across runs and JVMs.
      def timed(): Either[String, (Double, String)] = {
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          val canon = df.queryExecution.executedPlan.canonicalized.toString
            .replaceAll("\\[plan_id=\\d+\\]", "")
            .replaceAll("[-0-9a-f]{8,}\\.(parquet|json)", "<file>")
            .replaceAll("(target/streams|checkpoint)[^\\],\\s]*", "<rundir>")
            .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+@[0-9a-f]+", "\\$\\$Lambda")
            .replaceAll("graft_stream/p\\d+", "graft_stream/p<pid>")
          val fp = java.security.MessageDigest.getInstance("MD5")
            .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString.take(12)
          df.write.format("noop").mode("overwrite").save()
          Right(((System.nanoTime() - t0) / 1e9, fp))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Left(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      }
      val cold = timed()
      val rest = if (cold.isRight) (1 until runs).map(_ => timed()) else Seq(cold)
      val warm = rest.collectFirst { case Left(e) => Left(e) }
        .getOrElse(Right(rest.collect { case Right((s, fp)) => (s, fp) }
          .minBy(_._1)))
      spark.catalog.clearCache() // no cross-query cache donation
      (name, cold, warm)
    }
    val ok = results.collect { case (k, Right((c, fp)), Right((w, _))) => (k, c, w, fp) }
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Left(e)) =>
      "\"" + k + "\":\"" + GraftSession.jsonEscape(e.take(300)) + "\""
    }.mkString("{", ",", "}")
    val warmTotal = ok.map(_._3).sum
    val coldTotal = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":$warmTotal,"unit":"sec",""" +
        s""""queries":${obj(ok.map(r => r._1 -> r._3))},""" +
        s""""cold_total":$coldTotal,""" +
        s""""cold_queries":${obj(ok.map(r => r._1 -> r._2))},""" +
        s""""methodology":"queries/value = best of ${runs - 1} post-cold runs per query; cold_queries/cold_total = first run",""" +
        s""""errors":$errs,"n_failed":${results.size - ok.size},"sf":"$sfDir"}""")
    // Durable per-query record — the stdout line above can exceed a log
    // capturer's tail window (round 7's official record lost every
    // per-query number that way); this file is the committable history.
    val recJson =
      s"""{"sf":"$sfDir","runs":$runs,"n_failed":${results.size - ok.size},""" +
        s""""total_warm":$warmTotal,"total_cold":$coldTotal,""" +
        s""""errors":$errs,"queries":{""" +
        ok.map { case (k, c, w, fp) =>
          s""""$k":{"cold":$c,"warm":$w,"plan_fp":"$fp"}"""
        }.mkString(",") + "}}"
    val out = java.nio.file.Paths.get(outPath)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, recJson)
    // Truncation-proof headline: a second, SHORT, totals-only line printed
    // LAST survives any tail capture; a consumer that parses the final
    // JSON line of stdout always gets the headline numbers.
    println(
      s"""{"metric":"total","value":$warmTotal,"unit":"sec",""" +
        s""""cold_total":$coldTotal,"n_queries":${ok.size},""" +
        s""""n_failed":${results.size - ok.size},"sf":"$sfDir","record":"$outPath"}""")
    spark.stop()
  }
}
