package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CleanStore

/** The staging staleness contract: a table is rebuilt when the build LOGIC
  * changes, not only when the source file does — serving a staging the
  * current code never produced would silently break the pf3/feed oracles.
  */
class CleanStoreSpec extends AnyFunSuite with SparkFixture {

  test("staging rebuilds when the recorded build spec no longer matches") {
    CleanStore.events(spark, sf001).count() // materialize (or reuse)
    val specFile = new java.io.File(CleanStore.stagePath(sf001, "events"), "_graft_spec")
    assert(specFile.exists(), "spec fingerprint missing after build")
    val original = new String(Files.readAllBytes(specFile.toPath))
    assert(original.contains("ts"), s"spec should record schema+predicate: $original")

    // simulate a logic change from an older build: corrupt the fingerprint
    Files.write(specFile.toPath, "schema of an older build".getBytes)
    val n = CleanStore.events(spark, sf001).count()
    assert(n > 0)
    val rewritten = new String(Files.readAllBytes(specFile.toPath))
    assert(rewritten === original, "staging was not rebuilt on spec mismatch")
  }

  test("staging spec fingerprints the derive formulas, not just schema and filters") {
    CleanStore.lineitem(spark, sf001).count()
    val specFile = new java.io.File(CleanStore.stagePath(sf001, "lineitem"), "_graft_spec")
    val spec = new String(Files.readAllBytes(specFile.toPath))
    // a value-only logic edit (e.g. the receiptdate interval, a time-
    // feature formula) changes no schema and no filter — the spec must
    // carry the Project expressions so such an edit invalidates the
    // staging instead of silently serving stale values
    assert(spec.contains("P:"), s"no Project lists recorded in the spec:\n$spec")
    assert(spec.contains("INTERVAL '2' DAY") || spec.contains("INTERVAL 2"),
      s"the receiptdate derive formula is not in the spec:\n$spec")
  }

  test("concurrent first builds: the loser double-checks under the lock and skips its rebuild") {
    import org.apache.spark.sql.functions._
    val tmpSf = Files.createTempDirectory("graft_conc").toFile
    val stageDir = new java.io.File(CleanStore.stagePath(tmpSf.getAbsolutePath, "events"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    try {
      val base = graft.sources.Tables.events(spark, sf001)
      val d0 = base.select(to_date(col("ts")).as("d")).orderBy(col("d")).head.getDate(0)
      val src = base.filter(to_date(col("ts")) === lit(d0))
      val expected = src.count()
      src.write.parquet(new java.io.File(tmpSf, "events.parquet").getAbsolutePath)

      // two racers ensure the SAME never-built staging; the lock serializes
      // them and the loser's re-check must see the winner's marker+spec and
      // serve instead of rebuilding — if it rebuilt, the winner's already-
      // captured file listing would point at deleted files and its count
      // would throw
      val out = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.DataFrame]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { _ =>
        new Thread(() =>
          try out.add(CleanStore.events(spark.newSession(), tmpSf.getAbsolutePath))
          catch { case t: Throwable => errs.add(t); () })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"a racer failed: ${Option(errs.peek()).map(_.toString)}")
      val counts = out.toArray(Array.empty[org.apache.spark.sql.DataFrame]).map(_.count())
      assert(counts.length === 2 && counts.forall(_ === expected),
        s"torn or double-built staging: counts ${counts.toSeq}, wanted $expected")
    } finally {
      rm(tmpSf); rm(stageDir)
    }
  }

  test("incremental refresh: a source change restages only the affected date partitions") {
    import org.apache.spark.sql.functions._
    val tmpSf = Files.createTempDirectory("graft_incr").toFile
    val srcPath = new java.io.File(tmpSf, "events.parquet")
    val stageDir = new java.io.File(CleanStore.stagePath(tmpSf.getAbsolutePath, "events"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    try {
      // a 3-date source built from the driver corpus (ts already micros)
      val base = graft.sources.Tables.events(spark, sf001)
      val dates = base.select(to_date(col("ts")).as("d")).distinct()
        .orderBy(col("d")).limit(3).collect().map(_.getDate(0).toString)
      assert(dates.length === 3, "corpus has fewer than 3 event dates")
      base.filter(to_date(col("ts")).cast("string").isin(dates: _*))
        .write.parquet(srcPath.getAbsolutePath)

      // fresh sessions per phase: the Tables reader cache pins each
      // session's first file listing, and this test mutates the source
      val s1 = spark.newSession()
      val n0 = CleanStore.events(s1, tmpSf.getAbsolutePath).count()
      assert(n0 > 0)
      def dirFiles(d: String): Set[String] = {
        val dir = new java.io.File(stageDir, s"event_date=$d")
        Option(dir.listFiles).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => s"${f.getName}@${f.lastModified}").toSet
      }
      val before = dates.map(d => d -> dirFiles(d)).toMap
      val marker = new java.io.File(stageDir, "_SUCCESS")

      // 1) mtime touch, content unchanged: NOTHING restages
      assert(srcPath.setLastModified(marker.lastModified + 1))
      CleanStore.events(spark.newSession(), tmpSf.getAbsolutePath).count()
      dates.foreach { d =>
        assert(dirFiles(d) === before(d), s"unchanged date $d was rewritten")
      }

      // 2) change ONE date's values and DROP another: only those move
      val s2 = spark.newSession()
      val modified = graft.sources.Tables.events(s2, tmpSf.getAbsolutePath)
        .filter(to_date(col("ts")).cast("string") =!= dates(2)) // drop d2
        .withColumn("value",
          when(to_date(col("ts")).cast("string") === dates(0), col("value") * 2)
            .otherwise(col("value")))
      val tmp2 = new java.io.File(tmpSf, "events_v2.parquet")
      modified.write.parquet(tmp2.getAbsolutePath)
      // materialize the expectation BEFORE the swap — the lazy `modified`
      // plan holds the OLD source's file listing and cannot re-run after it
      val want = modified.filter(to_date(col("ts")).cast("string") === dates(0))
        .agg(sum(col("value"))).head.getDouble(0)
      rm(srcPath)
      assert(tmp2.renameTo(srcPath), "source swap failed")
      assert(srcPath.setLastModified(marker.lastModified + 2))

      CleanStore.events(spark.newSession(), tmpSf.getAbsolutePath).count()
      assert(dirFiles(dates(0)) !== before(dates(0)),
        s"changed date ${dates(0)} was not restaged")
      assert(dirFiles(dates(1)) === before(dates(1)),
        s"untouched date ${dates(1)} was rewritten — refresh is not incremental")
      assert(dirFiles(dates(2)).isEmpty &&
        !new java.io.File(stageDir, s"event_date=${dates(2)}").exists(),
        s"removed date ${dates(2)} still staged")
      // and the restaged content is the NEW content
      val staged = spark.newSession().read.parquet(stageDir.getAbsolutePath)
      val got = staged.filter(col("event_date").cast("string") === dates(0))
        .agg(sum(col("value"))).head.getDouble(0)
      assert(math.abs(want - got) < 1e-9, s"restaged values wrong: $got vs $want")
    } finally {
      rm(tmpSf); rm(stageDir)
    }
  }
}
