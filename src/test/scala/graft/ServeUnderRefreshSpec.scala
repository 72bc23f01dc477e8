package graft

import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CleanStore

/** Concurrent-serving soak (r14 verdict item 3): pf3 serves from the
  * partitioned clean store while incremental refresh rewrites changed
  * dates via dynamic partition overwrite. The isolation contract under
  * test (pinned in ARTIFACTS.md):
  *
  *  - a reader's file LISTING is captured inside the staging lock, so a
  *    read always observes one committed snapshot — either the
  *    pre-refresh or the post-refresh content, never a mix;
  *  - a refresh that lands BETWEEN a reader's listing and its scan makes
  *    the scan fail LOUDLY (missing file) — the documented residual of
  *    in-place overwrite without a transactional format. A loud abort
  *    is legal; silently serving torn content is the failure mode this
  *    spec exists to catch.
  *
  * The soak flips the source between two versions (v2 doubles one
  * date's values) while reader threads hammer the serve path and
  * classify every successful read against the two legal snapshots.
  */
class ServeUnderRefreshSpec extends AnyFunSuite with SparkFixture {

  private def rm(f: File): Unit = {
    Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
  }

  test("pf3-style reads during per-date refresh flips see only the two legal snapshots") {
    val tmpSf = Files.createTempDirectory("graft_soak").toFile
    val srcPath = new File(tmpSf, "events.parquet")
    val stageDir = new File(CleanStore.stagePath(tmpSf.getAbsolutePath, "events"))
    try {
      // 2-date source; v2 doubles date0's values (the refresh rewrites
      // exactly that partition; date1 must never move)
      val base = graft.sources.Tables.events(spark, sf001)
      val dates = base.select(to_date(col("ts")).as("d")).distinct()
        .orderBy(col("d")).limit(2).collect().map(_.getDate(0).toString)
      assert(dates.length === 2)
      val v1df = base.filter(to_date(col("ts")).cast("string").isin(dates: _*))
      val v1File = new File(tmpSf, "v1.parquet")
      val v2File = new File(tmpSf, "v2.parquet")
      v1df.write.parquet(v1File.getAbsolutePath)
      v1df.withColumn("value",
          when(to_date(col("ts")).cast("string") === dates(0), col("value") * 2)
            .otherwise(col("value")))
        .write.parquet(v2File.getAbsolutePath)

      // the two legal snapshots, as (date -> (n, valueSum)) maps computed
      // from the source content itself (cleanEvents is a null drop; the
      // carved corpus has none, so clean == source)
      def snapshotOf(f: File): Map[String, (Long, Double)] =
        spark.read.parquet(f.getAbsolutePath)
          .groupBy(to_date(col("ts")).cast("string").as("d"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val snapV1 = snapshotOf(v1File)
      val snapV2 = snapshotOf(v2File)
      assert(snapV1 !== snapV2)

      def installSource(from: File, stampTick: Long): Unit = {
        // copy version files into place atomically enough for parquet
        // dir readers: a whole-dir source is swapped via rename
        val tmp = new File(tmpSf, s"swap_$stampTick")
        def copyDir(src: File, dst: File): Unit = {
          dst.mkdirs()
          Option(src.listFiles).getOrElse(Array.empty).foreach { c =>
            Files.copy(c.toPath, new File(dst, c.getName).toPath,
              StandardCopyOption.REPLACE_EXISTING)
          }
        }
        copyDir(from, tmp)
        rm(srcPath)
        assert(tmp.renameTo(srcPath), "source swap failed")
        // force a monotonically advancing (mtime, length) stamp
        Option(srcPath.listFiles).getOrElse(Array.empty)
          .foreach(f => f.setLastModified(1700000000000L + stampTick * 1000))
        srcPath.setLastModified(1700000000000L + stampTick * 1000); ()
      }
      installSource(v1File, 0)
      // initial build (also warms the fingerprint file)
      CleanStore.events(spark.newSession(), tmpSf.getAbsolutePath).count()

      val stop = new AtomicBoolean(false)
      val torn = new ConcurrentLinkedQueue[String]()
      val hardErrs = new ConcurrentLinkedQueue[Throwable]()
      val seen = new ConcurrentLinkedQueue[String]() // "v1" | "v2" | "abort"

      def classify(got: Map[String, (Long, Double)]): Option[String] = {
        def matches(want: Map[String, (Long, Double)]): Boolean =
          got.keySet == want.keySet && got.forall { case (d, (n, s)) =>
            val (wn, ws) = want(d); n == wn && math.abs(s - ws) < 1e-6
          }
        if (matches(snapV1)) Some("v1")
        else if (matches(snapV2)) Some("v2") else None
      }
      def isMissingFile(t: Throwable): Boolean =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).exists {
          c => c.isInstanceOf[java.io.FileNotFoundException] ||
            Option(c.getMessage).exists(_.contains("FILE_NOT_EXIST"))
        }

      val readers = (1 to 2).map { _ =>
        new Thread(() => {
          while (!stop.get()) {
            try {
              // the pf3 serve path: CleanStore.events + a per-date
              // aggregate materialized immediately
              val got = CleanStore.events(spark.newSession(), tmpSf.getAbsolutePath)
                .groupBy(col("event_date").cast("string").as("d"))
                .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
                .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
              classify(got) match {
                case Some(v) => seen.add(v); ()
                case None => torn.add(got.toString); ()
              }
            } catch {
              case t: Throwable =>
                if (isMissingFile(t)) { seen.add("abort"); () }
                else { hardErrs.add(t); () }
            }
          }
        })
      }
      readers.foreach(_.start())

      // refresher: flip v1 -> v2 -> v1 ... each flip swaps the source and
      // drives the incremental refresh through the SAME serve path any
      // server would use
      try {
        (1 to 4).foreach { i =>
          installSource(if (i % 2 == 1) v2File else v1File, i.toLong)
          CleanStore.events(spark.newSession(), tmpSf.getAbsolutePath).count()
          Thread.sleep(150)
        }
      } finally {
        stop.set(true)
        readers.foreach(_.join(120000))
      }

      assert(hardErrs.isEmpty,
        s"reader failed with a non-missing-file error: ${Option(hardErrs.peek()).map(_.toString)}")
      assert(torn.isEmpty,
        s"TORN read(s) observed — content matching neither legal snapshot: ${torn.toArray.mkString("; ")}")
      val outcomes = seen.toArray(Array.empty[String])
      assert(outcomes.count(v => v == "v1" || v == "v2") >= 4,
        s"soak too thin to prove anything: outcomes=${outcomes.groupBy(identity).view.mapValues(_.length).toMap}")
      info(s"soak outcomes: ${outcomes.groupBy(identity).view.mapValues(_.length).toMap}")
    } finally { rm(tmpSf); rm(stageDir) }
  }

  test("index-artifact probes under forced republish — ZERO aborts (r16 pointer-swap contract for adm/IVF/PQ/buckets)") {
    // The r15 residual this test retires: BucketStore, the learned-IVF /
    // PQ index artifacts and the adm store rewrote in place, so a probe's
    // in-flight scan racing a rebuild could abort loudly. All of them now
    // publish immutable snapshots behind a manifest pointer — a probe
    // pinned to the previous generation COMPLETES. Unlike the pf3 soak
    // above (in-place store, aborts legal-but-loud), the assertion here
    // is zero aborts.
    import graft.operators.Similarity
    import graft.sources.{BucketStore, Tables}
    val tmpSf = Files.createTempDirectory("graft_idx_soak").toFile
    val sfName = tmpSf.getName
    val stageRoots = Seq("adm", "ivf", "pq", "buckets")
      .map(a => new File(s"${sys.props("user.dir")}/target/$a/$sfName"))
    try {
      // testdata tables are single parquet FILES — copy file to file
      Files.copy(new File(Tables.path(sf001, "orders")).toPath,
        new File(tmpSf, "orders.parquet").toPath)
      val embSrc = new File(tmpSf, "embeddings.parquet")
      val v1 = new File(tmpSf, "emb_v1"); val v2 = new File(tmpSf, "emb_v2")
      val base = spark.read.parquet(Tables.path(sf001, "embeddings"))
      base.coalesce(1).write.parquet(v1.getAbsolutePath)
      def installEmb(from: File, tick: Long): Unit = {
        val tmp = new File(tmpSf, s"embswap_$tick"); tmp.mkdirs()
        Option(from.listFiles).getOrElse(Array.empty).foreach(c =>
          Files.copy(c.toPath, new File(tmp, c.getName).toPath))
        rm(embSrc)
        assert(tmp.renameTo(embSrc), "embeddings swap failed")
        Option(embSrc.listFiles).getOrElse(Array.empty)
          .foreach(f => f.setLastModified(1700000000000L + tick * 1000))
        embSrc.setLastModified(1700000000000L + tick * 1000); ()
      }
      installEmb(v1, 0)

      // the probe set the verdict names: sim4 (indexed IVF), sim5
      // (learned IVF), sim9 (PQ), and the bucketed-read substrate of q30
      val probes: Map[String, () => String] = Map(
        "sim4" -> (() => Similarity.ivfAnnIndexed(spark.newSession(), tmpSf.getAbsolutePath)
          .collect().map(_.toString).mkString("|")),
        "sim5" -> (() => Similarity.ivfAnnLearned(spark.newSession(), tmpSf.getAbsolutePath)
          .collect().map(_.toString).mkString("|")),
        "sim9" -> (() => Similarity.pqTopk(spark.newSession(), tmpSf.getAbsolutePath)
          .collect().map(_.toString).mkString("|")),
        "q30b" -> (() => BucketStore.ordersByOrderkey(spark.newSession(), tmpSf.getAbsolutePath)
          .groupBy(col("o_orderstatus")).count()
          .collect().sortBy(_.getString(0)).map(_.toString).mkString("|")))

      // the two legal result sets per probe, established serially. v2
      // drops the vector sim4's FIRST v1 hit returns, so the flip
      // provably changes probe output (dropping an arbitrary id changed
      // nothing on the first cut of this soak — it was in no top-5)
      val legalV1 = probes.map { case (k, f) => k -> f() }
      val droppedId = legalV1("sim4").split("\\|").head
        .stripPrefix("[").split(",")(1).toLong
      base.filter(col("vec_id") =!= droppedId).coalesce(1)
        .write.parquet(v2.getAbsolutePath)
      installEmb(v2, 1)
      val legalV2 = probes.map { case (k, f) => k -> f() }
      assert(legalV1("sim4") !== legalV2("sim4"),
        "source flip must change probe output or the soak proves nothing")

      val stop = new AtomicBoolean(false)
      val torn = new ConcurrentLinkedQueue[String]()
      val aborts = new ConcurrentLinkedQueue[String]()
      val sourceRace = new ConcurrentLinkedQueue[String]()
      val hardErrs = new ConcurrentLinkedQueue[Throwable]()
      val seen = new ConcurrentLinkedQueue[String]()
      def missingFileMsg(t: Throwable): Option[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).collectFirst {
          case c if c.isInstanceOf[java.io.FileNotFoundException] ||
            Option(c.getMessage).exists(m =>
              m.contains("FILE_NOT_EXIST") || m.contains("PATH_NOT_FOUND")) =>
            Option(c.getMessage).getOrElse("missing file")
        }
      val readers = probes.toSeq.map { case (name, f) =>
        new Thread(() => {
          while (!stop.get()) {
            try {
              val got = f()
              if (got == legalV1(name)) { seen.add(s"$name:v1"); () }
              else if (got == legalV2(name)) { seen.add(s"$name:v2"); () }
              else { torn.add(s"$name -> $got"); () }
            } catch {
              case t: Throwable =>
                // UNABLE_TO_INFER_SCHEMA is the same source race seen at
                // read SETUP: schema inference lists the raw source dir
                // in the instant the harness's rm+rename has it absent,
                // and the resulting AnalysisException carries neither a
                // FileNotFoundException cause nor the path (the WARN
                // beside it names tmpSf — caught live in the r18 suite
                // run). It can only be the fixture's source swap: the
                // artifact snapshots under test are written-then-
                // pointer-swapped and never empty or deleted while
                // current, so inference over them cannot fail this way.
                val inferRace = Iterator.iterate(t)(_.getCause)
                  .takeWhile(_ != null).exists(c => Option(c.getMessage)
                    .exists(_.contains("UNABLE_TO_INFER_SCHEMA")))
                if (inferRace) {
                  sourceRace.add(s"$name: infer-schema during source swap"); ()
                } else missingFileMsg(t) match {
                  // the raw SOURCE under tmpSf is swapped by this
                  // harness via rm+rename — a rebuild scanning the old
                  // source mid-swap is a fixture artifact (a real corpus
                  // restage is append-only or itself pointer-swapped),
                  // NOT the serving layer under test. Only a missing
                  // file inside a target/ snapshot indicts the contract.
                  case Some(m) if m.contains(tmpSf.getName) =>
                    sourceRace.add(s"$name: $m"); ()
                  case Some(m) => aborts.add(s"$name: $m"); ()
                  case None => hardErrs.add(t); ()
                }
            }
          }
        })
      }
      readers.foreach(_.start())
      try {
        (2 to 4).foreach { i =>
          installEmb(if (i % 2 == 0) v1 else v2, i.toLong)
          // drive one republish promptly (readers would too; this bounds
          // the soak's wall time) — any probe suffices, they share adm
          Similarity.ivfAnnIndexed(spark.newSession(), tmpSf.getAbsolutePath).collect()
          Thread.sleep(200)
        }
      } finally {
        stop.set(true)
        readers.foreach(_.join(180000))
      }
      assert(hardErrs.isEmpty,
        s"probe failed hard: ${Option(hardErrs.peek()).map(_.toString)}")
      assert(aborts.isEmpty,
        s"pointer-swap contract violated — probe ABORTED under republish: ${aborts.toArray.mkString("; ")}")
      assert(torn.isEmpty,
        s"TORN probe result(s): ${torn.toArray.take(2).mkString("; ")}")
      val outcomes = seen.toArray(Array.empty[String])
      assert(outcomes.length >= 8,
        s"soak too thin: ${outcomes.groupBy(identity).view.mapValues(_.length).toMap}")
      info(s"index soak outcomes: ${outcomes.groupBy(identity).view.mapValues(_.length).toMap}" +
        s" sourceRaces=${sourceRace.size}")
    } finally { rm(tmpSf); stageRoots.foreach(rm) }
  }
}
