package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Params
import graft.operators.Params.EventParams

/** F1/F2/F3 parameterized filters + the S7 cache contract. */
class ParamsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("S7: cachedEvents persists once per scale dir and returns the same plan") {
    val a = Params.cachedEvents(spark, sf001)
    val b = Params.cachedEvents(spark, sf001)
    assert(a eq b, "cache must hand back the same DataFrame, not a new scan")
    assert(a.storageLevel.useMemory, "base table must be persisted")
  }

  test("F1: date range is CLOSED — the midnight instant of the end date is inclusive (app.py:143-144)") {
    val p = EventParams("2024-01-01 00:00:00", "2024-01-10 00:00:00", 0, 23, Seq("view"))
    val df = Seq(
      (Timestamp.valueOf("2024-01-09 23:59:59"), "view", 1L),  // inside
      (Timestamp.valueOf("2024-01-10 00:00:00"), "view", 2L),  // the quirk: exactly midnight stays
      (Timestamp.valueOf("2024-01-10 00:00:01"), "view", 3L),  // one second later drops
      (Timestamp.valueOf("2023-12-31 23:59:59"), "view", 4L)   // before range drops
    ).toDF("ts", "event_type", "id")
    val kept = Params.paramFilter(df, p).select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("pf2: NON-default params match the generated SQL twin value-for-value") {
    // the same oracleSqlFor text the driver runs in DuckDB is valid Spark
    // SQL — run it here as the twin and require exact equality
    graft.sources.Tables.events(spark, sf001).createOrReplaceTempView("events")
    val p = EventParams("2024-01-03 00:00:00", "2024-01-25 00:00:00", 3, 21,
      Seq("click", "error"))
    val api = Params.typeSummary(graft.sources.Tables.events(spark, sf001), p)
      .collect().toSeq
    val sqlTwin = spark.sql(Params.oracleSqlFor(p)).collect().toSeq
    assert(api.nonEmpty, "param window selected no rows — weak test")
    assert(api === sqlTwin)
  }

  test("Pipeline --params flag parses timestamps, hours and the type list") {
    val p = Pipeline.parseParams("--params=2024-01-05T00:00:00,2024-01-20T06:30:00,6,18,view|click")
    assert(p === EventParams("2024-01-05 00:00:00", "2024-01-20 06:30:00", 6, 18,
      Seq("view", "click")))
    intercept[IllegalArgumentException](Pipeline.parseParams("--params=1,2,3"))
  }

  test("F2+F3: hour range and membership compose conjunctively") {
    val p = EventParams("2024-01-01 00:00:00", "2024-01-31 00:00:00", 9, 17, Seq("view", "click"))
    val df = Seq(
      (Timestamp.valueOf("2024-01-05 10:00:00"), "view", 1L),   // kept
      (Timestamp.valueOf("2024-01-05 08:59:59"), "view", 2L),   // hour 8 < 9
      (Timestamp.valueOf("2024-01-05 17:59:59"), "click", 3L),  // hour 17 inclusive
      (Timestamp.valueOf("2024-01-05 12:00:00"), "error", 4L)   // type not selected
    ).toDF("ts", "event_type", "id")
    val kept = Params.paramFilter(df, p).select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("sa2: stratified sample is seed-deterministic, respects strata, and tracks the target fractions") {
    val a = Params.sa2StratifiedSample(spark, sf001).collect().map(_.getLong(0)).toSeq
    val b = Params.sa2StratifiedSample(spark, sf001).collect().map(_.getLong(0)).toSeq
    assert(a === b, "same seed must give the same rows")
    val byLang = Params.sa2StratifiedSample(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.sources.Tables.documents(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the fraction map is an explicit allowlist (absent stratum ⇒ dropped):
    // pin the corpus lang set against it so a corpus change surfaces here
    // instead of as a silent drop (or a full-weight leak) in sa2 output
    assert(total.keySet === Params.sa2Fractions.keySet,
      s"corpus langs ${total.keySet} drifted from sa2Fractions ${Params.sa2Fractions.keySet}")
    Params.sa2Fractions.foreach { case (lang, f) =>
      val n = byLang.getOrElse(lang, 0L).toDouble
      val expected = total(lang) * f
      if (f == 1.0) assert(n === total(lang).toDouble, s"$lang: full stratum must survive")
      // Bernoulli tolerance: 4 sigma of binomial std dev (loose, deterministic seed)
      else assert(math.abs(n - expected) <= 4 * math.sqrt(total(lang) * f * (1 - f)) + 1,
        s"$lang: got $n of ${total(lang)}, wanted ~$expected")
    }
  }

  test("sa3: hash split is deterministic, complete, and tracks the cut points") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf001)
    val a = Params.sa3HashSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = Params.sa3HashSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a.toSeq === b.toSeq, "hash split must be run-to-run identical")
    assert(a.length === docs.count(), "every doc gets exactly one assignment")
    a.foreach { case (id, bucket, split) =>
      assert(bucket >= 0 && bucket < 100, s"doc $id bucket $bucket out of range")
      val want = if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
      assert(split === want, s"doc $id: bucket $bucket mapped to $split")
    }
    // the split must follow the KEY, not row order: a filtered subset
    // keeps identical assignments (the eval-contamination guarantee)
    val sub = Params.sa3HashSplit(docs.filter(col("doc_id") % 7 === 0)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = a.map(t => t._1 -> t._3).toMap
    sub.foreach { case (id, s) => assert(full(id) === s, s"doc $id drifted on subset") }
  }

  test("sa5: temperature mixture upsamples rare domains and is deterministic") {
    import spark.implicits._
    // crafted 10:1 skew so the rebalancing is visible (the sf0.001 corpus
    // is too small for sub-1.0 rates at the default target)
    val docs = ((1L to 200L).map(i => (i, "en")) ++ (201L to 220L).map(i => (i, "fr")))
      .toDF("doc_id", "lang")
    val kept = Params.sa5MixtureSample(docs, targetN = 60).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("lang")),
        r.getDouble(r.fieldIndex("p_inc"))))
    val again = Params.sa5MixtureSample(docs, targetN = 60).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("lang")),
        r.getDouble(r.fieldIndex("p_inc"))))
    assert(kept.toSeq === again.toSeq, "mixture sample must be run-to-run identical")
    // α=1/2: en target ∝ √200, fr target ∝ √20 — fr's PER-DOC rate must
    // exceed en's (rare domains upsampled), both strictly below 1
    val rateBy = kept.groupBy(_._2).map { case (l, rs) => l -> rs.head._3 }
    assert(rateBy("fr") > rateBy("en"),
      s"rare domain not upsampled: $rateBy")
    assert(rateBy("en") < 1.0 && rateBy("fr") < 1.0)
    // and the kept mix is flatter than the 10:1 input mix
    val keptEn = kept.count(_._2 == "en").toDouble
    val keptFr = kept.count(_._2 == "fr").toDouble
    assert(keptFr > 0 && keptEn / keptFr < 10.0,
      s"kept mix not flatter than input: en=$keptEn fr=$keptFr")
  }

  test("sa6: two-phase sharding equals the naive global cumsum, shards nondecreasing") {
    val rows = Params.sa6TokenShards(
      graft.sources.Tables.documents(spark, sf001), budgetTokens = 5000L)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("w")),
        r.getLong(r.fieldIndex("shard_id"))))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // replicate the naive exclusive cumsum driver-side
    var cum = 0L
    rows.foreach { case (id, w, shard) =>
      assert(shard === cum / 5000L, s"doc $id: shard $shard != ${cum / 5000L}")
      cum += w
    }
    // contiguity: shard ids never decrease in doc order
    assert(rows.map(_._3).sliding(2).forall(s => s.length < 2 || s(0) <= s(1)))
  }

  test("sa9: greedy packing never overfills a bin, never splits or reorders, and respects bucket isolation") {
    val ctx = 300L
    val rows = Params.sa9PackGreedy(
      graft.sources.Tables.documents(spark, sf001), ctxTokens = ctx,
      bucketSpan = 64L)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("n_tokens")),
        r.getLong(r.fieldIndex("bucket")), r.getLong(r.fieldIndex("bin_id")),
        r.getLong(r.fieldIndex("pos")), r.getLong(r.fieldIndex("bin_fill"))))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // every doc appears exactly once (no split, no drop)
    assert(rows.map(_._1).distinct.length === rows.length)
    // replay the greedy recurrence driver-side and demand identity
    rows.groupBy(_._3).foreach { case (bucket, ds) =>
      var bin = 0L; var fill = 0L; var pos = 0L
      ds.sortBy(_._1).foreach { case (id, n, b, binId, p, f) =>
        if (pos > 0L && fill + n > ctx) { bin += 1L; fill = 0L; pos = 0L }
        fill += n; pos += 1L
        assert(binId === bucket * 100000L + bin, s"doc $id bin")
        assert(p === pos && f === fill, s"doc $id pos/fill")
      }
    }
    // a multi-doc bin never exceeds ctx; only a singleton oversized doc may
    val byBin = rows.groupBy(_._4)
    byBin.foreach { case (binId, ds) =>
      val total = ds.map(_._2).sum
      assert(total <= ctx || ds.length == 1,
        s"bin $binId overfilled with ${ds.length} docs: $total > $ctx")
    }
    // bins never cross buckets
    assert(rows.forall { case (_, _, b, binId, _, _) => binId / 100000L == b })
    // bin_id packs bins under a 100000 multiplier — a span beyond it
    // would silently collide bin ids across buckets, so the boundary is
    // accepted and anything past it refused loudly
    val docs = graft.sources.Tables.documents(spark, sf001)
    assert(Params.sa9PackGreedy(docs, bucketSpan = 100000L).columns
      .contains("bin_id"))
    intercept[IllegalArgumentException] {
      Params.sa9PackGreedy(docs, bucketSpan = 100001L)
    }
    intercept[IllegalArgumentException] {
      Params.sa9PackGreedy(docs, bucketSpan = 0L)
    }
  }

  test("sa10: exact min(k, stratum) rows per language, deterministic, contained in the stratum's draw order") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val k = 15
    val a = Params.sa10StratumBottomK(docs, k = k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val b = Params.sa10StratumBottomK(docs, k = k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq, "per-stratum bottom-k must be run-to-run identical")
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = a.groupBy(_._2)
    assert(byLang.keySet === strata.keySet.filter(strata(_) > 0))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length.toLong === math.min(k.toLong, strata(lang)),
        s"stratum $lang: ${rs.length} rows, expected min($k, ${strata(lang)})")
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length.toLong))
    }
  }

  test("sa12: no near-dup family straddles the split; unclustered docs split on their own id; deterministic") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf001)
    val labels = Dedup.clusterLabels(spark, sf001)
    val rows = Params.sa12LeakageSafeSplit(docs, labels).collect()
    assert(rows.length === 500, "one verdict per document")
    val split = rows.map(r => r.getLong(0) -> r.getString(3)).toMap
    val group = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // THE invariant: every member of a dedup cluster carries its
    // representative's group and therefore its representative's split —
    // the leakage a per-doc hash split permits is structurally impossible
    val lab = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(lab.nonEmpty, "the staged corpus must have dup clusters")
    lab.foreach { case (doc, rep) =>
      assert(group(doc) === rep, s"doc $doc must group under its rep $rep")
      assert(split(doc) === split(rep),
        s"doc $doc and its rep $rep must land on the same side")
    }
    // unclustered docs are their own singleton group
    val clustered = lab.map(_._1).toSet
    group.foreach { case (doc, g) =>
      if (!clustered.contains(doc)) assert(g === doc)
    }
    // both sides are populated and the per-GROUP rate tracks the 20%
    // bucket cut (group-grain, not doc-grain — clusters move in blocks)
    val groups = rows.map(r => (r.getLong(1), r.getString(3))).distinct
    val hold = groups.count(_._2 == "holdout")
    assert(hold > 0 && hold < groups.length)
    // determinism: same inputs, same verdicts
    val again = Params.sa12LeakageSafeSplit(docs, labels).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again === split)
    // the leakage this prevents is REAL on the staged corpus: at least
    // one cluster's members would be separated by the naive per-doc
    // sa3-style bucket on the same salt
    def docBucket(id: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Params.GroupSplitSalt}:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.substring(0, 15), 16) % 100
    }
    val naiveSeparates = lab.exists { case (doc, rep) =>
      doc != rep &&
        (docBucket(doc) < Params.GroupSplitHoldoutPct) !=
        (docBucket(rep) < Params.GroupSplitHoldoutPct)
    }
    assert(naiveSeparates,
      "the corpus must contain a cluster the naive split would leak")
  }

  test("sa13: bucketed two-phase fill equals the naive per-source quality cumsum; admitted is a quality-prefix; budgets follow the sqrt share") {
    val rows = Params.sa13BudgetEpoch(
      graft.sources.Tables.documents(spark, sf001)).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("source")),
        r.getLong(r.fieldIndex("w")),
        if (r.isNullAt(r.fieldIndex("q"))) None
        else Some(r.getDouble(r.fieldIndex("q"))),
        r.getLong(r.fieldIndex("tokens_before")),
        r.getLong(r.fieldIndex("src_budget")),
        r.getBoolean(r.fieldIndex("admitted"))))
    assert(rows.length === 500, "one verdict per document")
    // replicate the NAIVE per-source (quality desc, doc_id) exclusive
    // cumsum driver-side — the two-phase bucket plan must reproduce it
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val ordered = rs.sortBy(t => (-t._4.getOrElse(0.0), t._1))
      var cum = 0L
      ordered.foreach { case (id, _, w, _, before, budget, admitted) =>
        assert(before === cum, s"$src doc $id: tokens_before $before != $cum")
        assert(admitted === (cum < budget), s"$src doc $id verdict")
        cum += w
      }
      // admitted set is a PREFIX of the quality order (whole-doc fill:
      // verdicts flip false exactly once, at the budget line)
      val flips = ordered.map(_._7).sliding(2)
        .count(s => s.length == 2 && s(0) != s(1))
      assert(flips <= 1, s"$src: admitted must be a quality-prefix")
      // the crossing doc itself is admitted (whole-document semantics)
      val lastIn = ordered.filter(_._7)
      if (lastIn.nonEmpty && lastIn.length < ordered.length)
        assert(lastIn.map(_._3).sum >= ordered.head._6,
          s"$src: the doc crossing the budget line must be admitted")
    }
    // per-source budgets follow the floored sqrt share of the GLOBAL budget
    val bySrc = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val sw = bySrc.values.toSeq.sorted
      .map(n => BigDecimal(math.sqrt(n.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val expect = math.floor(
        Params.Sa13Budget.toDouble * math.sqrt(bySrc(src).toDouble) / sw.toDouble).toLong
      assert(rs.head._6 === expect, s"$src budget")
    }
    // some source must genuinely hit its line (the gate bites), and some
    // docs on BOTH sides exist
    assert(rows.count(_._7) > 0 && rows.count(!_._7) > 0)
  }

  test("sa13: a quality-concentrated source (one r6 value carries ALL its mass) still fills exactly") {
    // template spam: every doc of source a is the SAME text, so the
    // whole source lands on ONE r6 quality value — the case that
    // collapses a coarse quality-bucket partition key into the naive
    // per-source sort. The span sub-key must keep the fill exact here.
    val spam = (0L until 200L).map(i => (i, "a", "the same template body " * 3))
    val mixed = (200L until 300L).map(i =>
      (i, "b", ("word " * (1 + (i % 37).toInt)).trim))
    val docs = (spam ++ mixed).toDF("doc_id", "source", "text")
    val rows = Params.sa13BudgetEpoch(docs, budget = 900L).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("source")),
        r.getLong(r.fieldIndex("w")),
        if (r.isNullAt(r.fieldIndex("q"))) 0.0
        else r.getDouble(r.fieldIndex("q")),
        r.getLong(r.fieldIndex("tokens_before")),
        r.getLong(r.fieldIndex("src_budget")),
        r.getBoolean(r.fieldIndex("admitted"))))
    assert(rows.length === 300)
    // the naive per-source (quality desc, doc_id) exclusive cumsum,
    // replayed driver-side, must match row-for-row
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val ordered = rs.sortBy(t => (-t._4, t._1))
      var cum = 0L
      ordered.foreach { case (id, _, w, _, before, budget, admitted) =>
        assert(before === cum, s"$src doc $id: tokens_before $before != $cum")
        assert(admitted === (cum < budget), s"$src doc $id verdict")
        cum += w
      }
    }
    // the concentrated source genuinely ties on quality (the hazard is real)
    val aQs = rows.filter(_._2 == "a").map(_._4).distinct
    assert(aQs.length === 1, s"source a must carry one quality value, got $aQs")
    // and its gate bites mid-source (budget line crossed inside the tie)
    val aAdmit = rows.filter(_._2 == "a").count(_._7)
    assert(aAdmit > 0 && aAdmit < 200, s"source a admit count $aAdmit")
  }

  test("sa14: annealed budgets move from natural toward sqrt shares; shortfall fires when a source can't fill its grant") {
    // a whale (900 docs), a mid source (90), and a starving one (10 docs
    // of 2 tokens each — its available mass is far under any fair share)
    val docs = ((0L until 900L).map(i => (i, "whale", "tok " * 10)) ++
      (900L until 990L).map(i => (i, "mid", "tok " * 10)) ++
      (990L until 1000L).map(i => (i, "tiny", "a b"))).toDF("doc_id", "source", "text")
    val rows = Params.sa14CurriculumBudgets(docs, budget = 9000L).collect()
      .map(r => ((r.getInt(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows.size === 9, "3 sources x 3 epochs")
    def budget(e: Int, s: String): Long = rows((e, s))._3
    // epoch 0 is natural: whale gets ~n-share; epoch 2 is sqrt-share —
    // strictly flatter; epoch 1 (n^3/4) sits strictly between
    assert(budget(0, "whale") > budget(1, "whale"),
      "annealing must shrink the whale's share epoch over epoch")
    assert(budget(1, "whale") > budget(2, "whale"))
    assert(budget(0, "tiny") < budget(1, "tiny"))
    assert(budget(1, "tiny") < budget(2, "tiny"),
      "annealing must grow the small source's share")
    // exact share arithmetic at the endpoints (sa5's spelling)
    val n = Map("whale" -> 900.0, "mid" -> 90.0, "tiny" -> 10.0)
    def share(alpha: Double => Double): Map[String, Long] = {
      val w = n.view.mapValues(alpha).toMap
      val sw = w.values.map(v =>
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      w.map { case (s, v) => s -> math.floor(9000.0 * v / sw.toDouble).toLong }
    }
    val nat = share(identity)
    val sq = share(math.sqrt)
    n.keys.foreach { s =>
      assert(budget(0, s) === nat(s), s"epoch-0 natural share for $s")
      assert(budget(2, s) === sq(s), s"epoch-2 sqrt share for $s")
    }
    // shortfall: tiny has 10 docs x 2 tokens = 20 available; every epoch
    // grants more than that, so granted caps at 20 and shortfall > 0
    (0 to 2).foreach { e =>
      val (_, avail, b, granted, shortfall) = rows((e, "tiny"))
      assert(avail === 20L)
      assert(granted === math.min(b, avail) && shortfall === b - granted)
      assert(shortfall > 0, s"epoch $e: the starving source must report a shortfall")
    }
    // the whale always fills from its own mass: no shortfall
    (0 to 2).foreach(e => assert(rows((e, "whale"))._5 === 0L))
  }

  test("sa4: weighted sample is deterministic, near-target-sized, and weight-monotone") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val a = Params.sa4WeightedSample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = Params.sa4WeightedSample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq, "weighted sample must be run-to-run identical")
    // expected size = Σ min(1, targetN·w/ΣW) = targetN when nothing clips;
    // the hash draw concentrates tightly around it (±40% is generous)
    val n = a.length
    assert(n > 150 * 0.6 && n < 150 * 1.4, s"sample size $n far from target 150")
    // inclusion probability is monotone in the weight
    val byW = a.map(t => t._2 -> t._3)
    byW.sortBy(_._1).sliding(2).foreach {
      case Array((w1, p1), (w2, p2)) =>
        assert(p1 <= p2 + 1e-9, s"p_inc not monotone: w=$w1 p=$p1 vs w=$w2 p=$p2")
      case _ =>
    }
    // a doc's draw is a property of its key: the kept set of a subset is
    // the subset of the kept set ONLY when the weight total is held fixed —
    // here we just pin determinism of u via a changed target (p scales,
    // u does not): every doc kept at target 150 with p_inc scaled by 2
    // is kept at target 300
    val big = Params.sa4WeightedSample(docs, targetN = 300).collect()
      .map(r => r.getLong(0)).toSet
    a.foreach { case (id, _, _) =>
      assert(big.contains(id), s"doc $id kept at target 150 but dropped at 300") }
  }

  test("shard export: one JSONL file per shard, every doc exactly once, packing order kept") {
    val out = new java.io.File(sys.props("java.io.tmpdir"), "graft_shard_export")
    graft.sources.Staging.deleteRecursively(out)
    Params.exportShards(spark, sf001, out.getAbsolutePath, budgetTokens = 5000L)
    val dirs = Option(out.listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("shard_id="))
    assert(dirs.nonEmpty, "no shard partitions written")
    dirs.foreach { d =>
      val files = d.listFiles.filter(_.getName.endsWith(".json"))
      assert(files.length === 1, s"${d.getName}: expected one file, got ${files.length}")
      // packing order inside the file: doc ids nondecreasing line-to-line
      val ids = scala.util.Using(scala.io.Source.fromFile(files.head)) { src =>
        src.getLines()
          .map(l => "\"doc_id\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong)
          .toSeq
      }.get
      assert(ids === ids.sorted, s"${d.getName}: docs out of packing order")
    }
    // completeness: every doc exactly once across all shards
    val back = spark.read.json(out.getAbsolutePath)
    val n = graft.sources.Tables.documents(spark, sf001).count()
    assert(back.count() === n)
    assert(back.select("doc_id").distinct().count() === n)
  }

  test("sa11: each epoch is a full permutation, epochs differ, and the bucketed rank matches the naive global rank") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val n = docs.count()
    val rows = Params.sa11EpochOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === n * Params.EpochCount)
    // bijection: within each epoch the ranks are exactly 1..n
    (0L until Params.EpochCount.toLong).foreach { e =>
      val ranks = rows.filter(_._1 == e).map(_._3).sorted
      assert(ranks.toSeq === (1L to n).toSeq, s"epoch $e is not a permutation")
    }
    // independence: the two epochs must not present the same order
    val byEpoch = rows.groupBy(_._1).map { case (e, rs) =>
      e -> rs.sortBy(_._3).map(_._2).toSeq
    }
    assert(byEpoch(0L) !== byEpoch(1L), "epochs drew identical permutations")
    // the two-phase bucketed rank must equal the naive single-window rank
    // (tiny corpus: the naive plan is affordable here, never in prod)
    val naive = {
      import org.apache.spark.sql.expressions.Window
      val drawn = docs.select(col("doc_id"),
          explode(sequence(lit(0L), lit(Params.EpochCount - 1L))).as("epoch"))
        .withColumn("u", graft.functions.saltedUniform(Params.EpochSalt,
          concat(col("epoch").cast("string"), lit(":"),
            col("doc_id").cast("string"))))
      drawn.withColumn("shuffle_rank",
          row_number().over(Window.partitionBy(col("epoch"))
            .orderBy(col("u"), col("doc_id"))).cast("long"))
        .select(col("epoch"), col("doc_id"), col("shuffle_rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(rows.toSet === naive, "two-phase rank drifted from the naive rank")
    // determinism across runs
    assert(Params.sa11EpochOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq === rows.toSeq)
  }

  test("sa7: bottom-k sample is exact-n, deterministic, and matches the md5 formula") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val k = 20
    val a = Params.sa7BottomKSample(docs, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val b = Params.sa7BottomKSample(docs, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq === b.toSeq, "bottom-k sample must be run-to-run identical")
    assert(a.length === k, s"exact-n violated: got ${a.length}")
    assert(a.map(_._2).sliding(2).forall(s => s.length < 2 || s(0) <= s(1)),
      "output not ordered by draw")
    // independent replication of the draw: pure-JVM md5 over every key,
    // k smallest must be exactly Spark's k rows (values bit-identical)
    val md = java.security.MessageDigest.getInstance("MD5")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val expected = ids.map { id =>
      val hex = md.digest(s"graft-bottomk-v1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      md.reset()
      id -> java.lang.Long.parseLong(hex.take(13), 16).toDouble / 4503599627370496.0
    }.sortBy(t => (t._2, t._1)).take(k)
    assert(a.toSeq === expected.toSeq, "Spark bottom-k drifted from the md5 formula")
  }

  test("pl2: manifest covers exactly the gauntlet-admitted set, budgets recompute at the admitted grain, and the composition equals a manual filter+fill") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val admitted = Dedup.corpusGauntlet(spark, sf001)
      .filter(col("admitted")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.nonEmpty && admitted.size < 500,
      "the gauntlet must actually reject someone for the composition to be tested")
    val pl2 = Params.pl2EpochManifest(spark, sf001).collect()
    assert(pl2.map(_.getLong(0)).toSet === admitted, "one manifest row per admitted doc")
    // composition equality: identical to sa13 over a manually filtered corpus
    val manual = Params.sa13BudgetEpoch(
      Tables.documents(spark, sf001)
        .filter(col("doc_id").isin(admitted.toSeq: _*))).collect()
    assert(pl2.map(_.toString).sorted.toSeq === manual.map(_.toString).sorted.toSeq)
    // budgets are the ADMITTED corpus's sqrt shares, not the raw corpus's:
    // admission changes per-source counts unevenly, so at least one
    // source's budget must differ from the whole-corpus sa13 run
    val whole = Params.sa13BudgetEpoch(Tables.documents(spark, sf001)).collect()
      .map(r => r.getString(1) -> r.getLong(5)).toMap
    val pl2Budgets = pl2.map(r => r.getString(1) -> r.getLong(5)).toMap
    assert(pl2Budgets.exists { case (src, b) => whole.get(src).exists(_ != b) },
      "budgets must be recomputed at the admitted grain")
  }
}
