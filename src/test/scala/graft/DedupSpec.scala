package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.Tables

/** The recall/exactness claims the approximate dedup operators make
  * (rows-only in the driver harness, so THIS is their correctness gate).
  */
class DedupSpec extends AnyFunSuite with SparkFixture {

  private def pairSet(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dd12: a copied 16-token span flags BOTH docs; unique and short docs stay clean") {
    import spark.implicits._
    val span = (1 to 16).map("w" + _).mkString(" ")
    val docs = Seq(
      (1L, span + " unique tail alpha beta gamma delta"),
      (2L, "other opening words here then " + span),
      (3L, (1 to 30).map("solo" + _).mkString(" ")), // unique 30 tokens
      (4L, "too short for any span")                 // < 16 tokens
    ).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.substringDups(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(rows(1L).fieldIndex("n_dup_spans")) >= 1L)
    assert(rows(2L).getLong(rows(2L).fieldIndex("n_dup_spans")) >= 1L)
    assert(rows(3L).getLong(rows(3L).fieldIndex("n_dup_spans")) === 0L)
    assert(rows(4L).getLong(rows(4L).fieldIndex("n_spans")) === 0L)
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("dup_frac")))
    // the copied span is exactly one position in each doc
    assert(rows(1L).getLong(rows(1L).fieldIndex("n_dup_spans")) === 1L)
    assert(rows(2L).getLong(rows(2L).fieldIndex("n_dup_spans")) === 1L)
  }

  test("dd17: the copied span's tokens are scrubbed from BOTH docs; everything else survives") {
    import spark.implicits._
    val span = (1 to 16).map("w" + _).mkString(" ")
    val docs = Seq(
      (1L, span + " unique tail alpha beta gamma delta"),
      (2L, "other opening words here then " + span),
      (3L, (1 to 30).map("solo" + _).mkString(" ")), // unique 30 tokens
      (4L, "too short for any span")                 // < 16 tokens
    ).toDF("doc_id", "text")
    val rows = Dedup.scrubDupSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1: the leading 16-token span is removed, the tail survives
    assert(rows(1L) === ((22L, 6L, "unique tail alpha beta gamma delta")))
    // doc 2: the trailing span is removed, the opening survives
    assert(rows(2L) === ((21L, 5L, "other opening words here then")))
    // unique and short docs are untouched
    assert(rows(3L)._1 === 30L && rows(3L)._2 === 30L)
    assert(rows(4L)._3 === "too short for any span")
  }

  test("shingles: shorter than n tokens -> empty; 4 tokens -> 2 trigrams; de-duped") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b c d"), (3L, "x y x y x y x y")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got(1L) === Set.empty)
    assert(got(2L) === Set("a b c", "b c d"))
    assert(got(3L) === Set("x y x", "y x y")) // 6 raw trigrams, 2 distinct
  }

  test("pl1: gauntlet verdicts equal each stage's own output; admitted is the conjunction") {
    import graft.sources.Tables
    val rows = Dedup.corpusGauntlet(spark, sf001).collect()
    val n = Tables.documents(spark, sf001).count()
    assert(rows.length === n, "one verdict row per corpus doc")
    // stage flags replayed from the operators themselves
    val urlKeep = Dedup.urlDedup(Tables.documents(spark, sf001))
      .select("keep_doc").collect().map(_.getLong(0)).toSet
    val qKeep = graft.operators.TextAnalysis
      .qualityFilter(Tables.documents(spark, sf001))
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val dKeep = Dedup.dedupCorpus(Tables.documents(spark, sf001),
        Dedup.clusterLabels(spark, sf001))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = Dedup.decontaminate(Tables.documentsRebalanced(spark, sf001))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1) === urlKeep.contains(id), s"url_keep($id)")
      assert(r.getBoolean(2) === qKeep.contains(id), s"quality_keep($id)")
      assert(r.getBoolean(3) === dKeep.contains(id), s"dedup_keep($id)")
      assert(r.getBoolean(4) === !flagged.contains(id), s"decont_ok($id)")
      assert(r.getBoolean(5) ===
        (r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)))
    }
    // the corpus exercises both outcomes
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("dd9: survivors = corpus minus non-representative cluster members; every representative survives") {
    val docs = Tables.documents(spark, sf001)
    val clusters = Dedup.dupClusters(Dedup.ngramJaccardPairs(docs))
    val dropped = clusters.filter(col("doc_id") =!= col("rep_id"))
    val out = Dedup.dedupCorpus(docs, clusters)
    assert(dropped.count() > 0, "test corpus must contain dup clusters")
    assert(out.count() === docs.count() - dropped.count())
    val survivors = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val reps = clusters.select("rep_id").collect().map(_.getLong(0)).toSet
    assert(reps.subsetOf(survivors), "a cluster representative was dropped")
    assert(dropped.select("doc_id").collect().map(_.getLong(0)).forall(!survivors.contains(_)))
  }

  test("dd22: weights partition cluster mass — each cluster sums to ~1, singletons to exactly 1, and dd9's drop set = the downweighted non-reps") {
    val docs = Tables.documents(spark, sf001)
    val clusters = Dedup.dupClusters(Dedup.ngramJaccardPairs(docs))
    val out = Dedup.softDedupWeights(docs, clusters).collect()
    // soft dedup keeps EVERY document
    assert(out.length === docs.count())
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (rep, members) =>
      val size = members.head.getLong(2)
      assert(members.length === size, s"cluster $rep size column disagrees with membership")
      members.foreach(m => assert(m.getLong(2) === size))
      // each member carries r6(1/size); the cluster's mass re-sums to 1
      // within the per-member rounding grain
      val mass = members.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) <= 1e-6 * size, s"cluster $rep mass $mass")
    }
    out.filter(_.getLong(2) == 1L).foreach(r => assert(r.getDouble(3) === 1.0))
    // consistency with the hard path: dd9 drops exactly the docs dd22
    // downweights as non-representatives
    val dd9Survivors = Dedup.dedupCorpus(docs, clusters)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nonReps = out.filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    assert(nonReps.nonEmpty, "test corpus must contain dup clusters")
    assert(nonReps === out.map(_.getLong(0)).toSet -- dd9Survivors)
  }

  test("dd4 minhash candidates: recall >= 0.95 against dd3's exact Jaccard pairs") {
    val docs = Tables.documents(spark, sf001)
    val exact = pairSet(
      Dedup.ngramJaccardPairs(docs).select("doc_a", "doc_b").collect())
    val cand = pairSet(
      Dedup.minhashCandidates(docs).select("doc_a", "doc_b").collect())
    assert(exact.nonEmpty, "test corpus must contain near-duplicate pairs")
    val recall = (exact & cand).size.toDouble / exact.size
    assert(recall >= 0.95, s"minhash recall $recall over ${exact.size} exact pairs")
  }

  test("dd4 cap headroom: max band bucket sits below maxBucket=1024 at every oracle-gated scale") {
    // Above the cap the hub-and-spoke emission intentionally drops
    // non-hub pairs while the DuckDB oracle computes the FULL
    // combination set — the hash gate would fail loudly. This gate
    // proves each oracle-gated corpus sits under the cap with 2x
    // headroom, so a corpus drifting toward divergence trips a
    // readable spec failure first.
    for (dir <- Seq(sf001, "/root/testdata/sf0.01")) {
      val m = Dedup.maxBandBucket(Tables.documentsRebalanced(spark, dir))
      assert(m <= 1024 / 2,
        s"$dir: max band bucket $m is within 2x of the 1024 cap — " +
          "dd4/dd15's oracles (full combinations) diverge above it")
      info(s"$dir: max dd4 band bucket = $m (cap 1024)")
    }
  }

  test("dd15 verified pairs == dd3's exact pairs restricted to dd4's candidates") {
    val docs = Tables.documents(spark, sf001)
    val exact = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cands = pairSet(
      Dedup.minhashCandidates(docs).select("doc_a", "doc_b").collect())
    val verified = Dedup.minhashVerifiedPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(verified.nonEmpty)
    val expected = exact.filter { case (p, _) => cands.contains(p) }
    assert(verified === expected,
      s"dd15 must equal dd3 ∩ candidates: missing=${(expected.keySet -- verified.keySet).size} " +
        s"extra=${(verified.keySet -- expected.keySet).size}")
  }

  test("dd5 simhash candidates: EXACTLY the pairs with Hamming distance <= 3 (brute force)") {
    val docs = Tables.documents(spark, sf001)
    val sigs = docs.select(col("doc_id"), Dedup.simhashExpr("text").as("sig"))
    val brute = pairSet(
      sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= 3)
        .select(col("a.doc_id"), col("b.doc_id")).collect())
    val cand = pairSet(
      Dedup.simhashCandidates(docs).select("doc_a", "doc_b").collect())
    assert(brute.nonEmpty, "test corpus must contain simhash near-dups")
    assert(cand === brute,
      s"missed=${(brute -- cand).size} extra=${(cand -- brute).size} of ${brute.size}")
  }

  test("dd5b capped: star-bounded on a megacluster where dd5's contract is quadratic") {
    import spark.implicits._
    // 100 identical docs: one sig, so every one of the 10 band buckets
    // holds all 100 — far past Dd5MaxBucket=64 — plus a distinct doc
    // whose buckets stay singletons (never emitted)
    val mega = ((0L until 100L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta")) :+
      (200L, "totally different unrelated content with other words entirely"))
      .toDF("doc_id", "text")
    val capped = Dedup.simhashCandidatesCapped(mega).collect()
    // hub-and-spoke over the minimum doc_id: 99 pairs, all anchored at 0,
    // all Hamming 0 — linear where the exact contract emits C(100,2)
    assert(capped.length === 99, s"expected the 99-spoke star, got ${capped.length}")
    assert(capped.forall(r => r.getLong(0) == 0L && r.getLong(2) == 0L))
    assert(Dedup.simhashCandidates(mega).count() === 100L * 99 / 2)
  }

  test("pair-budget breaker: uncapped contracts abort soft past the budget, context alive") {
    import spark.implicits._
    // A megacluster whose UNCAPPED emission (10 bands × C(100,2) = 49,500
    // band-pair combinations for dd5; 8 bands × C(100,2) candidates for
    // dd15) exceeds a deliberately tiny budget: the breaker must throw
    // the documented error naming the capped variant BEFORE any pair
    // materializes — the fail-soft alternative to the r17 sf10 run where
    // uncapped dd5 killed the SparkContext (bench/r17_capped_100x.json).
    val mega = (0L until 100L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val e5 = intercept[Dedup.PairBudgetExceeded] {
      Dedup.simhashCandidates(mega, pairBudget = 1000L)
    }
    assert(e5.getMessage.contains("dd5b_simhash_capped"))
    assert(e5.getMessage.contains("49500"))
    val e15 = intercept[Dedup.PairBudgetExceeded] {
      Dedup.minhashVerifiedPairs(mega, pairBudget = 1000L)
    }
    assert(e15.getMessage.contains("dd15b_minhash_capped"))
    // fail-SOFT: the context survived and runs the next query
    assert(spark.range(10).count() === 10L)
    // below the budget both uncapped contracts still produce the exact
    // pair set (the guard is a pre-count, never a semantics change)
    assert(Dedup.simhashCandidates(mega).count() === 100L * 99 / 2)
    // the capped primary never pays the pre-count and never throws:
    // same corpus, tiny budget irrelevant (dd5b takes no budget param)
    assert(Dedup.simhashCandidatesCapped(mega).count() === 99)
  }

  test("dd5b/dd15b cap-bite sides documented per oracle-gated scale") {
    // The capped oracles replicate the hub-and-spoke semantics, so BOTH
    // sides of the cap are hash-gated — this records which side each
    // corpus exercises (and catches a silent drift of the corpus shape).
    for (dir <- Seq(sf001, "/root/testdata/sf0.01")) {
      val sh = Dedup.maxSimhashBucket(Tables.documents(spark, dir))
      val mh = Dedup.maxBandBucket(Tables.documentsRebalanced(spark, dir))
      info(s"$dir: max simhash bucket = $sh (dd5b cap ${Dedup.Dd5MaxBucket}), " +
        s"max minhash bucket = $mh (dd15b cap ${Dedup.Dd15MaxBucket})")
      assert(sh >= 0 && mh >= 0)
    }
  }

  test("dd15b capped: candidate generation is linear on a megacluster, verify unaffected below the cap") {
    import spark.implicits._
    val mega = (0L until 100L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    // the tight cap stars the megacluster's candidates; dd15's 1024
    // default does not bite at this size
    assert(Dedup.minhashCandidates(mega,
      maxBucket = Dedup.Dd15MaxBucket).count() === 99)
    assert(Dedup.minhashCandidates(mega).count() === 100L * 99 / 2)
  }

  test("simhash60 native expression is bit-identical to the column-level md5 formulation") {
    // the slow twin spells out the ORACLE's arithmetic with Spark
    // built-ins: 60-bit md5 prefix per token (conv of the first 15 hex
    // chars — the same value DuckDB's ('0x' || ...)::BIGINT yields),
    // per-bit majority vote
    val docs = Tables.documents(spark, sf001).limit(100)
    val hof = expr(
      """aggregate(sequence(0, 59), 0L, (acc, b) -> acc | IF(
        |  aggregate(tk, 0L,
        |    (a2, t) -> a2 + IF((shiftright(
        |      cast(conv(substring(md5(t), 1, 15), 16, 10) AS LONG), b) & 1) = 1,
        |      1L, -1L)) > 0,
        |  shiftleft(1L, b), 0L))""".stripMargin)
    val mismatches = docs
      .select(col("text"), graft.functions.tokens(col("text")).as("tk"))
      .select(Dedup.simhashExpr("text").as("fast"), hof.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatches === 0L)
  }

  test("word_shingles native expression is identical to the HOF formulation, order included") {
    val docs = Tables.documents(spark, sf001).limit(200)
    val toks = graft.functions.tokens(col("text"))
    val hof = array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
        .otherwise(array().cast("array<string>")))
    val mismatches = docs
      .select(Dedup.shingles(col("text"), 3).as("fast"), hof.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatches === 0L)
  }

  test("minhash_sig native expression is bit-identical to the column-level md5 formulation") {
    val P = 2147483647L
    val k = 32
    // derive (a_i, b_i) through SPARK's md5/conv built-ins (the oracle's
    // route), not through graft.functions.md5Bits — this cross-checks the
    // JVM digest-prefix arithmetic against the SQL derivation
    def draw(salt: String, mod: Long): Column =
      pmod(conv(substring(md5(concat(lit(salt), col("id").cast("string"))), 1, 13), 16, 10)
        .cast("long"), lit(mod))
    val perms = spark.range(k)
      .select((draw("mh-a:", P - 1) + 1L).as("a"), draw("mh-b:", P).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val as = typedlit(perms.map(_._1).toSeq)
    val bs = typedlit(perms.map(_._2).toSeq)
    val docs = Tables.documents(spark, sf001).limit(200)
    val hof = {
      val sig = transform(
        sequence(lit(0), lit(k - 1)),
        i => array_min(transform(col("hs"), h =>
          pmod(element_at(as, i + 1) * h + element_at(bs, i + 1), lit(P)))))
      when(size(col("hs")) > 0, sig).otherwise(array().cast("array<long>"))
    }
    val slow = docs
      .select(col("doc_id"),
        transform(Dedup.shingles(col("text"), 3), s =>
          pmod(conv(substring(md5(s), 1, 13), 16, 10).cast("long"), lit(P))).as("hs"))
      .select(col("doc_id"), hof.as("slow"))
    val fast = Dedup.minhashSignatures(docs).withColumnRenamed("sig", "fast")
    val mismatches = fast.join(slow, "doc_id")
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatches === 0L)
  }

  test("dd8 cluster representatives: min-label propagation crosses multi-hop chains") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4, forces >1 round) + island 8-9
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      8L -> 8L, 9L -> 8L))
  }

  test("dd8 reliable-checkpoint knob: identical labels, round state written to the dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dd8ck").toFile
    try {
      // deep enough to cross the escalation boundary, so BOTH truncation
      // paths (edges + escalated rounds) run through reliable checkpoint
      val chain = (1L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val got = Dedup.dupClusters(chain, maxIter = 14,
          checkpointDir = Some(dir.getAbsolutePath)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === 20)
      assert(got.values.forall(_ == 1L), s"chain not fully collapsed: $got")
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles).getOrElse(Array.empty).toSeq
        kids ++ kids.flatMap(files)
      }
      assert(files(dir).exists(_.isFile),
        "reliable checkpoint produced no files — the knob is not wired")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("dd8 pointer doubling: a chain deeper than maxIter one-hop rounds still converges") {
    import spark.implicits._
    // a 65-node chain has diameter 64: one-hop propagation alone needs 64
    // rounds and would throw at maxIter=14; the label-of-label escalation
    // (after round 6) halves the remaining depth per round instead
    val chain = (1L until 65L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(chain, maxIter = 14).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 65)
    assert(got.values.forall(_ == 1L), s"chain not fully collapsed: $got")
  }

  test("dd11 incremental dedup: new batch adopts old reps, old structure frozen") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon"
    val b = "zeta eta theta iota kappa"
    val c = "lambda mu nu xi omicron"
    val docs = Seq(
      1L -> a, 2L -> a,      // old cluster {1,2}, rep 1
      3L -> b,               // old singleton (no pair => not in label table)
      10L -> a,              // joins the {1,2} cluster via its rep
      11L -> b,              // pairs with unlabeled old doc 3 => rep 3
      12L -> c, 13L -> c,    // new-new pair => rep 12
      14L -> "pi rho sigma tau upsilon" // unmatched => itself
    ).toDF("doc_id", "text")
    val oldLabels = Seq(1L -> 1L, 2L -> 1L).toDF("doc_id", "rep_id")
    val got = Dedup.incrementalDedupLabels(docs, oldLabels, newFrom = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 1L, 11L -> 3L, 12L -> 12L, 13L -> 12L, 14L -> 14L))
    // all-unique batch: empty candidate set must not break the mini-CC
    val quiet = Seq(1L -> a, 10L -> "solo words only here now").toDF("doc_id", "text")
    val got2 = Dedup.incrementalDedupLabels(quiet, oldLabels.limit(0), newFrom = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(10L -> 10L))
  }

  test("dd3 document-frequency cap drops hot shingles from both sets symmetrically") {
    import spark.implicits._
    // "common phrase here" appears in all 4 docs -> df=4 > maxDf=3 -> capped
    // out everywhere; docs 1/2 remain identical on their distinctive tail.
    val docs = Seq(
      (1L, "common phrase here alpha beta gamma delta"),
      (2L, "common phrase here alpha beta gamma delta"),
      (3L, "common phrase here zeta eta theta iota"),
      (4L, "common phrase here kappa lambda mu nu")).toDF("doc_id", "text")
    val rows = Dedup.ngramJaccardPairs(docs, maxDf = 3).collect()
    assert(pairSet(rows) === Set((1L, 2L)))
    assert(rows.head.getDouble(2) === 1.0) // identical after the cap
  }

  test("dd13 bloom screen: no false negatives vs the exact overlap, FP rate bounded") {
    val docs = Tables.documents(spark, sf001)
    val got = Dedup.bloomDecontaminate(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // exact truth: per training doc, its distinct shingles present in the
    // eval shingle set
    val ex = Dedup.explodedShingles(docs, 3)
    val evalS = ex.filter(col("doc_id") < 20).select("s").distinct()
    val exact = ex.filter(col("doc_id") >= 20).join(evalS, Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bloom guarantee: a genuinely shared shingle is ALWAYS flagged
    exact.foreach { case (d, n) =>
      assert(got(d)._2 >= n, s"doc $d: bloom missed true overlaps ($n vs ${got(d)._2})")
    }
    // and the false-positive mass is tiny at this fill factor
    val totalFlagged = got.values.map(_._2).sum
    val totalExact = exact.values.sum
    val totalShingles = got.values.map(_._1).sum
    assert(totalFlagged >= totalExact)
    val fpRate = (totalFlagged - totalExact).toDouble / totalShingles
    assert(fpRate <= 0.02, s"bloom FP rate $fpRate")
  }

  test("dd4 skew cap: 10k identical docs emit a linear star, not 50M pairs") {
    import spark.implicits._
    // An adversarial megacluster: every doc byte-identical, so every band
    // maps all of them into ONE bucket. Uncapped combination emission
    // would build 10^4·(10^4−1)/2 ≈ 5×10^7 pairs per band map-side — the
    // OOM the cap exists to prevent. With the cap, each hot bucket emits
    // a hub-and-spoke star over the minimum doc_id: n−1 pairs, every
    // member still connected to the cluster.
    val n = 10000
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta eta theta").as("text"))
    val pairs = Dedup.minhashCandidates(docs).collect()
    assert(pairs.length === n - 1, s"expected star of ${n - 1} pairs, got ${pairs.length}")
    // hub is the minimum id; all 8 bands agree on the one bucket
    assert(pairs.forall(r => r.getLong(0) === 0L))
    assert(pairs.forall(r => r.getLong(2) === 8L))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
      === (1L until n.toLong).map(b => (0L, b)).toSet)
  }

  test("dd19 containment: a short doc embedded in a long one flags from the short side only") {
    import spark.implicits._
    // doc 1 = 12 unique tokens; doc 2 = those 12 plus 28 more. Every
    // trigram of doc 1 appears in doc 2 ⇒ C(1→2) = 1.0, while C(2→1)
    // (10 of 38 trigrams) and Jaccard (10/38) both sit far below the
    // 0.8 gate — the asymmetric case dd3 structurally cannot flag.
    val core = (1 to 12).map("c" + _).mkString(" ")
    val tail = (1 to 28).map("t" + _).mkString(" ")
    val docs = Seq(
      (1L, core),
      (2L, core + " " + tail),
      (3L, (1 to 20).map("solo" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(rows.head.getDouble(2) === 1.0)
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(jac((1L, 2L)) < 0.8, "the embedded pair must be invisible to a 0.8 Jaccard gate")
  }

  test("dd18 snapshot diff: added/removed/changed classified, unchanged excluded") {
    import spark.implicits._
    val old = Seq(
      (1L, "same text"), (2L, "old revision"), (3L, "to be retired")
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "same text"), (2L, "new revision"), (4L, "fresh arrival")
    ).toDF("doc_id", "text")
    val rows = Dedup.snapshotDiff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // the delta ships digests, not text: both hash columns are md5-shaped
    val r2 = Dedup.snapshotDiff(old, neu).filter(col("doc_id") === 2L).head
    assert(r2.getString(2).matches("[0-9a-f]{32}"))
    assert(r2.getString(3).matches("[0-9a-f]{32}"))
    assert(r2.getString(2) !== r2.getString(3))
  }

  test("dd20: canonicalizer folds every crawl-duplication mode; path case survives; non-http passes through; 9-runs collapse") {
    import spark.implicits._
    val cases = Seq(
      "https://a.example.com/doc/3" -> "https://a.example.com/doc/3",
      "http://a.example.com/doc/3" -> "https://a.example.com/doc/3",
      "https://www.a.example.com/doc/3" -> "https://a.example.com/doc/3",
      "https://A.EXAMPLE.COM/doc/3" -> "https://a.example.com/doc/3",
      "https://a.example.com/doc/3/" -> "https://a.example.com/doc/3",
      "https://a.example.com/doc/3?utm_source=feed&ref=rss" -> "https://a.example.com/doc/3",
      "https://a.example.com/doc/3#section-2" -> "https://a.example.com/doc/3",
      // path case is SIGNIFICANT (RFC 3986) — must NOT fold
      "https://a.example.com/DOC/3" -> "https://a.example.com/DOC/3",
      // query + fragment together; www + scheme together
      "http://www.B.com/x?q=1#f" -> "https://b.com/x",
      // scheme is case-insensitive (RFC 3986 §3.1) — folds like lowercase
      "HTTP://a.example.com/doc/3" -> "https://a.example.com/doc/3",
      "HTTPS://WWW.a.example.com/doc/3" -> "https://a.example.com/doc/3",
      // NON-http(s) URLs pass through VERBATIM — each stays itself,
      // never the shared 'https:' blob the pre-guard code produced
      "ftp://a.example.com/doc/3" -> "ftp://a.example.com/doc/3",
      "mailto:ops@a.example.com" -> "mailto:ops@a.example.com",
      "//a.example.com/doc/3" -> "//a.example.com/doc/3")
    val got = cases.map(_._1).toDF("url")
      .select(Dedup.canonicalizeUrl(col("url"))).as[String].collect()
    assert(got.toSeq === cases.map(_._2))
    // distinct non-http URLs must stay distinct (the silent-merge bug)
    assert((got(11) !== got(12)) && (got(12) !== got(13)))
    // corpus run: the frontier MUST genuinely collapse — each
    // 9-consecutive-id page folds to one canonical page (8 http(s)
    // variants) plus its lone ftp:// link as its own group
    val docCount = Tables.documents(spark, sf001).count()
    val rows = Dedup.urlDedup(Tables.documents(spark, sf001)).collect()
    val nPages = (docCount + 8) / 9
    val (ftp, web) = rows.partition(_.getString(0).startsWith("ftp://"))
    assert(web.length.toLong === nPages,
      s"expected one canonical per page, got ${web.length} of $docCount docs")
    web.foreach { r =>
      val (keep, n) = (r.getLong(1), r.getLong(2))
      assert(keep % 9 === 0L, s"keep_doc $keep must be the run head")
      assert(n === 8L || keep / 9L === (docCount - 1) / 9L,
        s"interior page under-collapsed: keep=$keep n=$n")
    }
    // every run's lone ftp link is its own singleton group
    assert(ftp.length.toLong === docCount / 9)
    ftp.foreach { r =>
      assert(r.getLong(2) === 1L, s"ftp URL merged: ${r.getString(0)}")
      assert(r.getLong(1) % 9 === 8L)
    }
    assert(rows.map(_.getLong(2)).sum === docCount)
  }

  test("dd21: fuzzy linkage recovers the source entity for every typo class; out-of-budget rows fail loud with NULL") {
    import spark.implicits._
    val clean = Seq("ALGERIA", "ARGENTINA", "BRAZIL", "CANADA")
      .toDF("clean_name")
    val dirty = Seq(
      (1L, "BRAZIL"),      // verbatim -> dist 0
      (2L, "BAZIL"),       // dropped char -> dist 1
      (3L, "CANNADA"),     // doubled char -> dist 1
      (4L, "AGENTINA"),    // dropped char, blocks with both A-names
      (5L, "XYLOPHONE"),   // no block survivor -> NULL match
      (6L, "XRAZIL"),      // FIRST-char typo: only the last-char
                           // rescue block can recover it
      (7L, "XRAZIX")       // both end chars corrupted -> neither
                           // block fires -> NULL (fail loud)
    ).toDF("dirty_id", "dirty_name")
    val got = Dedup.fuzzyLinkage(dirty, clean).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(2)),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) === ((Some("BRAZIL"), 0L)))
    assert(got(2L) === ((Some("BRAZIL"), 1L)))
    assert(got(3L) === ((Some("CANADA"), 1L)))
    assert(got(4L) === ((Some("ARGENTINA"), 1L)))
    assert(got(5L) === ((None, -1L)), "out-of-budget must surface as NULL")
    assert(got(6L) === ((Some("BRAZIL"), 1L)),
      "first-char typo must be recovered via the last-char block")
    assert(got(7L) === ((None, -1L)),
      "typos corrupting BOTH block keys still fail loud with NULL")
    // registry instantiation: every derived typo re-links to its source
    val n = Tables.nation(spark, sf001)
    val linked = Dedup.fuzzyLinkageQ(spark, sf001).collect()
    val names = n.collect().map(r =>
      r.getAs[Number]("n_nationkey").longValue -> r.getAs[String]("n_name")).toMap
    assert(linked.length === names.size)
    linked.foreach { r =>
      val (id, matched) =
        (r.get(0).asInstanceOf[Number].longValue, Option(r.getString(2)))
      assert(matched.contains(names(id)),
        s"nation $id (${names(id)}) mis-linked to $matched")
    }
  }
}
