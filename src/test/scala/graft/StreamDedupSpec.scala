package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.StreamDedup

/** st16's stream-vs-batch contract: the stateless stream-static band
  * join emits exactly the collisions a batch derivation over the same
  * split computes — and re-running the gate (fresh checkpoint replay)
  * changes nothing. The DuckDB hash gate covers the values; these hold
  * the engine-internal equivalence the oracle can't see.
  */
class StreamDedupSpec extends AnyFunSuite with SparkFixture {

  test("st16: streaming gate output == batch band-join twin, twice") {
    val docs = Tables.documents(spark, sf001)
    val newFrom = docs.agg(max(col("doc_id"))).head.getLong(0) - 49L
    val got = StreamDedup.st16StreamDedupGate(spark, sf001)
      .collect().map(_.toSeq).toSeq
    // batch twin: the same banded keys on both halves, same equi-join
    val keys = Dedup.bandedKeys(docs, 32, 3, 8)
    val expect = keys.filter(col("doc_id") >= newFrom)
      .join(keys.filter(col("doc_id") < newFrom)
          .select(col("band"), col("band_hash"), col("doc_id").as("hist_id")),
        Seq("band", "band_hash"))
      .select(col("doc_id"), col("hist_id"), col("band"))
      .orderBy(col("doc_id"), col("hist_id"), col("band"))
      .collect().map(_.toSeq).toSeq
    assert(got === expect)
    assert(got.nonEmpty, "the staged corpus's planted near-dups must collide")
    // every collision pairs an arrival with strict history
    assert(got.forall(r => r.head.asInstanceOf[Long] >= newFrom))
    assert(got.forall(r => r(1).asInstanceOf[Long] < newFrom))
    // replay: a second gate run (same checkpoint) reports the same hits
    val again = StreamDedup.st16StreamDedupGate(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(again === got)
  }

  test("st27: streaming binary door == batch twin; derived near-copies collide with their originals") {
    import graft.operators.Multimodal
    val got = StreamDedup.st27StreamPhashGate(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val expect = StreamDedup.st27BatchTwin(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(got === expect)
    // non-vacuous: the one-byte-perturbed arrivals really collide with
    // history within the radius — the class the door exists to catch
    assert(got.nonEmpty, "derived near-copies must collide with their originals")
    assert(got.forall(r => r(2).asInstanceOf[Long] <= 3L))
    // arrivals carry the perturb offset; history ids never do
    assert(got.forall(r =>
      r.head.asInstanceOf[Long] >= Multimodal.PhashPerturbOffset))
    assert(got.forall(r =>
      r(1).asInstanceOf[Long] < Multimodal.PhashPerturbOffset))
    // most arrivals find their own original (id difference = offset)
    val selfHits = got.count(r => r.head.asInstanceOf[Long] -
      Multimodal.PhashPerturbOffset == r(1).asInstanceOf[Long])
    assert(selfHits >= 40, s"expected >=40 of 50 originals rediscovered, got $selfHits")
  }

  test("st17: streaming quality gate == batch td6 decisions, with attribution") {
    import graft.operators.TextAnalysis
    val got = StreamDedup.st17StreamQualityGate(spark, sf001)
    // batch twin: td6's flags projected to the gate's columns
    val batch = TextAnalysis.qualityFilter(Tables.documents(spark, sf001))
    val expect = batch.select(col("doc_id"), col("n_tokens"), col("keep"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val gotRows = got.collect()
    assert(gotRows.map(r => Seq(r.get(0), r.get(1), r.get(2))).toSeq === expect)
    // attribution: rejected rows name a rule, kept rows name none, and the
    // named rule's flag is genuinely false in the batch twin
    val flags = batch.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getValuesMap[Any](
        Seq("r_n_tokens", "r_token_len", "r_stopwords", "r_symbols", "r_distinct"))).toMap
    gotRows.foreach { r =>
      val reason = Option(r.getAs[String]("reject_rule"))
      if (r.getAs[Boolean]("keep")) assert(reason.isEmpty)
      else {
        assert(reason.nonEmpty)
        assert(flags(r.getAs[Long]("doc_id"))(reason.get) === false)
      }
    }
    // the corpus exercises both branches
    assert(gotRows.exists(_.getAs[Boolean]("keep")))
    assert(gotRows.exists(!_.getAs[Boolean]("keep")))
  }

  test("st24: the fused gauntlet's verdicts equal each standalone gate's keep column") {
    val fused = StreamDedup.st24StreamGauntlet(spark, sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    val newFrom = Tables.documents(spark, sf001)
      .agg(max(col("doc_id"))).head.getLong(0) - 49L
    def keeps(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      df.filter(col("doc_id") >= newFrom)
        .select(col("doc_id"), col("keep")).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val q = keeps(StreamDedup.st17StreamQualityGate(spark, sf001))
    val o = keeps(StreamDedup.st18StreamOovGate(spark, sf001))
    val s = keeps(StreamDedup.st20StreamSurprisalGate(spark, sf001))
    val p = keeps(StreamDedup.st21StreamPiiGate(spark, sf001))
    val c = keeps(StreamDedup.st22StreamDecontGate(spark, sf001))
    assert(fused.keySet === q.keySet)
    fused.foreach { case (id, r) =>
      assert(r.getBoolean(1) === q(id), s"quality($id)")
      assert(r.getBoolean(2) === o(id), s"oov($id)")
      assert(r.getBoolean(3) === s(id), s"surprisal($id)")
      assert(r.getBoolean(4) === p(id), s"pii($id)")
      assert(r.getBoolean(5) === c(id), s"decont($id)")
      assert(r.getBoolean(6) ===
        (q(id) && o(id) && s(id) && p(id) && c(id)), s"admitted($id)")
    }
    // both outcomes live
    assert(fused.values.exists(_.getBoolean(6)))
    assert(fused.values.exists(!_.getBoolean(6)))
  }

  test("st22: streaming decontamination gate == batch bloom replay; zero-shingle fails closed") {
    val got = StreamDedup.st22StreamDecontGate(spark, sf001).collect()
    val docs = Tables.documents(spark, sf001)
    val newFrom = docs.agg(max(col("doc_id"))).head.getLong(0) - 49L
    // batch twin: dd13's position-join formulation over the same splits
    val ex = Dedup.explodedShingles(docs, 3)
    val ep = ex.filter(col("doc_id") < StreamDedup.DecontEvalDocs)
      .select(explode(Dedup.bloomPositions(col("s"))).as("p")).distinct()
      .withColumn("present", lit(1))
    val perDoc = ex.filter(col("doc_id") >= newFrom)
      .select(col("doc_id"), col("s"),
        explode(Dedup.bloomPositions(col("s"))).as("p"))
      .join(broadcast(ep), Seq("p"), "left")
      .groupBy(col("doc_id"), col("s"))
      .agg(count(col("present")).as("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        count(when(col("h") === Dedup.BloomHashes, 1)).as("n_fl"))
    val expect = docs.filter(col("doc_id") >= newFrom).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_sh"), lit(0L)).as("n_shingles"),
        coalesce(col("n_fl"), lit(0L)).as("n_flagged"))
      .withColumn("keep", col("n_shingles") > 0 && col("n_flagged") === 0)
      .orderBy(col("doc_id")).collect()
    assert(got.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
    // the corpus exercises both branches, and the fail-closed rule holds:
    // keep is only ever true when the screen actually saw shingles
    assert(got.exists(_.getAs[Boolean]("keep")))
    assert(got.exists(!_.getAs[Boolean]("keep")))
    got.foreach { r =>
      if (r.getAs[Long]("n_shingles") === 0L)
        assert(!r.getAs[Boolean]("keep"), "zero-shingle arrival slipped past")
    }
  }

  test("st21: streaming PII gate == batch td12 scan, counts-and-hashes only") {
    import graft.operators.TextAnalysis
    val got = StreamDedup.st21StreamPiiGate(spark, sf001).collect()
    // batch twin: td12's scan projected to the gate contract
    // (pii_free IS the keep rule; redaction fingerprints must be
    // byte-identical so scrub-and-admit consumers can trust them)
    val expect = TextAnalysis.piiScan(Tables.documents(spark, sf001))
      .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
        col("redacted_fp"), col("pii_free").as("keep"))
      .orderBy(col("doc_id")).collect()
    assert(got.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
    assert(got.nonEmpty)
    // the gate log never carries raw text: schema is counts + hash + flag
    assert(got.head.schema.fieldNames.toSeq ===
      Seq("doc_id", "n_emails", "n_ipv4", "n_phones", "redacted_fp", "keep"))
  }

  test("st18: streaming OOV gate == batch vocabulary replay; empty docs fail closed") {
    val docs = Tables.documents(spark, sf001)
    val newFrom = docs.agg(max(col("doc_id"))).head.getLong(0) - 49L
    val rows = StreamDedup.st18StreamOovGate(spark, sf001).collect()
    assert(rows.length === 50, "one decision per arrival")
    assert(rows.forall(_.getAs[Long]("doc_id") >= newFrom))
    // batch twin: history vocabulary, arrival token stream, left-join count
    import graft.functions.tokens
    val vocab = docs.filter(col("doc_id") < newFrom)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(200)
      .collect().map(_.getString(0)).toSet
    val arr = docs.filter(col("doc_id") >= newFrom)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      val toks = arr(r.getAs[Long]("doc_id"))
      val oov = toks.count(t => !vocab.contains(t)).toLong
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("n_oov") === oov)
      if (toks.nonEmpty)
        assert(r.getAs[Boolean]("keep") ===
          (oov.toDouble / toks.length.toDouble <= 0.5))
      else assert(r.getAs[Boolean]("keep") === false, "empty doc must fail closed")
    }
    // both decisions occur on the staged corpus (planted junk arrivals)
    assert(rows.exists(_.getAs[Boolean]("keep")))
  }

  test("st20: streaming LM-surprisal gate == batch LM replay; thresholds bind; empty docs fail closed") {
    val docs = Tables.documents(spark, sf001)
    val newFrom = docs.agg(max(col("doc_id"))).head.getLong(0) - 49L
    val rows = StreamDedup.st20StreamSurprisalGate(spark, sf001).collect()
    assert(rows.length === 50, "one decision per arrival")
    assert(rows.forall(_.getAs[Long]("doc_id") >= newFrom))
    // batch twin: history-trained add-one LM with the CAPPED top-V head
    // and the pooled-tail OOV draw — re-derived from the FULL vocabulary
    // here, so the test proves the capped artifact equals what an
    // unbounded derivation would pool
    import graft.functions.tokens
    val lm = docs.filter(col("doc_id") < newFrom)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val denom = lm.values.sum + lm.size + 1L
    val v = StreamDedup.LmVocabSize
    assert(lm.size > v,
      "the staged vocabulary must exceed LmVocabSize so the pooled-tail branch is live")
    val head = lm.toSeq.sortBy { case (t, c) => (-c, t) }.take(v).toMap
    val cTail = (lm.values.sum - head.values.sum) / (lm.size - v)
    def flog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val arr = docs.filter(col("doc_id") >= newFrom)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      val toks = arr(r.getAs[Long]("doc_id"))
      val bits = toks.map(t => flog2(denom / (head.getOrElse(t, cTail) + 1L))).sum
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("bits") === bits)
      if (toks.nonEmpty)
        assert(r.getAs[Boolean]("keep") ===
          (bits.toDouble / toks.length <= StreamDedup.MaxSurprisalBits))
      else assert(r.getAs[Boolean]("keep") === false, "empty doc must fail closed")
    }
    assert(rows.exists(_.getAs[Boolean]("keep")), "default threshold keeps something")
    // the threshold BINDS in both directions: 0 rejects every nonempty
    // arrival, an infinite budget admits every nonempty arrival
    val strict = StreamDedup.st20StreamSurprisalGate(spark, sf001, maxBitsPerToken = 0.0)
      .collect()
    assert(strict.forall(r => !r.getAs[Boolean]("keep") ||
      r.getAs[Long]("n_tokens") === 0L))
    assert(strict.forall(!_.getAs[Boolean]("keep")))
    val loose = StreamDedup.st20StreamSurprisalGate(spark, sf001, maxBitsPerToken = 1e9)
      .collect()
    loose.foreach { r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("n_tokens") > 0L))
    }
  }

  test("st25: streaming BPE gate == batch replay of the history-trained merges; thresholds bind") {
    import graft.operators.TextAnalysis
    import graft.functions.tokens
    val docs = Tables.documents(spark, sf001)
    val newFrom = docs.agg(max(col("doc_id"))).head.getLong(0) - 49L
    val rows = StreamDedup.st25StreamBpeGate(spark, sf001).collect()
    assert(rows.length === 50, "one decision per arrival")
    assert(rows.forall(_.getAs[Long]("doc_id") >= newFrom))
    // batch twin: the shared recurrence on the history split, merges
    // applied locally with the textbook greedy-leftmost loop — an
    // INDEPENDENT formulation of the engine's replace-chain encode
    val pairs = TextAnalysis
      .trainBpeMerges(docs.filter(col("doc_id") < newFrom))
      .map { case (_, l, r, _, _) => (l, r) }
    assert(pairs.nonEmpty, "history must train at least one merge")
    def enc(w: String): Long = {
      var syms = w.map(_.toString).toArray
      pairs.foreach { case (l, r) =>
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
    val arr = docs.filter(col("doc_id") >= newFrom)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      val words = arr(r.getAs[Long]("doc_id"))
        .filter(_.matches(TextAnalysis.BpeWordPattern))
      val nb = words.map(enc).sum
      assert(r.getAs[Long]("n_words") === words.length.toLong)
      assert(r.getAs[Long]("n_bpe_tokens") === nb)
      if (words.nonEmpty)
        assert(r.getAs[Boolean]("keep") ===
          (nb.toDouble / words.length <= StreamDedup.MaxBpeRatio))
      else assert(r.getAs[Boolean]("keep") === false,
        "word-free arrival must fail closed")
    }
    // the staged corpus exercises BOTH decisions at the default ceiling
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
    // the threshold BINDS both directions: 0 rejects everything, an
    // infinite budget admits exactly the word-bearing arrivals
    val strict = StreamDedup.st25StreamBpeGate(spark, sf001, maxRatio = 0.0)
      .collect()
    assert(strict.forall(!_.getAs[Boolean]("keep")))
    val loose = StreamDedup.st25StreamBpeGate(spark, sf001, maxRatio = 1e9)
      .collect()
    loose.foreach { r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("n_words") > 0L))
    }
  }

  test("st19: streaming anomaly gate == batch fence replay; fences come from history only") {
    import graft.operators.Analytics
    val events = Tables.events(spark, sf001)
    val cutoff = events.agg(date_trunc("DAY", max(col("ts")))).head.getTimestamp(0)
    val rows = StreamDedup.st19StreamAnomalyGate(spark, sf001).collect()
    assert(rows.nonEmpty, "the last staged day must have arrivals")
    // batch twin: q49's machinery over the strict history
    val hist = events.filter(col("ts") < lit(cutoff))
      .select(col("event_type"), col("value"))
    val med = hist.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val fences = hist.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"), expr("percentile(dev, 0.5D)").as("mad"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    rows.foreach { r =>
      val (m, d) = fences(r.getAs[String]("event_type"))
      val v = r.getAs[Double]("value")
      assert(r.getAs[Boolean]("is_outlier") === (math.abs(v - m) > 3.0 * d))
    }
    // FAIL CLOSED: an arriving event_type with NO history fence must be
    // flagged (is_outlier = true, NULL fence columns), never dropped —
    // an inner join would silently pass schema drift / minted types
    locally {
      import spark.implicits._
      val arr = Seq((900001L, "zz_never_seen", 1.0), (900002L, "click", 1.0))
        .toDF("event_id", "event_type", "value")
      val fen = Seq(("click", 1.0, 2.0)).toDF("event_type", "med", "mad")
      val gated = StreamDedup.anomalyGate(arr, fen).collect()
        .map(r => r.getAs[Long]("event_id") -> r).toMap
      assert(gated.size === 2, "unfenced arrivals must stay in the output")
      val unseen = gated(900001L)
      assert(unseen.getAs[Boolean]("is_outlier"), "no fence must fail closed")
      assert(unseen.isNullAt(unseen.fieldIndex("med_value")))
      assert(unseen.isNullAt(unseen.fieldIndex("mad_value")))
      assert(!gated(900002L).getAs[Boolean]("is_outlier"))
    }
    // the fence must NOT see the arrivals: recompute including the last
    // day and demand at least one type's fence differs (the gated day
    // shifts the median/MAD unless the corpus is pathological)
    val all = events.select(col("event_type"), col("value"))
    val medAll = all.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val histOnly = fences.map { case (t, (m, _)) => t -> m }
    assert(rows.map(_.getAs[String]("event_type")).distinct.forall(histOnly.contains))
    // q49 over the full corpus remains the batch reconciliation path
    assert(Analytics.q49RobustOutliers(spark, sf001).count() > 0)
    assert(medAll.nonEmpty)
  }
}
