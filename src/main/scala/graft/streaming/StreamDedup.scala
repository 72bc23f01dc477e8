package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Streaming NEAR-DUP GATE — continuous-ingestion dedup, the streaming
  * face of the dd4/dd11 MinHash family: documents arriving on a stream
  * are checked against the banded MinHash keys of the already-ingested
  * history, and every (arrival, historical doc) band collision is
  * emitted as it happens. This is the admission control a continuously
  * fed training corpus runs at the door: flag an arrival that
  * near-duplicates history BEFORE it lands in the corpus, instead of
  * re-clustering the world nightly (dd11's batch catch-up remains the
  * reconciliation path; the gate is the low-latency screen in front of
  * it).
  *
  * Shape: the history side is a STATIC band-key table (built once per
  * gate start from the frozen history, the dd11 split); each arrival's
  * band keys are pure per-row expressions over the native MinHash
  * signature ([[Dedup.bandedKeys]] — no state, no watermark), and the
  * stream-static EQUI-join on (band, band_hash) is stateless: every
  * matched pair is emitted exactly once as its micro-batch processes,
  * the st15 discipline. At 100 TB the history keys live as a bucketed
  * table on (band, band_hash) so each micro-batch joins
  * arrival-batch-sized probes against co-located buckets; nothing in
  * the plan accumulates state or scales with history except that
  * pre-built table.
  *
  * Hash-gated: the signatures are the engine-portable md5-derived
  * draws, so the DuckDB oracle re-derives both sides' band keys and
  * replays the same equi-join declaratively.
  */
object StreamDedup {

  /** Streaming source over the documents table only — the
    * [[EventStreams.eventStream]] single-file glob trick, schema pinned
    * from the static read so batch and stream see identical rows.
    */
  private[graft] def documentStream(
      spark: SparkSession, sfDir: String,
      sourceOptions: Map[String, String] = Map.empty): DataFrame = {
    val p = Tables.path(sfDir, "documents")
    val streamPath =
      if (new java.io.File(p).isFile) s"${p.dropRight(1)}[${p.last}]" else p
    spark.readStream
      .schema(Tables.documents(spark, sfDir).schema)
      .options(sourceOptions)
      .parquet(streamPath)
  }

  /** st16 — the gate itself: history = docs below the dd11 batch split
    * (`max(doc_id) − 49`), arrivals = the stream filtered to the batch
    * (the filter pushes into the streaming scan). One output row per
    * (arrival, historical doc, band) collision; per-pair multiplicity =
    * number of shared bands, the dd4 `n_shared_bands` signal without a
    * stateful aggregation (counting would need state — the consumer
    * aggregates downstream if it wants counts, exactly how dd4 reads
    * this stream's batch twin).
    */
  def st16StreamDedupGate(
      spark: SparkSession, sfDir: String, k: Int = 32, n: Int = 3,
      bands: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // the dd11 convention: the last 50 ids are "today's batch" at any
    // scale; the max-id probe is a metadata-scale scalar
    val newFrom = Dedup.arrivalSplit(docs)
    val histKeys = Dedup.bandedKeys(docs.filter(col("doc_id") < newFrom), k, n, bands)
      .select(col("band"), col("band_hash"), col("doc_id").as("hist_id"))
    val arrivals = documentStream(spark, sfDir)
      .filter(col("doc_id") >= newFrom)
    val hits = Dedup.bandedKeys(arrivals, k, n, bands)
      .join(histKeys, Seq("band", "band_hash"))
      .select(col("doc_id"), col("hist_id"), col("band"))
    EventStreams.runToParquet(hits, "st16_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .orderBy(col("doc_id"), col("hist_id"), col("band"))
  }

  /** st27 — streaming BINARY near-dup door (r18 verdict item 5): the
    * admission gauntlet screens TEXT five ways (st16–st25) but until
    * this gate a binary/image arrival passed unscreened — the multimodal
    * half of the corpus had no door. This is st16's stream-static shape
    * over mm14's signature space: the HISTORY side is the full corpus's
    * perceptual band keys ([[graft.operators.Multimodal.phashNearDups]]'
    * `phash60p` signature → [[Dedup.bandKeysFromSigs]]' 10 pigeonhole
    * band keys — built ONCE per gate start; at 100 TB a bucketed table
    * on `key`, exactly st16's posture), and each ARRIVAL's signature +
    * band keys are pure map-side expressions — no state, no watermark,
    * no shuffle on the stream side before the equi-join. A collision
    * verifies with the exact map-side Hamming check, so the gate emits
    * true radius-3 near-dups of history, not band coincidences.
    *
    * Non-vacuity (the dd18/mm14 move): the driver corpus is benign
    * prose with no natural perceptual near-dups, so the registry
    * instantiation derives each arrival as a one-byte-perturbed COPY of
    * a historical doc (first char → 'Z', doc_id + PhashPerturbOffset) —
    * exactly the re-encoded-copy class the door exists to catch; most
    * arrivals collide with their originals within the radius, so the
    * banding, join and verify are gated on real matches. The oracle
    * applies the identical derivation over the shared literals
    * (PhashSigCtesSql + simhashBandsSql + ArrivalOffsetSql). A real
    * deployment feeds its asset stream directly and keys history by
    * content id.
    *
    * Per-band multiplicity is collapsed batch-side after the sink
    * (DISTINCT over (arrival, hist, hamming)) — the streamed rows are
    * one per band collision, st16's stateless contract; a stateful
    * streaming dedup would hold unbounded pair state for no gate value.
    */
  def st27StreamPhashGate(
      spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sfDir)
    val newFrom = Dedup.arrivalSplit(docs)
    def sigs(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        call_function("phash60p", col("text").cast("binary")).as("sig"))
      .filter(col("sig").isNotNull)
    val histKeys = Dedup.bandKeysFromSigs(sigs(docs))
      .select(col("key"), col("doc_id").as("hist_id"), col("sig").as("hist_sig"))
    val arrivals = documentStream(spark, sfDir)
      .filter(col("doc_id") >= newFrom)
      .select((col("doc_id") + Multimodal.PhashPerturbOffset).as("doc_id"),
        concat(lit("Z"), expr("substring(text, 2)")).as("text"))
    val hits = Dedup.bandKeysFromSigs(sigs(arrivals))
      .join(histKeys, Seq("key"))
      .select(col("doc_id"), col("hist_id"),
        bit_count(col("sig").bitwiseXOR(col("hist_sig"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    EventStreams.runToParquet(hits, "st27_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .distinct().orderBy(col("doc_id"), col("hist_id"))
  }

  /** st27's BATCH twin — the identical frame with the arrival side read
    * statically: the stream≡batch parity bar every gate in this file
    * meets (StreamDedupSpec asserts equality row-for-row).
    */
  private[graft] def st27BatchTwin(
      spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sfDir)
    val newFrom = Dedup.arrivalSplit(docs)
    def sigs(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        call_function("phash60p", col("text").cast("binary")).as("sig"))
      .filter(col("sig").isNotNull)
    val histKeys = Dedup.bandKeysFromSigs(sigs(docs))
      .select(col("key"), col("doc_id").as("hist_id"), col("sig").as("hist_sig"))
    val arrivals = docs
      .filter(col("doc_id") >= newFrom)
      .select((col("doc_id") + Multimodal.PhashPerturbOffset).as("doc_id"),
        concat(lit("Z"), expr("substring(text, 2)")).as("text"))
    Dedup.bandKeysFromSigs(sigs(arrivals))
      .join(histKeys, Seq("key"))
      .select(col("doc_id"), col("hist_id"),
        bit_count(col("sig").bitwiseXOR(col("hist_sig"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct().orderBy(col("doc_id"), col("hist_id"))
  }

  /** st17 — streaming QUALITY-ADMISSION gate: the streaming face of the
    * td6 Gopher/C4 document filter, the second admission screen a
    * continuously fed corpus runs at the door (st16 rejects near-dups of
    * history; this rejects low-quality arrivals outright). Every arrival
    * gets the td6 rule flags evaluated MAP-SIDE on its micro-batch —
    * [[graft.operators.TextAnalysis.qualityRules]] is pure expression
    * work, so the gate is completely STATELESS: no watermark, no state
    * store, no shuffle before the sink. Emitted per doc: the keep
    * decision plus `reject_rule`, the FIRST failed rule in declaration
    * order — the V9-style accounting a pipeline reports rejection rates
    * from (sequential attribution, exactly the cleaning-accounting
    * convention).
    *
    * At 100 TB this runs at source throughput: the plan is scan →
    * project → sink, parallel in the number of input files, and the
    * rules are defined ONCE (shared with batch td6) so batch backfill
    * and streaming admission can never disagree on what "quality" means.
    * Hash-gated: flags and the attribution are deterministic text
    * functions, so the DuckDB oracle replays them declaratively.
    */
  def st17StreamQualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val rules = TextAnalysis.qualityRules(col("toks"), col("text"))
    val flagged = documentStream(spark, sfDir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id") +: size(col("toks")).cast("long").as("n_tokens") +:
        rules.map { case (n, c) => c.as(n) }: _*)
    // first-failed-rule attribution: CASE chain in declaration order
    val reject = rules.foldRight(lit(null).cast("string")) {
      case ((n, _), tail) => when(!col(n), lit(n)).otherwise(tail)
    }
    val gated = flagged
      .withColumn("keep", rules.map(r => col(r._1)).reduce(_ && _))
      .withColumn("reject_rule", reject)
      .select(col("doc_id"), col("n_tokens"), col("keep"), col("reject_rule"))
    EventStreams.runToParquet(gated, "st17_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .orderBy(col("doc_id"))
  }

  /** st18 — streaming OOV gate against a BATCH-BUILT vocabulary
    * artifact: the third admission screen (st16 rejects near-dups of
    * history, st17 rejects rule-measured junk; this rejects arrivals
    * whose vocabulary doesn't match the corpus the model is being
    * trained on — wrong language, encoding garbage, machine noise). The
    * td19 head-vocabulary cut runs ONCE over the frozen history (the
    * dd11 split st16 uses), and the V-row artifact is inlined into the
    * streaming plan as a literal array — the batch→stream artifact
    * handoff pattern (sim7 does it with centroids): the gate itself
    * stays STATELESS, scan → project → sink, no watermark, no state
    * store, no shuffle.
    *
    * The per-token membership probe is an `aggregate` HOF over the
    * token array against the V-element literal — O(V) per token,
    * interpreted. That is the right trade at gate scale (V=200); the
    * 100 TB upgrade path when V grows to millions is the dd13 shape: a
    * bloom_filter_agg artifact probed with might_contain, with the
    * exact re-check running in the batch reconciliation pass.
    *
    * Empty docs (zero tokens) are REJECTED with a NULL rate — a gate
    * must fail closed; both engines' CASE/coalesce agree.
    */
  def st18StreamOovGate(
      spark: SparkSession, sfDir: String,
      vocabSize: Int = graft.operators.TextAnalysis.HeadVocabSize,
      maxOovRate: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val newFrom = Dedup.arrivalSplit(docs)
    // V-row artifact collect (aggregate-scale, the sim7 centroid pattern)
    val vocab = docs.filter(col("doc_id") < newFrom)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .select(col("tok")).collect().map(_.getString(0))
    val arrivals = documentStream(spark, sfDir)
      .filter(col("doc_id") >= newFrom)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0L),
          // isInCollection → optimizer rewrites to InSet (hash-set
          // probe) — the old array_contains over a V-element array
          // literal scanned all V entries PER TOKEN (V × tokens
          // comparisons per doc at the door; membership semantics
          // identical, nulls included)
          (acc, t) => acc + when(t.isInCollection(vocab), 0L).otherwise(1L))
          .as("n_oov"))
    val rate = col("n_oov").cast("double") /
      nullif(col("n_tokens").cast("double"), lit(0.0))
    val gated = arrivals
      .withColumn("keep", coalesce(rate <= lit(maxOovRate), lit(false)))
      .withColumn("oov_rate", r6(rate))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("keep"),
        col("oov_rate"))
    EventStreams.runToParquet(gated, "st18_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .orderBy(col("doc_id"))
  }

  /** The stateless fence-compare plan shared by [[st19StreamAnomalyGate]]
    * and its spec: left-join arrivals to the broadcast fences, flag
    * outside-fence values, and fail closed (outlier) when the type has
    * no fence at all.
    */
  def anomalyGate(arrivals: DataFrame, fences: DataFrame): DataFrame =
    arrivals
      .join(broadcast(fences), Seq("event_type"), "left")
      .withColumn("is_outlier",
        coalesce(abs(col("value") - col("med")) > lit(3.0) * col("mad"),
          lit(true)))
      .select(col("event_id"), col("event_type"), col("value"),
        r6(col("med")).as("med_value"), r6(col("mad")).as("mad_value"),
        col("is_outlier"))

  /** st19 — streaming ANOMALY gate from batch-built robust fences: the
    * q49 median/MAD profile is computed ONCE over the frozen history
    * (events strictly before the last staged day) and broadcast into a
    * stateless stream plan that flags every arriving event outside its
    * type's |value − med| > 3·MAD fence — the drift/fraud screen a
    * pipeline runs at the door with fences that one arriving whale
    * CANNOT move (the robust-statistics point; a mean/stddev fence
    * updates itself toward the attack). Completes the
    * batch-artifact-into-stream set: st16 ships history's MinHash keys,
    * st18 ships the history vocabulary, this ships history's robust
    * fences. Gate plan: scan → broadcast-join (|event_type| rows) →
    * project → sink; no watermark, no state, source throughput at any
    * scale. Refreshing the fences is a periodic batch job over the same
    * [[graft.operators.Analytics.q49RobustOutliers]] machinery.
    *
    * The fence compare runs on UNROUNDED doubles (med/mad are
    * engine-identical per the q19 percentile≡quantile_cont match), so
    * the flagged SET is hash-gated, not just the rounded columns.
    *
    * FAIL CLOSED on unseen types: arrivals join the fences LEFT, and an
    * event_type with no history fence (schema drift, or an attacker
    * minting a fresh type to slip past the screen) is flagged
    * `is_outlier = true` with NULL med/mad — the st18 posture (empty
    * docs rejected), never silently dropped from the gate output as an
    * inner join would do.
    */
  def st19StreamAnomalyGate(spark: SparkSession, sfDir: String): DataFrame = {
    // screened: the cutoff probe and the fences must see the same rows
    // the (screened) stream does — one far-future timestamp would
    // otherwise move the cutoff past the corpus and empty the gate
    val events = EventStreams.validEventTime(Tables.events(spark, sfDir))
    // metadata-scale probe: the gate covers the last staged day; fences
    // come from strictly-earlier history
    val cutoff = events.agg(date_trunc("DAY", max(col("ts"))).as("c"))
      .head.getTimestamp(0)
    val hist = events.filter(col("ts") < lit(cutoff))
      .select(col("event_type"), col("value"))
    val med = hist.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val fences = hist.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"), expr("percentile(dev, 0.5D)").as("mad"))
    val arrivals = EventStreams.eventStream(spark, sfDir)
      .filter(col("ts") >= lit(cutoff))
      .select(col("event_id"), col("event_type"), col("value"))
    EventStreams.runToParquet(anomalyGate(arrivals, fences), "st19_sink",
        statePartitions = EventStreams.gateParts(sfDir))
      .orderBy(col("event_id"))
  }

  /** st20 shared threshold — single source for the engine default AND
    * the generated oracle literal (the HeadVocabSize pattern). 4.5
    * bits/token sits at ~p95 of the staged corpus's score distribution.
    */
  val MaxSurprisalBits: Double = 4.5

  /** st20 LM head size — single source for the engine default AND the
    * generated oracle literals (the HeadVocabSize pattern). The inlined
    * LM is CAPPED at this many types (see [[lmArtifact]]); 24 is
    * deliberately BELOW the staged corpus's 31-type vocabulary so the
    * pooled-tail branch is live — and therefore hash-gated — at every
    * test scale, not just in production.
    */
  val LmVocabSize: Int = 24

  /** The capped LM artifact shared by st20 and st24: (denom, cTail,
    * head types with their exact counts). The add-one denominator
    * N+D+1 is EXACT over the FULL history (two scalar aggregates — it
    * never rides on the collect), the head is the top-V types by
    * (count DESC, tok), and every type outside the head — pruned tail
    * AND genuinely unseen — draws the POOLED tail count
    * cTail = floor(tailMass / tailTypes) (0 when the head covers the
    * vocabulary), so the pruned mass is absorbed, not dropped, and the
    * integer arithmetic stays engine-exact. Driver footprint is V rows
    * + two scalars REGARDLESS of corpus content — the fix for the
    * unbounded full-vocabulary collect this replaced: a 100 TB web
    * corpus's unigram vocabulary is hapax-heavy and effectively
    * unbounded, so inlining it was a driver OOM and a plan-literal
    * blow-up; under Zipf the pooled tail mean sits near 1, so the OOV
    * draw stays close to the add-one ceiling floorlog2(N+D+1) the
    * uncapped model charged.
    */
  private def lmArtifact(histToks: DataFrame): (Long, Long, Array[(String, Long)]) = {
    val stats = histToks.agg(sum(col("n")).as("mass"), count(lit(1)).as("d")).head
    val mass = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val d = stats.getLong(1)
    val head = histToks.orderBy(col("n").desc, col("tok")).limit(LmVocabSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val denom = mass + d + 1L
    val cTail =
      if (d > LmVocabSize) (mass - head.map(_._2).sum) / (d - LmVocabSize)
      else 0L
    (denom, cTail, head)
  }

  /** st20 — streaming LM-SURPRISAL gate from a batch-trained language
    * model: td21's CCNet-shape scorer lifted to the admission door. The
    * add-one unigram LM trains ONCE over the frozen history (the st16
    * split), and its integer bits-per-token table — floorlog2((N+D+1)
    * div (c+1)), exact integer arithmetic, see td21 — is inlined into
    * the streaming plan as a map literal CAPPED at the top
    * [[LmVocabSize]] types, with the pruned tail pooled into the OOV
    * draw (see [[lmArtifact]] — the artifact is V rows + two scalars no
    * matter how large the corpus vocabulary grows; the alternative
    * production shape for a huge V is td21's broadcast-join handoff).
    * Every arriving doc is scored by one `aggregate` HOF pass: head
    * tokens draw their exact bits, everything else draws
    * floorlog2((N+D+1) div (cTail+1)). An arrival whose mean surprisal
    * exceeds `maxBitsPerToken` reads as off-distribution (noise, wrong
    * language, garbage encoding) and is rejected — the CCNet tail cut
    * running at source throughput: stateless scan → project → sink, no
    * watermark, no state store, no shuffle. Empty docs fail closed
    * (NULL score, keep = false), the st18/st19 posture.
    */
  def st20StreamSurprisalGate(
      spark: SparkSession, sfDir: String,
      maxBitsPerToken: Double = MaxSurprisalBits): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val newFrom = Dedup.arrivalSplit(docs)
    // bounded artifact: top-V head rows + two scalar aggs, never the vocab
    val histToks = docs.filter(col("doc_id") < newFrom)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val (denom, cTail, head) = lmArtifact(histToks)
    def flog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val oovBits = flog2(denom / (cTail + 1L))
    val bitsMap = map(head.flatMap { case (t, c) =>
      Seq(lit(t), lit(flog2(denom / (c + 1L)))) }.toSeq: _*)
    val arrivals = documentStream(spark, sfDir)
      .filter(col("doc_id") >= newFrom)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => acc + coalesce(element_at(bitsMap, t), lit(oovBits)))
          .as("bits"))
    val rate = col("bits").cast("double") /
      nullif(col("n_tokens").cast("double"), lit(0.0))
    val gated = arrivals
      .withColumn("keep", coalesce(rate <= lit(maxBitsPerToken), lit(false)))
      .withColumn("bits_per_token", r6(rate))
      .select(col("doc_id"), col("n_tokens"), col("bits"), col("keep"),
        col("bits_per_token"))
    EventStreams.runToParquet(gated, "st20_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .orderBy(col("doc_id"))
  }

  /** st21 — streaming PII gate: td12's detect-and-redact scan lifted to
    * the admission door — the sixth screen, and the one with a different
    * POSTURE: where st16–st20 reject, a PII hit is usually scrubbed and
    * admitted, so the gate emits BOTH decisions per arrival — `keep`
    * (the reject-if-any-PII rule for pipelines that refuse) and
    * `redacted_fp`, the md5 of the redacted text (emails → IPs → phones,
    * td12's order), which is the admit-after-scrub path: the consumer
    * verifies the scrub without the raw text ever crossing the gate log
    * (counts-and-hashes only — the td12 posture, now enforced at
    * ingest).
    *
    * Like st17 it needs no history artifact: three codegen'd regex
    * passes, completely STATELESS — scan → project → sink, no watermark,
    * no state store, no shuffle; source throughput at 100 TB. Patterns
    * are the td12 constants verbatim (one source of truth), so batch
    * backfill and streaming admission can never disagree on what "PII"
    * means.
    */
  def st21StreamPiiGate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), TextAnalysis.EmailPattern, "<EMAIL>"),
          TextAnalysis.Ipv4Pattern, "<IP>"),
        TextAnalysis.PhonePattern, "<PHONE>")
    val gated = documentStream(spark, sfDir)
      .select(
        col("doc_id"),
        call_function("match_count", col("text"),
          lit(TextAnalysis.EmailPattern)).as("n_emails"),
        call_function("match_count", col("text"),
          lit(TextAnalysis.Ipv4Pattern)).as("n_ipv4"),
        call_function("match_count", col("text"),
          lit(TextAnalysis.PhonePattern)).as("n_phones"),
        md5(redacted).as("redacted_fp"))
      .withColumn("keep",
        col("n_emails") === 0 && col("n_ipv4") === 0 && col("n_phones") === 0)
    EventStreams.runToParquet(gated, "st21_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .orderBy(col("doc_id"))
  }

  /** st22 — streaming DECONTAMINATION gate from a batch-built bloom
    * BITSET: the seventh admission screen, and the shipped form of the
    * upgrade path st18 documents — dd13's eval-suite bloom probed at
    * the door, so an arrival that overlaps the held-out benchmark is
    * rejected BEFORE it can contaminate the training corpus (and every
    * reported eval after it). Completes the batch-artifact-into-stream
    * set: st16 ships MinHash keys, st18 the vocabulary, st19 the
    * fences, st20 the LM — this ships the eval suite as m=2^18 bloom
    * bits.
    *
    * The bitset is inlined as ONE array literal (byte-per-bit: 2^18
    * booleans ≈ 256 KB, one plan object, O(1) `element_at` probes — a
    * position-set literal would be an O(|set|) scan per probe), so the
    * gate stays completely STATELESS: shingle → 5 salted-md5 positions
    * → forall bit-test, all map-side HOF work, scan → project → sink at
    * source throughput, no watermark, no state store, no shuffle — the
    * dd13 aggregate formulation (two groupBys) would be stateful on a
    * stream. When m outgrows a plan literal, the broadcast position
    * join (dd13's own plan) is the documented reconciliation path. No
    * false negatives by construction; FP rate is the dd13-measured
    * bloom trade. Zero-shingle arrivals FAIL CLOSED (a doc too short
    * for the screen to see must not slip past it — the st18 posture).
    */
  /** st22 eval-split size — single source for the engine default AND the
    * generated oracle literal (the dd13 convention: the first
    * `DecontEvalDocs` ids are "the eval suite" at any scale).
    */
  val DecontEvalDocs: Long = 20L

  /** st22/st24 shingle width — single source for the engine default AND
    * the generated oracle slices (the HeadVocabSize pattern; changing
    * the width regenerates `toks[i+1:i+n]` and the range bound in the
    * oracle text with it).
    */
  val DecontShingleN: Int = 3

  def st22StreamDecontGate(
      spark: SparkSession, sfDir: String, nEval: Long = DecontEvalDocs,
      n: Int = DecontShingleN): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val newFrom = Dedup.arrivalSplit(docs)
    // batch side: the eval suite's set-bit positions (bounded by
    // m = BloomBits; at eval scale a few-thousand-row collect — the
    // sim7 centroid / st18 vocab artifact pattern)
    val setBits = Dedup.explodedShingles(docs.filter(col("doc_id") < nEval), n)
      .select(explode(Dedup.bloomPositions(col("s"))).as("p")).distinct()
      .collect().map(_.getLong(0))
    val bits = new Array[Boolean](Dedup.BloomBits.toInt)
    setBits.foreach(p => bits(p.toInt) = true)
    val bloomLit = typedLit(bits.toSeq)
    val flaggedCount = size(filter(col("shingles"), s =>
      forall(Dedup.bloomPositions(s), p =>
        element_at(bloomLit, (p + lit(1L)).cast("int")))))
    val gated = documentStream(spark, sfDir)
      .filter(col("doc_id") >= newFrom)
      .select(col("doc_id"),
        Dedup.shinglesOf(tokens(col("text")), n).as("shingles"))
      .select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_shingles"),
        flaggedCount.cast("long").as("n_flagged"))
      .withColumn("keep", col("n_shingles") > 0 && col("n_flagged") === 0)
    EventStreams.runToParquet(gated, "st22_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .orderBy(col("doc_id"))
  }

  /** st25 shared threshold — single source for the engine default AND
    * the generated oracle literal (the HeadVocabSize pattern): the
    * tokens-per-word admission ceiling. On the staged corpus the
    * history-trained merges compress in-distribution arrivals well
    * below it while character-fragmented text (the merges never fire)
    * sits above — both branches are live, and hash-gated, at every
    * test scale.
    */
  val MaxBpeRatio: Double = 3.8

  /** st25 — streaming SUBWORD-COMPRESSION gate: td26's tokenizer
    * application lifted to the admission door. The BPE merge table
    * trains ONCE on the frozen history (the st16 split, via the shared
    * [[graft.operators.TextAnalysis.trainBpeMerges]] recurrence) and
    * inlines into the streaming plan as ≤ `BpeMerges` literal
    * (search, replace) string pairs — the smallest artifact in the
    * batch→stream handoff set (st16 MinHash keys, st18 vocabulary,
    * st19 fences, st20 LM, st22 bloom bits, this the merge table).
    * Each arrival is encoded exactly as td26 encodes the corpus; a doc
    * whose tokens-per-word ratio exceeds [[MaxBpeRatio]] is text the
    * tokenizer cannot compress — the merges trained on history never
    * fire, so the doc fragments to near-characters: wrong language,
    * obfuscated spam, encoding garbage — the SUBWORD-level complement
    * to st18's word-level OOV screen (a doc built from rare-but-real
    * character sequences passes st18's head-vocab test and still fails
    * here, and vice versa). Stateless scan → project → sink, all
    * codegen'd string work, no watermark/state/shuffle — source
    * throughput at any scale. Word-free arrivals FAIL CLOSED (NULL
    * ratio, keep = false), the st18 posture.
    */
  def st25StreamBpeGate(
      spark: SparkSession, sfDir: String,
      maxRatio: Double = MaxBpeRatio): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sfDir)
    val newFrom = Dedup.arrivalSplit(docs)
    // bounded artifact: <= BpeMerges tiny string pairs, never the vocab
    val pairs = TextAnalysis
      .trainBpeMerges(docs.filter(col("doc_id") < newFrom))
      .map { case (_, l, r, _, _) => (l, r) }
    val words = filter(tokens(col("text")),
      w => w.rlike(TextAnalysis.BpeWordPattern))
    val arrivals = documentStream(spark, sfDir)
      .filter(col("doc_id") >= newFrom)
      .select(col("doc_id"), words.as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
        aggregate(col("ws"), lit(0L),
          (acc, w) => acc + TextAnalysis.bpeSymCount(w, pairs))
          .as("n_bpe_tokens"))
    val rate = col("n_bpe_tokens").cast("double") /
      nullif(col("n_words").cast("double"), lit(0.0))
    val gated = arrivals
      .withColumn("keep", coalesce(rate <= lit(maxRatio), lit(false)))
      .withColumn("bpe_ratio", r6(rate))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        col("keep"), col("bpe_ratio"))
    EventStreams.runToParquet(gated, "st25_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .orderBy(col("doc_id"))
  }

  /** st24 — the STREAMING GAUNTLET: the five stateless admission screens
    * (st17 quality, st18 OOV, st20 LM-surprisal, st21 PII, st22
    * decontamination) FUSED into ONE scan → project → sink plan — what
    * production actually runs at the door: one pass per arrival, not
    * five queries re-reading the stream. Every screen's artifact is
    * built exactly as its standalone gate builds it (same derivations,
    * same shared constants) and inlined into the single projection
    * (vocab array, LM bits map, bloom bitset, rule/PII expressions), so
    * the fused plan is still completely STATELESS — no watermark, no
    * state store, no shuffle, source throughput at 100 TB with 5× fewer
    * scans than the screens run separately. Emitted per arrival: each
    * screen's keep verdict plus `admitted`, the conjunction — pl1's
    * which-gate-killed-this-doc accounting at the door. Hash-gated by
    * the composition discipline: the oracle wraps the five gate oracle
    * texts as CTEs and joins them, so the fusion can never drift from
    * the screens it fuses.
    */
  def st24StreamGauntlet(spark: SparkSession, sfDir: String): DataFrame =
    EventStreams.runToParquet(st24GatedFrame(spark, sfDir), "st24_sink",
        statePartitions = EventStreams.gateParts(sfDir, "documents"))
      .orderBy(col("doc_id"))

  /** The gauntlet's gated STREAM FRAME, factored so the rate drill
    * ([[graft.GauntletRate]]) can drive the identical fused projection
    * over its own multi-file source and time the drain alone:
    * `arrivalsFrom` overrides the dd11 arrival split (the drill gates
    * the WHOLE corpus — a 50-doc arrival batch can't carry a
    * rows/sec claim), `sourceOptions` bounds admission so the backlog
    * splits into sustained micro-batches. Registry defaults reproduce
    * the oracle-gated query exactly.
    */
  private[graft] def st24GatedFrame(
      spark: SparkSession, sfDir: String,
      arrivalsFrom: Option[Long] = None,
      sourceOptions: Map[String, String] = Map.empty): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sfDir)
    // door ARTIFACTS are always built from the real history split (an
    // arrivalsFrom override widens only the gated stream — artifacts
    // from an empty history would change the screens themselves)
    val newFrom = Dedup.arrivalSplit(docs)
    val gateFrom = arrivalsFrom.getOrElse(newFrom)
    val histToks = docs.filter(col("doc_id") < newFrom)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    // st18's vocabulary artifact (same cut, same shared constant)
    val vocab = histToks
      .orderBy(col("n").desc, col("tok")).limit(TextAnalysis.HeadVocabSize)
      .select(col("tok")).collect().map(_.getString(0))
    // st20's LM artifact (same capped top-V + pooled-tail bits table)
    val (denom, cTail, head) = lmArtifact(histToks)
    def flog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val oovBits = flog2(denom / (cTail + 1L))
    val bitsMap = map(head.flatMap { case (t, c) =>
      Seq(lit(t), lit(flog2(denom / (c + 1L)))) }.toSeq: _*)
    // st22's bloom artifact (same eval split, same positions)
    val setBits = Dedup.explodedShingles(
        docs.filter(col("doc_id") < DecontEvalDocs), DecontShingleN)
      .select(explode(Dedup.bloomPositions(col("s"))).as("p")).distinct()
      .collect().map(_.getLong(0))
    val bits = new Array[Boolean](Dedup.BloomBits.toInt)
    setBits.foreach(p => bits(p.toInt) = true)
    val bloomLit = typedLit(bits.toSeq)
    // ONE stateless projection evaluating every screen
    val rules = TextAnalysis.qualityRules(col("toks"), col("text"))
    val nTok = size(col("toks")).cast("long")
    val nOov = aggregate(col("toks"), lit(0L),
      // InSet hash probe, not an array scan — see st18's note
      (acc, t) => acc + when(t.isInCollection(vocab), 0L).otherwise(1L))
    val bitsSum = aggregate(col("toks"), lit(0L),
      (acc, t) => acc + coalesce(element_at(bitsMap, t), lit(oovBits)))
    val oovRate = nOov.cast("double") / nullif(nTok.cast("double"), lit(0.0))
    val surRate = bitsSum.cast("double") / nullif(nTok.cast("double"), lit(0.0))
    val nFlagged = size(filter(col("shingles"), s =>
      forall(Dedup.bloomPositions(s), p =>
        element_at(bloomLit, (p + lit(1L)).cast("int")))))
    val gated = documentStream(spark, sfDir, sourceOptions)
      .filter(col("doc_id") >= gateFrom)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"),
        Dedup.shinglesOf(tokens(col("text")), DecontShingleN).as("shingles"))
      .select(col("doc_id"),
        rules.map(_._2).reduce(_ && _).as("quality_keep"),
        coalesce(oovRate <= lit(0.5), lit(false)).as("oov_keep"),
        coalesce(surRate <= lit(MaxSurprisalBits), lit(false))
          .as("surprisal_keep"),
        (call_function("match_count", col("text"),
            lit(TextAnalysis.EmailPattern)) === 0 &&
          call_function("match_count", col("text"),
            lit(TextAnalysis.Ipv4Pattern)) === 0 &&
          call_function("match_count", col("text"),
            lit(TextAnalysis.PhonePattern)) === 0).as("pii_keep"),
        (size(col("shingles")) > 0 && nFlagged === 0).as("decont_keep"))
      .withColumn("admitted",
        col("quality_keep") && col("oov_keep") && col("surprisal_keep") &&
          col("pii_keep") && col("decont_keep"))
    gated
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st24_stream_gauntlet" ->
      ((s: SparkSession, d: String) => st24StreamGauntlet(s, d)),
    "st22_stream_decont_gate" ->
      ((s: SparkSession, d: String) => st22StreamDecontGate(s, d)),
    "st21_stream_pii_gate" ->
      ((s: SparkSession, d: String) => st21StreamPiiGate(s, d)),
    "st20_stream_surprisal_gate" ->
      ((s: SparkSession, d: String) => st20StreamSurprisalGate(s, d)),
    "st25_stream_bpe_gate" ->
      ((s: SparkSession, d: String) => st25StreamBpeGate(s, d)),
    "st16_stream_dedup_gate" ->
      ((s: SparkSession, d: String) => st16StreamDedupGate(s, d)),
    "st27_stream_phash_gate" ->
      ((s: SparkSession, d: String) => st27StreamPhashGate(s, d)),
    "st17_stream_quality_gate" ->
      ((s: SparkSession, d: String) => st17StreamQualityGate(s, d)),
    "st18_stream_oov_gate" ->
      ((s: SparkSession, d: String) => st18StreamOovGate(s, d)),
    "st19_stream_anomaly_gate" ->
      ((s: SparkSession, d: String) => st19StreamAnomalyGate(s, d)))

  val oracles: Map[String, String] = baseOracles +
    // st24's oracle wraps the five gate oracle texts as CTEs (the
    // sim15/pl1 composition discipline) and joins their keep verdicts;
    // st17/st21 cover all docs, so the arrival join restricts them;
    // st18/st20/st22 are already arrival-scoped
    ("st24_stream_gauntlet" ->
      s"""WITH nf AS (SELECT ${Dedup.ArrivalOffsetSql} AS v FROM documents),
         |g1 AS (${baseOracles("st17_stream_quality_gate")}),
         |g2 AS (${baseOracles("st18_stream_oov_gate")}),
         |g3 AS (${baseOracles("st20_stream_surprisal_gate")}),
         |g4 AS (${baseOracles("st21_stream_pii_gate")}),
         |g5 AS (${baseOracles("st22_stream_decont_gate")})
         |SELECT d.doc_id,
         |  g1.keep AS quality_keep, g2.keep AS oov_keep,
         |  g3.keep AS surprisal_keep, g4.keep AS pii_keep,
         |  g5.keep AS decont_keep,
         |  (g1.keep AND g2.keep AND g3.keep AND g4.keep AND g5.keep)
         |    AS admitted
         |FROM (SELECT doc_id FROM documents
         |      WHERE doc_id >= (SELECT v FROM nf)) d
         |JOIN g1 ON g1.doc_id = d.doc_id
         |JOIN g2 ON g2.doc_id = d.doc_id
         |JOIN g3 ON g3.doc_id = d.doc_id
         |JOIN g4 ON g4.doc_id = d.doc_id
         |JOIN g5 ON g5.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin)

  private lazy val baseOracles: Map[String, String] = Map(
    // td26's training-and-encode chain (shared CTE builder) with the
    // training corpus restricted to the frozen history split and the
    // encode restricted to arrivals; word-free arrivals fail closed via
    // the LEFT join, threshold literal from the shared MaxBpeRatio
    "st25_stream_bpe_gate" -> {
      import graft.operators.TextAnalysis
      s"""WITH nf AS (SELECT ${Dedup.ArrivalOffsetSql} AS v FROM documents),
         |${TextAnalysis.bpeEncodeOracleSql(
             TextAnalysis.BpeDictSize, TextAnalysis.BpeMerges,
             "WHERE doc_id < (SELECT v FROM nf)",
             "WHERE doc_id >= (SELECT v FROM nf)")}
         |SELECT d.doc_id, CAST(coalesce(ag.nw, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(ag.nb, 0) AS BIGINT) AS n_bpe_tokens,
         |  CASE WHEN ag.nw IS NULL THEN false
         |       ELSE (CAST(ag.nb AS DOUBLE) / ag.nw) <= $MaxBpeRatio END
         |    AS keep,
         |  round((CAST(ag.nb AS DOUBLE) / ag.nw) * 1e6) / 1e6 AS bpe_ratio
         |FROM (SELECT doc_id FROM documents
         |      WHERE doc_id >= (SELECT v FROM nf)) d
         |LEFT JOIN ag ON d.doc_id = ag.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // dd13's position arithmetic verbatim (the bitset probe is
    // bit-for-bit the position-set membership: bit p is set iff p is in
    // the eval position set), arrivals split at the st16 boundary,
    // zero-shingle rows kept and failed closed via the LEFT join
    "st22_stream_decont_gate" -> {
      val posList = (0 until Dedup.BloomHashes).map(i =>
        s"('0x' || substring(md5('bloom$i:' || s), 1, 15))::BIGINT % ${Dedup.BloomBits}")
        .mkString("[", ", ", "]")
      s"""WITH nf AS (SELECT ${Dedup.ArrivalOffsetSql} AS v FROM documents),
         |t AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
         |sh AS (SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i+1:i+$DecontShingleN], ' ')
         |     FOR i IN range(len(toks)-${DecontShingleN - 1})]) AS shingles FROM t),
         |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |ep AS (SELECT DISTINCT p FROM
         |  (SELECT unnest($posList) AS p FROM ex
         |   WHERE doc_id < $DecontEvalDocs)),
         |tp AS (SELECT doc_id, s, unnest($posList) AS p FROM ex
         |  WHERE doc_id >= (SELECT v FROM nf)),
         |hits AS (SELECT doc_id, s, count(*) AS h
         |  FROM tp JOIN ep USING (p) GROUP BY 1, 2),
         |fl AS (SELECT doc_id, count(*) AS n_flagged FROM hits
         |  WHERE h = ${Dedup.BloomHashes} GROUP BY 1),
         |a AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh
         |  WHERE doc_id >= (SELECT v FROM nf))
         |SELECT a.doc_id, CAST(a.n_shingles AS BIGINT) AS n_shingles,
         |  CAST(coalesce(fl.n_flagged, 0) AS BIGINT) AS n_flagged,
         |  a.n_shingles > 0 AND coalesce(fl.n_flagged, 0) = 0 AS keep
         |FROM a LEFT JOIN fl ON a.doc_id = fl.doc_id
         |ORDER BY a.doc_id""".stripMargin
    },
    // td12's patterns and redaction order verbatim (shared constants),
    // with the conjunctive keep — the same counts-and-hashes contract
    "st21_stream_pii_gate" -> {
      import graft.operators.TextAnalysis.{EmailPattern, Ipv4Pattern, PhonePattern}
      s"""WITH r AS (SELECT doc_id,
         |  len(regexp_extract_all(text, '$EmailPattern')) AS n_emails,
         |  len(regexp_extract_all(text, '$Ipv4Pattern')) AS n_ipv4,
         |  len(regexp_extract_all(text, '$PhonePattern')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$EmailPattern', '<EMAIL>', 'g'),
         |    '$Ipv4Pattern', '<IP>', 'g'),
         |    '$PhonePattern', '<PHONE>', 'g')) AS redacted_fp
         |  FROM documents)
         |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
         |  CAST(n_ipv4 AS BIGINT) AS n_ipv4, CAST(n_phones AS BIGINT) AS n_phones,
         |  redacted_fp, n_emails = 0 AND n_ipv4 = 0 AND n_phones = 0 AS keep
         |FROM r ORDER BY doc_id""".stripMargin
    },
    // st27: the shared PHash CTE text (Multimodal.PhashSigCtesSql — the
    // byte-stream re-derivation, exact because phash60p's decode branch
    // is dead on prose) over history = the whole corpus, arrivals = the
    // last-50 split derived as one-byte-perturbed copies; band keys from
    // the shared simhashBandsSql literals; DISTINCT verified pairs.
    "st27_stream_phash_gate" -> {
      val off = graft.operators.Multimodal.PhashPerturbOffset
      s"""WITH nf AS (SELECT ${Dedup.ArrivalOffsetSql} AS v FROM documents),
         |corpus AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + $off,
         |    'Z' || substring(text, 2) FROM documents
         |    WHERE doc_id >= (SELECT v FROM nf)),
         |${graft.operators.Multimodal.PhashSigCtesSql},
         |bands(b, oi, oj) AS (VALUES ${Dedup.simhashBandsSql}),
         |bk AS MATERIALIZED (SELECT s.doc_id, s.sig,
         |    CAST(b.b AS BIGINT) * 16777216
         |      + ((s.sig >> b.oi) & 4095) * 4096
         |      + ((s.sig >> b.oj) & 4095) AS key
         |  FROM sig s CROSS JOIN bands b)
         |SELECT DISTINCT a.doc_id, h.doc_id AS hist_id,
         |  CAST(bit_count(xor(a.sig, h.sig)) AS BIGINT) AS hamming
         |FROM bk a JOIN bk h ON a.key = h.key
         |WHERE a.doc_id >= $off AND h.doc_id < $off
         |  AND bit_count(xor(a.sig, h.sig)) <= 3
         |ORDER BY a.doc_id, hist_id""".stripMargin
    },
    // dd4's signature chain on the full corpus, band keys split at the
    // dd11 batch boundary, the same equi-join — one row per collision.
    // The band index is i // rows (= Spark's posexplode pos); the key is
    // the band's minima list (content equality, same as the engine's
    // comma-joined string)
    "st16_stream_dedup_gate" ->
      s"""WITH t AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
         |nf AS (SELECT ${Dedup.ArrivalOffsetSql} AS v FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(toks[i+1:i+3], ' ') FOR i IN range(len(toks)-2)])) AS s
         |  FROM t WHERE len(toks) >= 3),
         |h AS (SELECT doc_id,
         |  ('0x' || substring(md5(s), 1, 13))::BIGINT % 2147483647 AS h FROM sh),
         |perm AS (SELECT i,
         |  ('0x' || substring(md5('mh-a:' || i), 1, 13))::BIGINT % 2147483646 + 1 AS a,
         |  ('0x' || substring(md5('mh-b:' || i), 1, 13))::BIGINT % 2147483647 AS b
         |  FROM range(32) r(i)),
         |sig AS (SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
         |  FROM h CROSS JOIN perm GROUP BY doc_id, i),
         |band AS (SELECT doc_id, i // 4 AS band, list(m ORDER BY i) AS key
         |  FROM sig GROUP BY doc_id, i // 4)
         |SELECT a.doc_id, hi.doc_id AS hist_id, a.band
         |FROM band a JOIN band hi ON a.band = hi.band AND a.key = hi.key
         |WHERE a.doc_id >= (SELECT v FROM nf) AND hi.doc_id < (SELECT v FROM nf)
         |ORDER BY a.doc_id, hist_id, a.band""".stripMargin,
    // the td6 rule set verbatim (same thresholds, same token spec), plus
    // the first-failed CASE chain — NULL flags (zero-token docs) skip
    // their WHEN in both engines' CASE semantics
    "st17_stream_quality_gate" -> {
      val stopSql = graft.operators.TextAnalysis.EnglishStop
        .map(s => s"'$s'").mkString("(", ", ", ")")
      val sym = graft.operators.TextAnalysis.SymClass
      s"""WITH t AS (SELECT doc_id, text, ${tokensSql("text")} AS toks FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  len(toks) BETWEEN 20 AND 1000 AS r_n_tokens,
         |  (length(regexp_replace(text, '$WsClass', '', 'g')) * 1.0 / nullif(len(toks), 0)) BETWEEN 3.0 AND 10.0 AS r_token_len,
         |  len(list_filter(toks, x -> x IN $stopSql)) >= 2 AS r_stopwords,
         |  (length(regexp_replace(text, '$sym', '', 'g')) * 1.0 / greatest(length(text), 1)) <= 0.1 AS r_symbols,
         |  (len(list_distinct(toks)) * 1.0 / nullif(len(toks), 0)) >= 0.3 AS r_distinct
         |FROM t)
         |SELECT doc_id, n_tokens,
         |  r_n_tokens AND r_token_len AND r_stopwords AND r_symbols AND r_distinct AS keep,
         |  CASE WHEN NOT r_n_tokens THEN 'r_n_tokens'
         |       WHEN NOT r_token_len THEN 'r_token_len'
         |       WHEN NOT r_stopwords THEN 'r_stopwords'
         |       WHEN NOT r_symbols THEN 'r_symbols'
         |       WHEN NOT r_distinct THEN 'r_distinct' END AS reject_rule
         |FROM r ORDER BY doc_id""".stripMargin
    },
    // the td19 vocabulary cut over the history split, replayed against
    // the arrivals; rate division and the <= 0.5 admission compare are
    // the same IEEE ops, NULL-rate arrivals fail closed in both engines
    // td21's LM/bin-length arithmetic over the frozen history, replayed
    // against the arrivals with the engine's CAPPED head: top-LmVocabSize
    // types keep their exact counts, every other token — pruned tail and
    // unseen alike — draws the pooled tail count floor(tailMass /
    // tailTypes); denominator N+D+1 stays exact over the FULL vocabulary.
    // Empty docs fail closed; all literals are generated from the shared
    // constants (MaxSurprisalBits, LmVocabSize)
    "st20_stream_surprisal_gate" ->
      s"""WITH nf AS (SELECT ${Dedup.ArrivalOffsetSql} AS v FROM documents),
         |ht AS (SELECT unnest(${tokensSql("text")}) AS tok FROM documents
         |  WHERE doc_id < (SELECT v FROM nf)),
         |lm AS (SELECT tok, count(*) AS c FROM ht GROUP BY tok),
         |hd AS (SELECT tok, c FROM (
         |    SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rn
         |    FROM lm)
         |  WHERE rn <= $LmVocabSize),
         |pool AS (SELECT CAST(t.mass + t.d + 1 AS BIGINT) AS denom,
         |    CAST(CASE WHEN t.d > $LmVocabSize
         |      THEN (t.mass - h.hmass) // (t.d - $LmVocabSize)
         |      ELSE 0 END AS BIGINT) AS ctail
         |  FROM (SELECT coalesce(sum(c), 0) AS mass, count(*) AS d FROM lm) t,
         |       (SELECT coalesce(sum(c), 0) AS hmass FROM hd) h),
         |a AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
         |  WHERE doc_id >= (SELECT v FROM nf)),
         |x AS (SELECT doc_id, unnest(toks) AS tok FROM a),
         |o AS (SELECT x.doc_id, count(*) AS n,
         |    CAST(sum(length(bin(denom // (coalesce(hd.c, ctail) + 1))) - 1)
         |      AS BIGINT) AS bits
         |  FROM x LEFT JOIN hd ON x.tok = hd.tok CROSS JOIN pool
         |  GROUP BY x.doc_id)
         |SELECT a.doc_id, CAST(coalesce(o.n, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(o.bits, 0) AS BIGINT) AS bits,
         |  CASE WHEN o.n IS NULL THEN false
         |       ELSE (CAST(o.bits AS DOUBLE) / o.n) <= $MaxSurprisalBits END
         |    AS keep,
         |  round((CAST(o.bits AS DOUBLE) / o.n) * 1e6) / 1e6 AS bits_per_token
         |FROM a LEFT JOIN o ON a.doc_id = o.doc_id
         |ORDER BY a.doc_id""".stripMargin,
    "st18_stream_oov_gate" ->
      s"""WITH nf AS (SELECT ${Dedup.ArrivalOffsetSql} AS vmax FROM documents),
         |ht AS (SELECT unnest(${tokensSql("text")}) AS tok FROM documents
         |  WHERE doc_id < (SELECT vmax FROM nf)),
         |v AS (SELECT tok FROM (
         |    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
         |    FROM ht GROUP BY tok)
         |  WHERE rn <= ${graft.operators.TextAnalysis.HeadVocabSize}),
         |a AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents
         |  WHERE doc_id >= (SELECT vmax FROM nf)),
         |x AS (SELECT doc_id, unnest(toks) AS tok FROM a),
         |o AS (SELECT x.doc_id, count(*) AS n,
         |    CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov
         |  FROM x LEFT JOIN v ON x.tok = v.tok GROUP BY x.doc_id)
         |SELECT a.doc_id, CAST(coalesce(o.n, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(o.oov, 0) AS BIGINT) AS n_oov,
         |  CASE WHEN o.n IS NULL THEN false
         |       ELSE (CAST(o.oov AS DOUBLE) / o.n) <= 0.5 END AS keep,
         |  round((CAST(o.oov AS DOUBLE) / o.n) * 1e6) / 1e6 AS oov_rate
         |FROM a LEFT JOIN o ON a.doc_id = o.doc_id
         |ORDER BY a.doc_id""".stripMargin,
    // q49's fence derivation over the strict history, replayed against
    // the last-day arrivals; the 3-MAD compare runs on unrounded
    // doubles; LEFT join + coalesce(..., true) mirrors the engine's
    // fail-closed rule for types with no history fence
    "st19_stream_anomaly_gate" -> EventStreams.onValidEventTime(
      """WITH c AS (SELECT date_trunc('day', max(ts)) AS cutoff FROM events),
        |h AS (SELECT event_type, value FROM events, c WHERE ts < cutoff),
        |m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM h GROUP BY 1),
        |f AS (SELECT h.event_type, max(m.med) AS med,
        |    quantile_cont(abs(h.value - m.med), 0.5) AS mad
        |  FROM h JOIN m USING (event_type) GROUP BY 1),
        |a AS (SELECT event_id, event_type, value FROM events, c
        |  WHERE ts >= cutoff)
        |SELECT a.event_id, a.event_type, a.value,
        |  round(f.med * 1e6) / 1e6 AS med_value,
        |  round(f.mad * 1e6) / 1e6 AS mad_value,
        |  coalesce(abs(a.value - f.med) > 3.0 * f.mad, true) AS is_outlier
        |FROM a LEFT JOIN f USING (event_type)
        |ORDER BY a.event_id""".stripMargin))
}
