package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions._
import graft.sources.Tables

/** The dashboard-interaction surface (SURVEY.md §2.4/§2.9, app.py:82–148):
  * parameterized date-range / hour-range / membership filters over a
  * CACHED base table, plus the seeded-sample test-mode knob and the CSV
  * dimension variant.
  *
  * Scale posture: the cache is the Spark twin of `@st.cache_data`
  * (app.py:82) — the base table is persisted once per scale dir, so every
  * widget interaction re-filters memory-resident data instead of
  * rescanning raw parquet. The filters themselves are plain conjunctive
  * predicates: on an UNcached scan they push down to the parquet reader
  * (and at 100 TB, a date-partitioned clean table turns F1 into partition
  * pruning, SURVEY.md §7.4).
  */
object Params {

  /** Sidebar parameter bundle (app.py:129–148). The upper date bound is the
    * midnight INSTANT of the end date, inclusive of exactly that instant —
    * the reference's quirk (app.py:143–144), reproduced literally by
    * `between`'s closed interval.
    */
  final case class EventParams(
      tsLo: String, tsHi: String,
      hourLo: Int, hourHi: Int,
      types: Seq[String])

  val defaultParams: EventParams = EventParams(
    "2024-01-05 00:00:00", "2024-01-20 00:00:00", 6, 18,
    Seq("view", "click", "purchase"))

  /** A second, deliberately different widget state (pf2): proves the
    * filter surface is genuinely parameterized — same operator body,
    * different bounds, its own oracle generated from the SAME source of
    * truth ([[oracleSqlFor]]).
    */
  val altParams: EventParams = EventParams(
    "2024-01-10 00:00:00", "2024-01-28 00:00:00", 0, 8,
    Seq("purchase", "signup", "error"))

  // --------------------------------------------------------------- cache

  // Keyed per session so one session's persisted frames are never handed
  // to another. STRONG references, deliberately: a cached Dataset itself
  // strongly reaches its SparkSession, so a weak-keyed map could never
  // actually collect an entry (the value would keep the key alive) — the
  // map is honestly documented as bounded by process lifetime × live
  // sessions, which is small here (each main builds exactly one session;
  // the test suite shares one fixture).
  private val cache = new java.util.concurrent.ConcurrentHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, DataFrame]]()

  /** S7 — the persisted base table (one per scale dir, MEMORY_AND_DISK so
    * an executor-memory shortfall spills instead of OOMing). If something
    * unpersisted the memoized frame behind our back (`spark.catalog
    * .clearCache()` — Bench runs it between queries), re-persist instead of
    * silently returning an uncached frame and losing the S7 contract.
    */
  def cachedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val df = cache
      .computeIfAbsent(spark, _ => scala.collection.concurrent.TrieMap.empty)
      .getOrElseUpdate(
        sfDir, Tables.events(spark, sfDir).persist(StorageLevel.MEMORY_AND_DISK))
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }

  // ------------------------------------------------------------- filters

  /** F1 ∧ F2 ∧ F3 as one conjunctive predicate. */
  def paramPredicate(p: EventParams): Column =
    col("ts").between(lit(p.tsLo).cast("timestamp"), lit(p.tsHi).cast("timestamp")) &&
      hour(col("ts")).between(p.hourLo, p.hourHi) &&
      col("event_type").isin(p.types: _*)

  def paramFilter(events: DataFrame, p: EventParams): DataFrame =
    events.filter(paramPredicate(p))

  /** The dashboard-refresh feed for one widget state: filter, then the
    * per-type summary. Bounded output (one row per selected type).
    */
  def typeSummary(events: DataFrame, p: EventParams): DataFrame =
    paramFilter(events, p)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
      .orderBy(col("event_type"))

  /** pf1 — the dashboard refresh: filter the cached base with the default
    * widget parameters, aggregate the feed.
    */
  def pf1ParamFilter(spark: SparkSession, sfDir: String): DataFrame =
    typeSummary(cachedEvents(spark, sfDir), defaultParams)

  /** pf2 — the same surface with NON-default parameters over the UNcached
    * scan: the predicates push down to the parquet reader (the cold-start
    * path of the parameterized server; at 100 TB over a date-partitioned
    * clean table F1 becomes partition pruning — pf3 below IS that path).
    */
  def pf2ParamFilterAlt(spark: SparkSession, sfDir: String): DataFrame =
    typeSummary(Tables.events(spark, sfDir), altParams)

  /** pf3 — the dashboard refresh served from the MATERIALIZED clean table
    * (the reference's write-clean-then-re-read pattern, app.py:97): the
    * date-partitioned staging [[CleanStore.events]] plus an explicit
    * partition predicate derived from the F1 bounds, so the refresh scan
    * reads ONLY the selected dates' files (PartitionFilters — audited in
    * PlanSpec), with the precise ts/hour/type predicates evaluated on that
    * pruned remainder. This is the 100 TB dashboard path: F1 as partition
    * pruning instead of a raw-corpus scan.
    */
  def pf3ParamFilterClean(spark: SparkSession, sfDir: String): DataFrame = {
    val clean = CleanStore.events(spark, sfDir)
    val p = defaultParams
    // the partition-pruning twin of F1: ts ∈ [tsLo, tsHi] ⇒ event_date ∈
    // [date(tsLo), date(tsHi)] — a static predicate on the partition column
    val pruned = clean.filter(col("event_date").between(
      to_date(lit(p.tsLo).cast("timestamp")), to_date(lit(p.tsHi).cast("timestamp"))))
    typeSummary(pruned, p)
  }

  /** pf4 — pf3's refresh served through the MANIFEST-POINTER store
    * ([[CleanStore.eventsManifest]]): identical clean content and the
    * same partition-pruned scan, but the staging is pointer-swap
    * snapshots — the transactional-table posture of ARTIFACTS.md rules
    * 5–6. Readers never take the staging lock and never hit the
    * refresh-abort window the in-place store carries
    * (ManifestStoreSpec's soak proves zero aborts under publish).
    * Same oracle as pf3: the serving layer must be invisible to the
    * result.
    */
  def pf4ParamFilterManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val clean = CleanStore.eventsManifest(spark, sfDir)
    val p = defaultParams
    val pruned = clean.filter(col("event_date").between(
      to_date(lit(p.tsLo).cast("timestamp")), to_date(lit(p.tsHi).cast("timestamp"))))
    typeSummary(pruned, p)
  }

  /** pf5's user-range widget bounds — one source of truth for the engine
    * predicate AND the generated oracle literal (the HeadVocabSize
    * pattern). Sized to be nonempty at every
    * staged sf (user_id tops out at ~15·(sf/0.001), so the range must sit
    * inside the smallest fixture's domain) while selecting a small user
    * minority at bench scale (7 of 1500 users at sf0.1).
    */
  val Pf5UserLo = 3L
  val Pf5UserHi = 9L

  /** pf5 — a (user ∧ time)-predicated refresh served from the Z-ORDERED
    * clean store ([[CleanStore.eventsZOrdered]]). pf3/pf4's date layout
    * answers F1 with partition pruning but reads every selected date's
    * files FULLY no matter how selective the user predicate is — a
    * single-dimension sort bounds one axis and leaves the other spanning
    * the domain (the q54 scaladoc's claim). The z-ordered layout clusters
    * on the Morton interleave of (user, hour), so BOTH predicates become
    * tight file/row-group min-max bounds and the scan skips everything
    * outside the (user × time) box — PlanSpec's audit compares rows read
    * by the two layouts under this exact predicate. Same aggregate, same
    * clean content, oracle = pf3's text plus the user range: the layout
    * must be invisible to the result.
    */
  def pf5ZOrderServe(spark: SparkSession, sfDir: String): DataFrame = {
    val z = CleanStore.eventsZOrdered(spark, sfDir)
    typeSummary(
      z.filter(col("user_id").between(Pf5UserLo, Pf5UserHi)), defaultParams)
  }

  /** The SQL twin of [[typeSummary]] for arbitrary parameters — one
    * source of truth for pf1/pf2's DuckDB oracles AND the ParamsSpec
    * Spark-SQL twin (the text is valid in both engines; the avg goes
    * through DECIMAL(38,6) + the shared r6 rounding form so results are
    * bit-comparable).
    */
  /** Single-quote SQL string literal with `''` escaping — the one escape
    * valid in BOTH Spark SQL and DuckDB. The Pipeline `--params` flag feeds
    * user strings straight into [[oracleSqlFor]]; without this a type (or
    * timestamp) containing a quote produces broken or injected SQL.
    */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  def oracleSqlFor(p: EventParams, extraWhere: Seq[String] = Nil): String =
    s"""SELECT event_type, count(*) AS n,
       |round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) * 1e6) / 1e6 AS avg_value
       |FROM events
       |WHERE ts BETWEEN TIMESTAMP ${sqlLit(p.tsLo)} AND TIMESTAMP ${sqlLit(p.tsHi)}
       |  AND hour(ts) BETWEEN ${p.hourLo} AND ${p.hourHi}
       |  AND event_type IN (${p.types.map(sqlLit).mkString(", ")})
       |${extraWhere.map(w => s"  AND $w").mkString("\n")}
       |GROUP BY event_type ORDER BY event_type""".stripMargin
      .replaceAll("(?m)^\\s*$\\n", "")

  // ------------------------------------------------------------- sample

  /** SA1 — deterministic exact-n sample (app.py:99 `sample(n=100000,
    * random_state=42)`). `orderBy(rand(seed), tiebreak).limit(n)` plans as
    * TakeOrderedAndProject: per-partition top-n heaps, one tiny shuffle of
    * n rows per partition — no global sort, scales with the scan. Row
    * identity is engine-RNG-dependent by nature (pandas RNG ≠ Spark RNG),
    * so this is a rows-only check: no oracle can exist (SURVEY.md §7.4).
    */
  def seededSample(df: DataFrame, n: Int, seed: Long, tiebreak: Seq[String]): DataFrame =
    df.orderBy(rand(seed) +: tiebreak.map(col): _*).limit(n)

  def sa1SeededSample(spark: SparkSession, sfDir: String): DataFrame =
    seededSample(Tables.lineitem(spark, sfDir), 1000, 42L,
      Seq("l_orderkey", "l_linenumber"))

  /** SA2 — stratified seeded sample: per-stratum Bernoulli fractions via
    * `sampleBy` — the "rebalance the language mix" training-data op
    * (downsample the dominant language, keep the long tail). One map-only
    * pass over the scan: each row draws against its stratum's fraction
    * under the seed — no shuffle, no collect, composes with the quality
    * filter in the same stage at 100 TB. The fraction map is an explicit
    * ALLOWLIST: a stratum absent from it samples at 0 and is dropped —
    * deliberate for a training mix (every admitted language is a decision,
    * and an unexpected new lang value must not silently flow through at
    * full weight), and ParamsSpec pins the corpus lang set against the
    * map's keys so a corpus change surfaces as a test failure, not a
    * silent drop. Row identity is engine-RNG-bound like SA1 ⇒ rows-only
    * gate; seed-determinism and per-stratum proportions are asserted in
    * ParamsSpec.
    */
  val sa2Fractions: Map[String, Double] =
    Map("en" -> 0.25, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 0.5)

  def sa2StratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .stat.sampleBy("lang", sa2Fractions, 42L)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** sa8 — DETERMINISTIC stratified sample: sa2's per-stratum fraction
    * allowlist served by sa4's salted-md5 uniform draw instead of the
    * engine RNG, which makes the sampled ROW SET itself oracle-HASHABLE
    * (sa2's row identity is engine-RNG-bound and can only ever be
    * rows-only gated; it is retained as the native-API twin). Each doc
    * draws u = md5-uniform("graft-strat-v1:lang:doc_id") and survives iff
    * u < fraction(lang); a stratum absent from the map samples at 0 —
    * sa2's allowlist posture. The draw keys on (lang, doc_id) so
    * reassigning a doc's stratum redraws it. Map-only, no shuffle;
    * re-runs, incremental subsets and other engines agree row-for-row.
    */
  def sa8StratifiedHashSample(
      docs: DataFrame, salt: String = "graft-strat-v1"): DataFrame = {
    val frac = sa2Fractions.foldLeft(lit(0.0)) { case (acc, (l, f)) =>
      when(col("lang") === l, lit(f)).otherwise(acc)
    }
    val u = saltedUniform(salt, concat_ws(":", col("lang"), col("doc_id")))
    docs
      .filter(u < frac)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  def sa8StratifiedHashSampleQ(spark: SparkSession, sfDir: String): DataFrame =
    sa8StratifiedHashSample(Tables.documents(spark, sfDir))

  /** SA3 — deterministic train/val/test split by STABLE hashing: each doc
    * lands in a bucket 0–99 via md5 of a salted key, and the bucket maps
    * to a split by fixed cut points. Unlike the RNG samples (sa1/sa2)
    * this is pure deterministic arithmetic — the assignment is a property
    * of the key, so re-runs, incremental batches (dd11's daily ingest)
    * and other engines all agree: eval contamination by reshuffled
    * splits is structurally impossible. Exactly oracle-hashable: md5 and
    * the hex-prefix→integer bucket are engine-portable (15 hex chars
    * < 2^60 — no overflow either side). Map-only, codegen'd, no shuffle.
    * Keyed by doc_id here (the stable ingest id); a content-keyed split
    * is the same expression over `text`.
    */
  def sa3HashSplit(
      docs: DataFrame, trainPct: Int = 90, valPct: Int = 5,
      salt: String = "graft-split-v1"): DataFrame = {
    val bucket = conv(
      substring(md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))), 1, 15),
      16, 10).cast("long") % 100
    docs
      .select(col("doc_id"), bucket.as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  def sa3HashSplitQ(spark: SparkSession, sfDir: String): DataFrame =
    sa3HashSplit(Tables.documents(spark, sfDir))

  /** SA4 — WEIGHTED sampling (importance sampling ∝ token count, the
    * "sample long documents proportionally more" mix op) made fully
    * DETERMINISTIC and therefore oracle-hashable — the property sa1/sa2
    * cannot have: instead of an engine RNG, each doc's uniform draw is a
    * salted md5 hash mapped to [0,1) (13 hex chars = 52 bits, exact in a
    * double), and the doc is kept iff `u < min(1, targetN·w/ΣW)`. The
    * expected sample size is targetN (docs whose clipped probability
    * saturates at 1 contribute deterministically); re-runs, subsets and
    * other engines agree row-for-row because the draw is a property of
    * the (salt, doc_id) key — the same structural-stability argument as
    * sa3's split.
    *
    * Scale: one pass computes weights; ΣW is a 1-row aggregate broadcast
    * back; the draw-and-keep is map-only. Nothing shuffles. Weights here
    * are token counts; any non-negative score column (novelty, quality)
    * drops in unchanged.
    */
  def sa4WeightedSample(
      docs: DataFrame, targetN: Int = 150,
      salt: String = "graft-wsample-v1"): DataFrame = {
    val weighted = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("w"))
    val tot = weighted.agg(sum(col("w")).as("tot_w"))
    val u = saltedUniform(salt, col("doc_id"))
    val p = least(lit(1.0),
      lit(targetN.toDouble) * col("w").cast("double") / col("tot_w").cast("double"))
    weighted.crossJoin(broadcast(tot))
      .withColumn("u", u)
      .withColumn("p", p)
      .filter(col("u") < col("p"))
      .select(col("doc_id"), col("w"), r6(col("p")).as("p_inc"))
      .orderBy(col("doc_id"))
  }

  def sa4WeightedSampleQ(spark: SparkSession, sfDir: String): DataFrame =
    sa4WeightedSample(Tables.documents(spark, sfDir))

  /** sa5 — TEMPERATURE-rebalanced mixture sampling over a skewed domain
    * (language): each domain's target share is ∝ n^α with α = 1/2, the
    * multilingual-corpus rebalancing move (a flat α=1 keeps the head
    * language dominant; α=0 is uniform) — rare languages are kept at a
    * HIGHER rate than common ones, and the whole draw stays fully
    * deterministic and therefore oracle-HASHABLE: the per-domain rate is
    * derived arithmetic (α = 1/2 is spelled as `sqrt`, which is
    * correctly rounded everywhere — a general `pow` is not), the weight
    * sum crosses domains as an exact DECIMAL(38,6), and the per-doc
    * uniform draw is sa4's salted-md5 → [0,1) mapping. Plan shape: one
    * domain-count aggregate (5 rows) broadcast back; the corpus pass is
    * map-only.
    */
  def sa5MixtureSample(
      docs: DataFrame, targetN: Int = 250,
      salt: String = "graft-mixture-v1"): DataFrame = {
    val byLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    val sw = byLang.agg(
      sum(sqrt(col("nl")).cast("decimal(38,6)")).as("sw"))
    val rates = byLang.crossJoin(broadcast(sw))
      .select(col("lang"),
        least(lit(1.0),
          lit(targetN.toDouble) * sqrt(col("nl"))
            / col("sw").cast("double") / col("nl")).as("rate"))
    val u = saltedUniform(salt, col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(rates), Seq("lang"))
      .withColumn("u", u)
      .filter(col("u") < col("rate"))
      .select(col("doc_id"), col("lang"), r6(col("rate")).as("p_inc"))
      .orderBy(col("doc_id"))
  }

  def sa5MixtureSampleQ(spark: SparkSession, sfDir: String): DataFrame =
    sa5MixtureSample(Tables.documents(spark, sfDir))

  /** sa6 — token-budget SHARDING (sequence packing for training
    * dataloaders): documents in stable doc_id order are packed into
    * consecutive shards of ~`budgetTokens` each — shard = exclusive
    * running token total ÷ budget. The naive formulation is a GLOBAL
    * cumsum: one unpartitioned window = every row through a single
    * partition, the canonical scale-killer. This plan is the distributed
    * two-phase prefix sum instead: (1) per-range-bucket partial sums —
    * the only data-scaled aggregation, map-side combined; (2) an
    * exclusive running offset over the BUCKET sums (a bounded-cardinality
    * window: 64 rows here, thousands at 100 TB — never data-scaled);
    * (3) an intra-bucket exclusive cumsum partitioned BY bucket, plus
    * the broadcast offset. Identical result to the global cumsum (the
    * oracle IS the naive global formulation), audited in PlanSpec: no
    * unpartitioned window ever sees fact rows.
    */
  def sa6TokenShards(
      docs: DataFrame, budgetTokens: Long = 20000L, buckets: Int = 64): DataFrame = {
    val w = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("w"))
    val span = w.agg((floor(max(col("doc_id")) / buckets) + 1).cast("long").as("span"))
    val bucketed = w.crossJoin(broadcast(span))
      .withColumn("b", expr("doc_id div span"))
    val offsets = bucketed.groupBy(col("b")).agg(sum(col("w")).as("bw"))
      .withColumn("off",
        coalesce(sum(col("bw")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("b"), col("off"))
    val intra = Window.partitionBy(col("b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("b"))
      .withColumn("excl", col("off") + coalesce(sum(col("w")).over(intra), lit(0L)))
      .select(col("doc_id"), col("w"),
        expr(s"excl div $budgetTokens").as("shard_id"))
      .orderBy(col("doc_id"))
  }

  def sa6TokenShardsQ(spark: SparkSession, sfDir: String): DataFrame =
    sa6TokenShards(Tables.documents(spark, sfDir))

  /** sa11 shared constants — single source for the engine defaults AND
    * the generated oracle literals (the HeadVocabSize pattern).
    */
  val EpochCount: Int = 2
  val EpochSalt: String = "graft-epoch-v1"

  /** sa11 — deterministic PER-EPOCH shuffle order: for each training
    * epoch, a full permutation rank of the corpus drawn from the salted
    * md5 of (epoch, doc_id) — the reproducible data-ordering contract
    * every serious LLM training run needs (loss curves are only
    * comparable across reruns/restarts if epoch e presents the data in
    * the SAME order every time; a framework RNG shuffle is neither
    * resumable nor engine-portable). Different epochs get independent
    * permutations (the salt concatenates the epoch), and the rank is a
    * property of the keys: re-runs, engines and cluster layouts agree
    * row-for-row.
    *
    * The naive formulation is one unpartitioned-per-epoch window over
    * the corpus — a single-partition sort at scale; shipped instead as
    * the sa6/q41 DISTRIBUTED TWO-PHASE RANK: the uniform draw is
    * range-bucketed (`floor(u·B)` — exact, u has 52 bits and B is a
    * power of two), per-(epoch, bucket) counts roll into an exclusive
    * offset over the BOUNDED (epochs × B) frame, and the final rank is
    * offset + intra-bucket row_number partitioned by (epoch, bucket) —
    * bit-identical to the naive global rank, which IS the oracle. One
    * epoch-exploded scan, one (epoch, bucket) shuffle, no global sort.
    */
  def sa11EpochOrder(
      docs: DataFrame, epochs: Int = EpochCount, buckets: Int = 64): DataFrame = {
    val drawn = docs
      .select(col("doc_id"),
        explode(sequence(lit(0L), lit(epochs - 1L))).as("epoch"))
      .withColumn("u", saltedUniform(EpochSalt,
        concat(col("epoch").cast("string"), lit(":"), col("doc_id").cast("string"))))
      .withColumn("b", floor(col("u") * buckets).cast("long"))
    val offsets = drawn.groupBy(col("epoch"), col("b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(
          Window.partitionBy(col("epoch")).orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("epoch"), col("b"), col("off"))
    val intra = Window.partitionBy(col("epoch"), col("b"))
      .orderBy(col("u"), col("doc_id"))
    drawn.join(broadcast(offsets), Seq("epoch", "b"))
      .withColumn("shuffle_rank",
        col("off") + row_number().over(intra).cast("long"))
      .select(col("epoch"), col("doc_id"), col("shuffle_rank"))
      .orderBy(col("epoch"), col("doc_id"))
  }

  def sa11EpochOrderQ(spark: SparkSession, sfDir: String): DataFrame =
    sa11EpochOrder(Tables.documents(spark, sfDir))

  /** sa12 shared constants — single source for the engine defaults AND
    * the generated oracle literals (the HeadVocabSize pattern).
    */
  val GroupSplitHoldoutPct: Int = 20
  val GroupSplitSalt: String = "graft-groupsplit-v1"

  /** sa12 — LEAKAGE-SAFE train/holdout split: sa3's hash-bucket split
    * moved from the DOCUMENT grain to the DEDUP-CLUSTER grain. A
    * per-doc hash split routes members of the same near-duplicate
    * family to BOTH sides — the held-out half then "evaluates" on
    * near-copies of training documents, and the measured loss is
    * memorization, not generalization (the classic leakage bug every
    * serious LLM eval post-mortem finds). Here the split key is the
    * doc's dd8 cluster representative (its own id when unclustered), so
    * an entire near-dup family lands on ONE side by construction — the
    * invariant is structural, not statistical.
    *
    * Composition: labels come from the PERSISTED dd8 artifact
    * ([[Dedup.clusterLabels]] — build-once, spec-stamped), so the split
    * costs one join against a label table that is small relative to the
    * corpus (it holds only clustered docs); AQE broadcasts it when the
    * dup fraction allows and shuffle-joins on doc_id otherwise — both
    * sides already key on doc_id, no extra repartition. The bucket
    * arithmetic is sa3's exact integer md5 % 100 on the GROUP id, so
    * membership is deterministic across engines, re-runs and layouts.
    */
  def sa12LeakageSafeSplit(
      docs: DataFrame, labels: DataFrame,
      holdoutPct: Int = GroupSplitHoldoutPct,
      salt: String = GroupSplitSalt): DataFrame = {
    val grouped = docs.select(col("doc_id"))
      .join(labels.select(col("doc_id"), col("rep_id")), Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("rep_id"), col("doc_id")))
    val bucket = conv(
      substring(md5(concat(lit(s"$salt:"), col("group_id").cast("string"))),
        1, 15), 16, 10).cast("long") % 100
    grouped
      .select(col("doc_id"), col("group_id"), bucket.as("bucket"))
      .select(col("doc_id"), col("group_id"), col("bucket"),
        when(col("bucket") < holdoutPct, "holdout").otherwise("train")
          .as("split"))
      .orderBy(col("doc_id"))
  }

  def sa12LeakageSafeSplitQ(spark: SparkSession, sfDir: String): DataFrame =
    sa12LeakageSafeSplit(Tables.documents(spark, sfDir),
      Dedup.clusterLabels(spark, sfDir))

  /** sa13 shared constants — single source for the engine defaults AND
    * the generated oracle literals (the sa9OracleSql pattern). The global
    * budget is ~half the sf0.01 per-source token mass, so the fill gate
    * bites mid-source at every staged scale factor.
    */
  val Sa13Budget: Long = 14000L
  val Sa13IdBuckets: Int = 64

  /** sa13 — BUDGETED EPOCH ASSEMBLY: the manifest a pretraining run
    * builds when it has a global token budget and a target source
    * mixture — "fill each source's share with its BEST documents first".
    * Three published ideas composed: the per-source share is sa5's
    * temperature rebalance (∝ √n, exact-DECIMAL share sum, floored to an
    * integer token budget per source), the ranking key is td1's bounded
    * quality score (quality-descending fill — the curriculum/data-budget
    * move), and admission is "take documents while the EXCLUSIVE
    * running token total is under the source's budget" (the first doc
    * crossing the line is still admitted — whole-document semantics, sa9's
    * posture: a training document is never split by the budget). Every
    * doc comes back with its fill position and verdict (V9's accounting
    * posture: the artifact explains every admit/reject).
    *
    * Scale: the NAIVE formulation is a per-source quality-ordered
    * cumsum — a window whose partitions are corpus/|sources|, i.e. a
    * handful of near-global sorts at 100 TB. This plan is a THREE-LEVEL
    * distributed prefix sum whose every window partition is bounded
    * INDEPENDENTLY of the quality distribution (a coarse quality-bucket
    * key alone is not: a template-spam source concentrates its whole
    * mass in one r6 value, i.e. one bucket — the naive sort back again).
    * The partition keys compose the EXACT r6 quality value `qr` with
    * sa6's distribution-independent doc_id span `sp`:
    * (1) per-(source, qr, sp) token sums — the only data-scaled
    * aggregation, map-side combined; (2) the exclusive
    * higher-quality offset, a window over the per-(source, qr) sums —
    * grid-bounded (one row per DISTINCT r6 value, ≤ 1e6+1 by the grid,
    * never by the data); (3) the exclusive lower-span offset WITHIN one
    * quality value — ≤ [[Sa13IdBuckets]] rows per partition; (4) the
    * intra cumsum partitioned by (source, qr, sp) and ordered by doc_id
    * alone (qr is constant inside the partition, and sp is monotone in
    * doc_id, so span boundaries can never contradict the
    * (quality desc, doc_id) ranking) — partition mass ≤ one doc_id
    * span, a bound NO quality distribution can move. Identical output
    * to the naive window — the oracle IS the naive formulation. Budgets
    * broadcast; the offset grid joins on exactly the intra window's
    * partition keys, so its exchange is the one the window needs anyway.
    */
  def sa13BudgetEpoch(
      docs: DataFrame, budget: Long = Sa13Budget): DataFrame = {
    val toks = tokens(col("text"))
    // ranking key: NULL quality (zero-token docs) coalesces to 0.0 so the
    // order is total and engine-portable (NULL-order defaults differ);
    // the REPORTED q keeps the NULL (td1's contract)
    val base = docs.select(col("doc_id"), col("source"),
        size(toks).cast("long").as("w"),
        TextAnalysis.qualityScore(toks).as("q"))
      .withColumn("qr", coalesce(col("q"), lit(0.0)))
    // per-source √n-share budgets: sa5's rebalance arithmetic, floored to
    // an exact integer token budget (bounded: one row per source)
    val ns = base.groupBy(col("source")).agg(count(lit(1)).as("nl"))
    val sw = ns.agg(sum(sqrt(col("nl")).cast("decimal(38,6)")).as("sw"))
    val budgets = ns.crossJoin(broadcast(sw))
      .select(col("source"),
        floor(lit(budget.toDouble) * sqrt(col("nl"))
          / col("sw").cast("double")).cast("long").as("src_budget"))
    // sa6's distribution-independent sub-key: doc_ids are unique, so a
    // span holds at most (max_id / Sa13IdBuckets + 1) docs no matter
    // where the quality mass sits
    val span = base.agg((floor(max(col("doc_id")) / Sa13IdBuckets) + 1)
      .cast("long").as("span"))
    val keyed = base.crossJoin(broadcast(span))
      .withColumn("sp", expr("doc_id div span"))
    // (1) per-(source, qr, sp) token sums — the only data-scaled
    // aggregation, map-side combined
    val g = keyed.groupBy(col("source"), col("qr"), col("sp"))
      .agg(sum(col("w")).as("gw"))
    // (2) exclusive offset of the strictly-higher quality values: a
    // window over the per-(source, qr) sums — one row per DISTINCT r6
    // value, bounded by the grid, never by the data
    val qrW = Window.partitionBy(col("source")).orderBy(col("qr").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val qrOff = g.groupBy(col("source"), col("qr"))
      .agg(sum(col("gw")).as("qw"))
      .withColumn("qr_off", coalesce(sum(col("qw")).over(qrW), lit(0L)))
      .select(col("source"), col("qr"), col("qr_off"))
    // (3) exclusive offset of the lower doc_id spans inside one quality
    // value — ≤ Sa13IdBuckets rows per partition
    val spW = Window.partitionBy(col("source"), col("qr")).orderBy(col("sp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = g
      .withColumn("sp_off", coalesce(sum(col("gw")).over(spW), lit(0L)))
      .join(qrOff, Seq("source", "qr"))
      .select(col("source"), col("qr"), col("sp"),
        (col("qr_off") + col("sp_off")).as("off"))
    // (4) intra cumsum: qr is constant inside the partition and sp is
    // monotone in doc_id, so doc_id alone completes the
    // (quality desc, doc_id) ranking; partition mass ≤ one doc_id span.
    // The join keys ARE the window partition keys — one shared exchange.
    val intra = Window.partitionBy(col("source"), col("qr"), col("sp"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(offsets, Seq("source", "qr", "sp"))
      .join(broadcast(budgets), Seq("source"))
      .withColumn("excl", col("off") + coalesce(sum(col("w")).over(intra), lit(0L)))
      .select(col("doc_id"), col("source"), col("w"), col("q"),
        col("excl").as("tokens_before"), col("src_budget"),
        (col("excl") < col("src_budget")).as("admitted"))
      .orderBy(col("doc_id"))
  }

  def sa13BudgetEpochQ(spark: SparkSession, sfDir: String): DataFrame =
    sa13BudgetEpoch(Tables.documents(spark, sfDir))

  /** sa13's oracle: the NAIVE per-source quality-ordered exclusive cumsum
    * — the distributed two-phase plan must reproduce it row-for-row. The
    * quality pieces are TextAnalysis's generated twins (single source),
    * the share arithmetic is sa5's spelling (√ then DECIMAL(38,6) sum,
    * multiply-then-divide in the same operation order). `from`
    * parameterizes the corpus relation so pl2 can run the identical fill
    * text over the gauntlet-admitted CTE.
    */
  private[graft] def sa13OracleSql(
      budget: Long = Sa13Budget, from: String = "documents"): String =
    s"""WITH t AS (SELECT doc_id, source, ${tokensSql("text")} AS toks
       |           FROM $from),
       |q AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS w,
       |        ${TextAnalysis.qualityScoreSql(
                   "len(toks)", TextAnalysis.stopCountSql("toks"))} AS q
       |      FROM t),
       |ns AS (SELECT source, count(*) AS nl FROM q GROUP BY source),
       |sw AS (SELECT SUM(CAST(sqrt(nl) AS DECIMAL(38,6))) AS sw FROM ns),
       |bud AS (SELECT source,
       |          CAST(floor($budget.0 * sqrt(nl) / CAST(sw AS DOUBLE))
       |            AS BIGINT) AS src_budget
       |        FROM ns, sw),
       |c AS (SELECT doc_id, source, w, q,
       |        coalesce(SUM(w) OVER (PARTITION BY source
       |          ORDER BY coalesce(q, 0.0) DESC, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS tokens_before
       |      FROM q)
       |SELECT c.doc_id, c.source, c.w, c.q,
       |  CAST(c.tokens_before AS BIGINT) AS tokens_before, b.src_budget,
       |  c.tokens_before < b.src_budget AS admitted
       |FROM c JOIN bud b USING (source) ORDER BY doc_id""".stripMargin


  /** sa14 — CURRICULUM MIXTURE SCHEDULE: the per-epoch, per-source
    * token-budget table a multi-epoch pretraining run consumes when its
    * source mix ANNEALS from natural sampling toward a rebalanced mix
    * (temperature-based sampling, Arivazhagan et al. 2019; the XLM-R
    * recipe) — epoch 0 weights sources by n (natural), the final epoch
    * by √n (sa5's rebalance), the middle epoch by n^(3/4). Each epoch
    * spends the same global token budget; only the mix moves. Beside
    * the budget, every row reports the source's AVAILABLE token mass
    * and the granted/shortfall split — the "small source can't fill
    * its share" fact an epoch planner must surface (whole-document
    * admission against these budgets is sa13's fill, per epoch — the
    * pl2 composition).
    *
    * Exactness (the reason the schedule is {1, 3/4, 1/2} and not a
    * free temperature knob): IEEE-754 requires sqrt CORRECTLY ROUNDED,
    * so sqrt(n), sqrt(sqrt(n)) and their product are bit-identical in
    * both engines, while pow(n, 0.75) is NOT correctly rounded and may
    * differ by an ULP between libm implementations — n^(3/4) is
    * therefore spelled sqrt(n)·sqrt(sqrt(n)) in BOTH texts. Share
    * arithmetic is sa5's spelling (raw-double numerator, DECIMAL(38,6)
    * weight sum, floor to an integer budget).
    *
    * Scale: one map-side-combined pass over the corpus (per-source doc
    * and token counts); everything after is |sources|×3 rows.
    */
  def sa14CurriculumBudgets(
      docs: DataFrame, budget: Long = Sa13Budget): DataFrame = {
    val toks = tokens(col("text"))
    val base = docs.select(col("source"), size(toks).cast("long").as("w"))
    val ns = base.groupBy(col("source"))
      .agg(count(lit(1)).as("nl"), sum(col("w")).as("avail"))
    val epochs = Seq(
      (0, col("nl").cast("double")),
      (1, sqrt(col("nl")) * sqrt(sqrt(col("nl")))),
      (2, sqrt(col("nl"))))
    val w = epochs.map { case (e, wt) =>
      ns.select(lit(e).as("epoch"), col("source"), col("nl"),
        col("avail"), wt.as("wt"))
    }.reduce(_.unionAll(_))
    val sw = w.groupBy(col("epoch"))
      .agg(sum(col("wt").cast("decimal(38,6)")).as("sw"))
    w.join(broadcast(sw), Seq("epoch"))
      .select(col("epoch"), col("source"),
        col("nl").cast("long").as("n_docs"),
        col("avail").cast("long").as("available_tokens"),
        floor(lit(budget.toDouble) * col("wt") / col("sw").cast("double"))
          .cast("long").as("src_budget"))
      .withColumn("granted",
        least(col("src_budget"), col("available_tokens")))
      .withColumn("shortfall",
        greatest(lit(0L), col("src_budget") - col("available_tokens")))
      .orderBy(col("epoch"), col("source"))
  }

  def sa14CurriculumBudgetsQ(spark: SparkSession, sfDir: String): DataFrame =
    sa14CurriculumBudgets(Tables.documents(spark, sfDir))

  /** pl2 — the EPOCH MANIFEST: the COMPLETE data recipe as one DAG,
    * ending where a training run actually starts. pl1's gauntlet decides
    * WHO is admissible (URL dedup ∧ quality ∧ near-dup representative ∧
    * decontamination — each stage the registry operator itself); sa13's
    * budgeted fill then decides WHO TRAINS THIS EPOCH among the admitted
    * — √n-share source budgets recomputed over the admitted corpus,
    * quality-first whole-document fill. The output is the per-document
    * manifest row (fill position, source budget, verdict) a dataloader
    * consumes and an auditor replays: the two composition points a real
    * pipeline persists between (admission manifest → epoch manifest).
    *
    * Scale: the gauntlet side is pl1's plan verbatim (at 100 TB its
    * verdicts are the persisted stage manifests); the fill side joins on
    * doc_id and reuses sa13's bucketed two-phase prefix sum — no new
    * shuffle class appears in the composition, and the admitted join is
    * doc_id-keyed on both sides.
    */
  def pl2EpochManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val admitted = Dedup.corpusGauntlet(spark, sfDir)
      .filter(col("admitted")).select(col("doc_id"))
    val docs = Tables.documents(spark, sfDir).join(admitted, Seq("doc_id"))
    sa13BudgetEpoch(docs)
  }

  /** pl2's oracle: pl1's composed gauntlet text as a CTE, the admitted
    * projection, then sa13's fill text VERBATIM over it (the sim15/pl1
    * composition discipline — neither side can drift from the operators
    * it composes).
    */
  private[graft] def pl2OracleSql(): String =
    s"""WITH g AS MATERIALIZED (${Dedup.oracles("pl1_corpus_gauntlet")}),
       |ad AS MATERIALIZED (SELECT d.doc_id, d.text, d.source FROM documents d
       |       JOIN g USING (doc_id) WHERE g.admitted),
       |${sa13OracleSql(from = "ad").stripPrefix("WITH ")}""".stripMargin

  /** sa7 — EXACT-N deterministic sample via bottom-k on a salted hash:
    * order every doc by its salted-md5 uniform draw and keep the k
    * smallest. This is the exact-n sampler sa1 cannot be — sa1's
    * `orderBy(rand(seed))` is engine-RNG-bound (rows-only check), while
    * the hash draw is a property of the (salt, doc_id) key, so the SAME k
    * rows come back from every engine, every re-run, and every cluster
    * layout: fully oracle-HASHABLE. Statistically it is a uniform simple
    * random sample (each key's draw is i.i.d. uniform under the
    * random-oracle model of md5), and changing the salt redraws it.
    *
    * Scale: bottom-k is Spark's `TakeOrderedAndProject` — each partition
    * keeps a k-row heap, the driver merges P·k rows, the corpus never
    * shuffles (the canonical scale-safe exact-n shape; same plan family
    * as sa1 but with a portable key). The draw reuses [[saltedUniform]] —
    * one md5 per row, codegen'd, map-only.
    */
  def sa7BottomKSample(
      docs: DataFrame, k: Int = 200,
      salt: String = "graft-bottomk-v1"): DataFrame =
    docs
      .select(col("doc_id"), saltedUniform(salt, col("doc_id")).as("u"))
      .orderBy(col("u"), col("doc_id"))
      .limit(k)

  def sa7BottomKSampleQ(spark: SparkSession, sfDir: String): DataFrame =
    sa7BottomKSample(Tables.documents(spark, sfDir))

  /** sa10 — deterministic EXACT-N-PER-STRATUM sample: the k smallest
    * salted-md5 draws WITHIN each language — the eval-set builder the
    * rest of the family can't produce (sa2/sa8 keep a RATE per stratum,
    * so group sizes float; sa7 is exact-n but global; this pins exactly
    * min(k, |stratum|) rows per stratum, deterministically). Same
    * hashability argument as sa7: the k-set is a property of the
    * (salt, lang, doc_id) keys.
    *
    * Scale: `row_number` over a (lang)-partitioned (u, doc_id) order +
    * `<= k` filter — Spark 4 plans the rank filter as WindowGroupLimit,
    * per-partition k-row heaps PER GROUP before the shuffle, so the
    * full stratum never sorts; strata are bounded (languages), the
    * window partitioning is never single-partition global.
    */
  /** sa10 parameters — single source for the engine defaults AND the
    * generated oracle SQL (the sa9OracleSql pattern), so neither the k
    * cut nor the salt can drift between the two.
    */
  val Sa10K: Int = 40
  val Sa10Salt: String = "graft-stratk-v1"

  def sa10StratumBottomK(
      docs: DataFrame, k: Int = Sa10K,
      salt: String = Sa10Salt): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("u"), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        saltedUniform(salt, col("doc_id")).as("u"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
      .orderBy(col("doc_id"))
  }

  def sa10StratumBottomKQ(spark: SparkSession, sfDir: String): DataFrame =
    sa10StratumBottomK(Tables.documents(spark, sfDir))

  /** sa9 — WHOLE-document greedy sequence packing (first-fit-sequential
    * bin packing): walk docs in doc_id order, keep a running token fill,
    * and start a new bin whenever the next doc would push the fill past
    * `ctxTokens`. This is the packing a dataloader needs when documents
    * must NOT be split across training sequences — the op sa6 cannot
    * express (sa6's floor-div sharding splits a straddling doc's budget
    * across two shards). A doc longer than the context gets a bin of its
    * own (fill > ctx, flagged by the caller via `n_tokens > ctx`); the
    * greedy rule never reorders and never revisits a closed bin, so the
    * result is a pure function of (doc_id order, token counts).
    *
    * The sequential dependence (each bin boundary depends on every fill
    * before it) has no window-function closed form, so a naive
    * implementation is a single-threaded driver loop — the canonical
    * scale-killer. Instead the corpus is cut into fixed-SPAN doc_id
    * buckets (`bucketSpan` docs each) and packing runs independently
    * inside each bucket: bins never cross a bucket boundary, so buckets
    * are embarrassingly parallel and the only cost is at most one
    * partially-filled final bin per `bucketSpan` docs (<0.1% fill loss at
    * span 1024). The per-bucket scan is a `flatMapGroups` over the
    * bucket's rows (bounded at `bucketSpan` rows of (id, count) pairs —
    * never data-scaled memory), and the one shuffle is the hash
    * partition by bucket. At 100 TB the bucket count scales with the
    * corpus and every executor packs its buckets in one linear pass.
    *
    * The oracle is the SAME greedy recurrence as a DuckDB recursive CTE
    * (one row per (bucket, rank) step), so every bin id, position and
    * running fill — all exact BIGINT arithmetic — is hash-compared.
    */
  def sa9PackGreedy(
      docs: DataFrame, ctxTokens: Long = 512L,
      bucketSpan: Long = 1024L): DataFrame = {
    // bin_id = bucket * 100000 + bin: a bucket opens at most one bin per
    // doc, so bin < bucketSpan — the encoding is collision-free only
    // while bucketSpan stays within the multiplier
    require(bucketSpan > 0L && bucketSpan <= 100000L,
      s"bucketSpan must be in (0, 100000] (bin_id packs bins under a " +
        s"100000 multiplier; got $bucketSpan)")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        expr(s"doc_id div $bucketSpan").as("bucket"))
      .as[(Long, Long, Long)]
    val packed = w.groupByKey(_._3).flatMapGroups { (bucket, rows) =>
      // bounded buffer: a bucket holds at most bucketSpan (id, count)
      // pairs by construction — sort restores doc_id order after the
      // shuffle, then one linear greedy pass
      val ds = rows.toArray.sortBy(_._1)
      var bin = 0L; var fill = 0L; var pos = 0L
      ds.iterator.map { case (docId, n, _) =>
        if (pos > 0L && fill + n > ctxTokens) { bin += 1L; fill = 0L; pos = 0L }
        fill += n; pos += 1L
        (docId, n, bucket, bucket * 100000L + bin, pos, fill)
      }
    }
    packed
      .toDF("doc_id", "n_tokens", "bucket", "bin_id", "pos", "bin_fill")
      .orderBy(col("doc_id"))
  }

  def sa9PackGreedyQ(spark: SparkSession, sfDir: String): DataFrame =
    sa9PackGreedy(Tables.documents(spark, sfDir))

  /** sa9's oracle: the identical greedy recurrence as a recursive CTE —
    * the working table advances one per-bucket rank per iteration, so
    * the recursion depth is the largest bucket's row count and every
    * step is exact BIGINT arithmetic. Generated from the same
    * (ctxTokens, bucketSpan) the engine runs.
    */
  private[graft] def sa9OracleSql(
      ctxTokens: Long = 512L, bucketSpan: Long = 1024L): String =
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id, CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens,
       |    doc_id // $bucketSpan AS bucket,
       |    row_number() OVER (PARTITION BY doc_id // $bucketSpan
       |                       ORDER BY doc_id) AS rn
       |  FROM documents),
       |rec AS (
       |  SELECT bucket, rn, doc_id, n_tokens,
       |    CAST(0 AS BIGINT) AS bin, n_tokens AS fill, CAST(1 AS BIGINT) AS pos
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
       |    CASE WHEN rec.fill + t.n_tokens > $ctxTokens
       |         THEN rec.bin + 1 ELSE rec.bin END,
       |    CASE WHEN rec.fill + t.n_tokens > $ctxTokens
       |         THEN t.n_tokens ELSE rec.fill + t.n_tokens END,
       |    CASE WHEN rec.fill + t.n_tokens > $ctxTokens
       |         THEN CAST(1 AS BIGINT) ELSE rec.pos + 1 END
       |  FROM rec JOIN t ON t.bucket = rec.bucket AND t.rn = rec.rn + 1)
       |SELECT doc_id, n_tokens, bucket, bucket * 100000 + bin AS bin_id,
       |  pos, fill AS bin_fill
       |FROM rec ORDER BY doc_id""".stripMargin

  /** The dataloader HANDOFF for sa6's packing: the corpus written as ONE
    * JSON-lines file per token-budget shard (`shard_id=` partition dirs,
    * docs in packing order inside each file) — the physical contract a
    * training job consumes: each worker streams its shard files, no
    * shuffling at read time, sequence packing already decided. Executors
    * write (`partitionBy` + per-shard repartition ⇒ one file per shard);
    * nothing data-scaled touches the driver. At 100 TB the shard count
    * scales with the corpus and this same write fans out across the
    * cluster.
    */
  def exportShards(
      spark: SparkSession, sfDir: String, outDir: String,
      budgetTokens: Long = 20000L): Unit = {
    val docs = Tables.documents(spark, sfDir)
    sa6TokenShards(docs, budgetTokens)
      .select(col("doc_id"), col("shard_id"))
      .join(docs, Seq("doc_id"))
      .select(col("shard_id"), col("doc_id"), col("text"))
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard_id").json(outDir)
  }

  // ----------------------------------------------------------- csv dim

  /** cs1 — S3: the dimension join with the dim read from CSV (the
    * reference's zones lookup path, assignment1.ipynb:239). Values
    * round-trip losslessly, so the oracle runs on the parquet twin.
    */
  def cs1CsvDimJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nationCsv(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))

  /** js1 — S8: the same dimension join with the dim read from JSON lines
    * through the explicit-schema PERMISSIVE contract
    * ([[Tables.jsonSource]]) — corrupt lines are captured and filtered,
    * never thrown. Identical result contract to cs1, different source
    * format surface.
    */
  def js1JsonDimJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nationJson(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))

  /** os1 — ORC source + sink roundtrip under a FACT-scale join: the
    * supplier dim staged once as ORC ([[Tables.supplierOrc]], the
    * marker-and-stamp idempotent scheme cs1/js1 use), broadcast against
    * the lineitem scan, per-supplier quantity mass + line count with
    * `s_acctbal` carried through the GROUP KEY — a double that survives
    * the parquet→ORC→read→group→hash chain bit-exactly or the oracle
    * (which computes from the ORIGINAL parquet) mismatches. Completes
    * the source-format matrix: parquet (S2), CSV all-strings (S3),
    * JSON-lines permissive (S8), ORC typed columnar (this).
    *
    * Scale: the dim export is dim-bounded work behind the stamp guard;
    * the query is q05's shape — fact scan streams once, dim broadcasts,
    * partial agg collapses to the supplier grain before the one
    * bounded shuffle.
    */
  def os1OrcDimJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.supplierOrc(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"), col("s_acctbal"))
      .agg(dsumr(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))

  /** os3 — GZIP JSON-LINES roundtrip: a bounded document prefix staged
    * once as `.json.gz` ([[Tables.documentsJsonGz]]) — the wire format
    * crawl corpora actually arrive in (WET extracts, CC dumps, vendor
    * deliveries) — and read back through the explicit-schema PERMISSIVE
    * contract with transparent codec decompression at the scan. The
    * md5-of-text column hash-gates the whole
    * write-escape-compress → decompress-parse chain byte-for-byte
    * against the ORIGINAL parquet. Completes the source matrix's codec
    * axis: parquet/ORC columnar, CSV/JSON-lines text, binaryFile
    * per-asset, gzip JSONL compressed-text. 100 TB note: gzip members
    * are NOT splittable — parallelism = shard-file count, which is how
    * crawl dumps ship (thousands of shards), never within one file.
    */
  def os3GzipJsonl(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsJsonGz(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "os3_gzip_jsonl" -> (os3GzipJsonl _),
    "os1_orc_dim_join" -> (os1OrcDimJoin _),
    "pf1_param_filter" -> (pf1ParamFilter _),
    "pf2_param_filter_alt" -> (pf2ParamFilterAlt _),
    "pf3_param_filter_clean" -> (pf3ParamFilterClean _),
    "pf4_manifest_serve" -> (pf4ParamFilterManifest _),
    "pf5_zorder_serve" -> (pf5ZOrderServe _),
    "sa1_seeded_sample" -> (sa1SeededSample _),
    "sa2_stratified_sample" -> (sa2StratifiedSample _),
    "sa3_hash_split" -> (sa3HashSplitQ _),
    "sa4_weighted_sample" -> (sa4WeightedSampleQ _),
    "sa5_mixture_sample" -> (sa5MixtureSampleQ _),
    "sa6_token_shards" -> (sa6TokenShardsQ _),
    "sa7_bottomk_sample" -> (sa7BottomKSampleQ _),
    "sa8_stratified_hash_sample" -> (sa8StratifiedHashSampleQ _),
    "sa9_pack_greedy" -> (sa9PackGreedyQ _),
    "sa10_stratum_bottomk" -> (sa10StratumBottomKQ _),
    "sa11_epoch_order" -> (sa11EpochOrderQ _),
    "sa12_leakage_safe_split" -> (sa12LeakageSafeSplitQ _),
    "sa13_budget_epoch" -> (sa13BudgetEpochQ _),
    "sa14_curriculum_budgets" -> (sa14CurriculumBudgetsQ _),
    "pl2_epoch_manifest" -> (pl2EpochManifest _),
    "cs1_csv_dim_join" -> (cs1CsvDimJoin _),
    "js1_json_dim_join" -> (js1JsonDimJoin _))

  val oracles: Map[String, String] = Map(
    // the oracle is the naive per-source quality-ordered cumsum the
    // two-phase bucket plan must reproduce row-for-row
    "sa13_budget_epoch" -> sa13OracleSql(),
    // pl1's gauntlet composed with sa13's fill — both texts verbatim
    "pl2_epoch_manifest" -> pl2OracleSql(),
    // hashes the ORIGINAL parquet text for the staged prefix — a match
    // proves the JSON-escape + gzip + decompress + parse chain was
    // byte-exact
    "os3_gzip_jsonl" ->
      s"""SELECT doc_id, lang, source, md5(text) AS text_md5
         |FROM documents WHERE doc_id < ${Tables.Os3DocCount}
         |ORDER BY doc_id""".stripMargin,
    "pf1_param_filter" -> oracleSqlFor(defaultParams),
    "pf2_param_filter_alt" -> oracleSqlFor(altParams),
    // pf3 serves from the CLEAN staging, so its oracle carries the same
    // critical-column null drop the staging applies (shared column list —
    // the adversarial-events replay caught the raw-table version counting
    // a NULL-value row the clean store had dropped)
    "pf3_param_filter_clean" -> oracleSqlFor(defaultParams,
      extraWhere = CleanStore.EventCriticalCols.map(c => s"$c IS NOT NULL")),
    // pf4 serves the SAME clean content through the manifest store — the
    // serving layer must be invisible to the result, so the oracle is
    // pf3's verbatim
    "pf4_manifest_serve" -> oracleSqlFor(defaultParams,
      extraWhere = CleanStore.EventCriticalCols.map(c => s"$c IS NOT NULL")),
    // pf5 serves the SAME clean content from the z-ordered layout — the
    // layout must be invisible to the result, so the oracle is pf3's
    // text plus the user-range literal generated from the shared bounds
    "pf5_zorder_serve" -> oracleSqlFor(defaultParams,
      extraWhere = CleanStore.EventCriticalCols.map(c => s"$c IS NOT NULL") :+
        s"user_id BETWEEN $Pf5UserLo AND $Pf5UserHi"),
    "cs1_csv_dim_join" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // the oracle reads the ORIGINAL parquet supplier — a hash match
    // proves the ORC roundtrip (keys, strings, the s_acctbal double)
    // was bit-exact; dsum twin per the Analytics convention. The
    // `+ 0.0` on the projected key is the declarative twin of Spark's
    // NormalizeFloatingNumbers: Spark canonicalizes -0.0 to 0.0 in
    // GROUP-BY keys while DuckDB keeps the stored sign as the group
    // representative (found by the adversarial dimension replay);
    // IEEE -0.0 + 0.0 = +0.0 and x + 0.0 = x for every other finite x,
    // so the twin is exact and benign-corpus hashes are unchanged
    "os1_orc_dim_join" ->
      """SELECT s_name, s_acctbal + 0.0 AS s_acctbal,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6)
        |    AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name, s_acctbal ORDER BY s_name""".stripMargin,
    // the JSON export carries the nation dim verbatim (no corrupt lines in
    // a Spark-written export), so the oracle is the same dim join
    "js1_json_dim_join" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // the NAIVE global-rank formulation (one window per epoch) — the
    // sa6 discipline: the engine's two-phase bucketed rank must be
    // bit-identical to this; draw and epoch literal from the shared
    // constants
    "sa11_epoch_order" ->
      s"""WITH e AS (SELECT doc_id, epoch
         |  FROM documents, unnest(range($EpochCount)) t(epoch)),
         |u AS (SELECT doc_id, epoch,
         |  ${saltedUniformSql(EpochSalt,
              "CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS u
         |  FROM e)
         |SELECT epoch, doc_id,
         |  row_number() OVER (PARTITION BY epoch ORDER BY u, doc_id)
         |    AS shuffle_rank
         |FROM u ORDER BY epoch, doc_id""".stripMargin,
    // the dd8/dd9 connected-component derivation verbatim (same
    // shingling, DF cap, jaccard threshold, bounded unrolled CC), then
    // sa3's exact integer bucket arithmetic keyed on the GROUP id —
    // literals from the shared (GroupSplitHoldoutPct, GroupSplitSalt)
    "sa12_leakage_safe_split" ->
      s"""WITH t AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |  list_distinct([array_to_string(toks[i+1:i+3], ' ') FOR i IN range(len(toks)-2)]) AS shingles FROM t),
         |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |dfc AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 50),
         |kept AS (SELECT ex.doc_id, ex.s FROM ex JOIN dfc USING (s)),
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |          FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b
         |          FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.2),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |${Dedup.ccSql("edges", "cc")},
         |reps AS (SELECT id AS doc_id, lbl AS rep_id FROM cc),
         |g AS (SELECT d.doc_id, coalesce(r.rep_id, d.doc_id) AS group_id
         |      FROM documents d LEFT JOIN reps r ON d.doc_id = r.doc_id),
         |b AS (SELECT doc_id, group_id,
         |  ('0x' || substring(md5('$GroupSplitSalt:' || CAST(group_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
         |  FROM g)
         |SELECT doc_id, group_id, bucket,
         |  CASE WHEN bucket < $GroupSplitHoldoutPct THEN 'holdout'
         |       ELSE 'train' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "sa4_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, len(${tokensSql("text")}) AS w FROM documents),
         |s AS (SELECT CAST(sum(w) AS BIGINT) AS tot_w FROM t),
         |b AS (SELECT doc_id, w,
         |  ${saltedUniformSql("graft-wsample-v1", "doc_id")} AS u,
         |  least(CAST(1 AS DOUBLE), CAST(150 AS DOUBLE) * w / CAST(tot_w AS DOUBLE)) AS p
         |  FROM t, s)
         |SELECT doc_id, CAST(w AS BIGINT) AS w, round(p * 1e6) / 1e6 AS p_inc
         |FROM b WHERE u < p ORDER BY doc_id""".stripMargin,
    // the {1, 3/4, 1/2} exponents spelled as sqrt chains in BOTH texts:
    // IEEE sqrt is correctly rounded (bit-identical cross-engine) where
    // pow(n, 0.75) is not — see the engine scaladoc
    "sa14_curriculum_budgets" ->
      s"""WITH t AS (SELECT source,
         |    CAST(len(${tokensSql("text")}) AS BIGINT) AS w FROM documents),
         |ns AS (SELECT source, count(*) AS nl, sum(w) AS avail
         |       FROM t GROUP BY source),
         |w AS (
         |  SELECT 0 AS epoch, source, nl, avail, CAST(nl AS DOUBLE) AS wt FROM ns
         |  UNION ALL SELECT 1, source, nl, avail, sqrt(nl) * sqrt(sqrt(nl)) FROM ns
         |  UNION ALL SELECT 2, source, nl, avail, sqrt(nl) FROM ns),
         |sw AS (SELECT epoch, sum(CAST(wt AS DECIMAL(38,6))) AS sw
         |       FROM w GROUP BY epoch),
         |b AS (SELECT w.epoch, w.source,
         |    CAST(w.nl AS BIGINT) AS n_docs,
         |    CAST(w.avail AS BIGINT) AS available_tokens,
         |    CAST(floor(${Sa13Budget}.0 * w.wt / CAST(sw.sw AS DOUBLE))
         |      AS BIGINT) AS src_budget
         |  FROM w JOIN sw ON w.epoch = sw.epoch)
         |SELECT epoch, source, n_docs, available_tokens, src_budget,
         |  least(src_budget, available_tokens) AS granted,
         |  greatest(CAST(0 AS BIGINT), src_budget - available_tokens)
         |    AS shortfall
         |FROM b ORDER BY epoch, source NULLS FIRST""".stripMargin,
    "sa5_mixture_sample" ->
      s"""WITH l AS (SELECT lang, count(*) AS nl FROM documents GROUP BY lang),
         |w AS (SELECT sum(CAST(sqrt(nl) AS DECIMAL(38,6))) AS sw FROM l),
         |r AS (SELECT lang,
         |  least(CAST(1 AS DOUBLE),
         |        CAST(250 AS DOUBLE) * sqrt(nl) / CAST(sw AS DOUBLE) / nl) AS rate
         |  FROM l, w),
         |b AS (SELECT doc_id, d.lang, rate,
         |  ${saltedUniformSql("graft-mixture-v1", "doc_id")} AS u
         |  FROM documents d JOIN r ON d.lang = r.lang)
         |SELECT doc_id, lang, round(rate * 1e6) / 1e6 AS p_inc
         |FROM b WHERE u < rate ORDER BY doc_id""".stripMargin,
    // the oracle is the NAIVE global exclusive cumsum — the distributed
    // two-phase plan must reproduce it row-for-row
    "sa6_token_shards" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(${tokensSql("text")}) AS BIGINT) AS w
         |           FROM documents),
         |c AS (SELECT doc_id, w,
         |  coalesce(sum(w) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
         |  FROM t)
         |SELECT doc_id, w, CAST(excl // 20000 AS BIGINT) AS shard_id
         |FROM c ORDER BY doc_id""".stripMargin,
    // bottom-k on the salted hash: the 52-bit draw is exact in a double
    // and the /2^52 is a power-of-two scale, so u is bit-identical in both
    // engines and the k-smallest set (tie order pinned by doc_id) hashes
    "sa7_bottomk_sample" ->
      s"""SELECT doc_id, ${saltedUniformSql("graft-bottomk-v1", "doc_id")} AS u
         |FROM documents ORDER BY u, doc_id LIMIT 200""".stripMargin,
    "sa3_hash_split" ->
      """WITH b AS (SELECT doc_id,
        |  ('0x' || substring(md5('graft-split-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // sa2's fraction map regenerated as a CASE (single Scala source — the
    // map — feeds both engines), the draw is sa4's md5 uniform keyed by
    // (lang, doc_id); the comparison constants are exact doubles
    "sa8_stratified_hash_sample" -> {
      val fracSql = "CASE lang " +
        sa2Fractions.map { case (l, f) => s"WHEN '$l' THEN $f" }.mkString(" ") +
        " ELSE 0 END"
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${saltedUniformSql("graft-strat-v1", "lang || ':' || CAST(doc_id AS VARCHAR)")} < $fracSql
         |ORDER BY doc_id""".stripMargin
    },
    // the oracle is the same greedy recurrence, driven per-bucket by a
    // recursive CTE — all-BIGINT arithmetic, so the hash compare covers
    // bin boundaries, positions and running fills exactly
    "sa9_pack_greedy" -> sa9OracleSql(),
    // the same per-stratum bottom-k on the shared salted draw; k and
    // the salt are generated from the shared Sa10K/Sa10Salt defaults
    "sa10_stratum_bottomk" ->
      s"""SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM (
         |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |    ORDER BY ${saltedUniformSql(Sa10Salt, "doc_id")}, doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= $Sa10K ORDER BY doc_id""".stripMargin)
  // sa1/sa2 are engine-RNG-specific by design → rows-only checks
  // (exact-n / seed-determinism + proportions asserted in ParamsSpec);
  // sa8 is sa2's deterministic oracle-hashed twin.
}
