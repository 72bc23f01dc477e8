package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Deduplication family for training-data pipelines, graded from exact to
  * approximate:
  *
  *  - exact: hash-groupBy on the raw text — one shuffle on a 16-byte key;
  *  - fingerprint: bag-of-words md5 (word-order-insensitive exact);
  *  - n-gram Jaccard: exact set-similarity over 3-word shingles via an
  *    inverted-index join (shuffle on shingle, then on the pair key) — the
  *    verification stage of a MinHash pipeline, exact-tested here;
  *  - MinHash/LSH: banded signatures so candidate generation shuffles on
  *    (band, bandHash) buckets only — the 100 TB path: cost is
  *    O(docs × k) map-side + a bucket-sized shuffle, never O(docs²);
  *  - SimHash: 64-bit rotation-banded near-dup candidates with a Hamming
  *    distance verify.
  *
  * All signature math is built-in expressions (`xxhash64`, HOFs) — no UDFs,
  * fully codegen'd.
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** Exact duplicate groups by content hash (md5 to match the oracle). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("text_hash"))

  /** Word-order-insensitive duplicate groups via [[TextAnalysis.fingerprint]]. */
  def fingerprintGroups(docs: DataFrame): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("fp"))

  // ------------------------------------------------------------ shingles

  /** Distinct n-word shingles of a whitespace-tokenized text column.
    * Guarded for texts shorter than n tokens (empty set), matching DuckDB's
    * empty `range()`.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val raw = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(
      when(size(toks) >= n, raw).otherwise(array().cast("array<string>")))
  }

  // ------------------------------------------------------------ jaccard

  /** Exact n-gram Jaccard similarity for every doc pair sharing ≥1 shingle,
    * thresholded. Inverted-index plan: explode shingles → self-join on the
    * shingle (shuffle partitions by shingle, so co-grouped) → count
    * intersections → join the two set sizes. No cross join anywhere; the
    * only quadratic term is per-posting-list, which LSH bounds at scale.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.2): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text"), n).as("sh"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = ex.as("a")
      .join(ex.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    val jac = col("c") * lit(1.0) / (col("sa.n_sh") + col("sb.n_sh") - col("c"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), r6(jac).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------------ minhash

  /** Modulus for the universal-hash permutations (2^61 − 1, prime). */
  private val P = 2305843009213693951L
  private def perm(seed: Int): (Long, Long) = {
    val r = new scala.util.Random(seed)
    (math.abs(r.nextLong()) % (P - 1) + 1, math.abs(r.nextLong()) % P)
  }

  /** doc_id → array of k MinHash values over n-gram shingles. Pure
    * expression work: one pass, no shuffle.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 32, n: Int = 3): DataFrame = {
    val perms = (0 until k).map(perm)
    val as = typedlit(perms.map(_._1))
    val bs = typedlit(perms.map(_._2))
    val sh = shingles(col("text"), n)
    val sig = transform(
      sequence(lit(0), lit(k - 1)),
      i =>
        array_min(transform(sh, s =>
          pmod(element_at(as, i + 1) * xxhash64(s) + element_at(bs, i + 1), lit(P)))))
    docs.select(col("doc_id"),
      when(size(sh) > 0, sig).otherwise(array().cast("array<long>")).as("sig"))
  }

  /** LSH candidate pairs: split the k-long signature into `bands` bands,
    * hash each band, group docs by (band, bandHash). Docs sharing any band
    * bucket become candidates — the shuffle key is the bucket, so the plan
    * scales with bucket sizes, not docs².
    */
  def minhashCandidates(
      docs: DataFrame, k: Int = 32, n: Int = 3, bands: Int = 8): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sigs = minhashSignatures(docs, k, n).filter(size(col("sig")) > 0)
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------------ simhash

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hashes, folded into one long. Written as a SQL expression because the
    * Scala `shiftleft`/`shiftright` wrappers only take literal shift
    * amounts while the lambda bit index is a column. Expression-only — one
    * codegen'd pass per row, no shuffle; at 100 TB this would graduate to a
    * custom Expression doing a single pass over tokens instead of 64.
    */
  def simhashExpr(textCol: String): Column = expr(
    s"""aggregate(sequence(0, 63), 0L, (acc, b) -> acc | IF(
       |  aggregate(split(trim($textCol), ' '), 0L,
       |    (a2, t) -> a2 + IF((shiftright(xxhash64(t), b) & 1) = 1, 1L, -1L)) > 0,
       |  shiftleft(1L, b), 0L))""".stripMargin)

  /** SimHash near-dup candidates: band the 64-bit hash into four 16-bit
    * keys (two hashes within Hamming distance ≤3 must agree on ≥1 of 4
    * bands, pigeonhole), bucket-join on (band, key), then verify with exact
    * `bit_count(a XOR b)`. Shuffle key is the 16-bit bucket — scales with
    * bucket occupancy, not docs².
    */
  def simhashCandidates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhashExpr("text").as("sig"))
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      expr("posexplode(transform(sequence(0, 3), b -> shiftright(sig, b * 16) & 65535))"))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd1_exact_dups" -> ((s: SparkSession, d: String) => exactGroups(Tables.documents(s, d))),
    "dd2_fingerprint_dups" -> ((s: SparkSession, d: String) => fingerprintGroups(Tables.documents(s, d))),
    "dd3_ngram_jaccard" -> ((s: SparkSession, d: String) => ngramJaccardPairs(Tables.documents(s, d))),
    "dd4_minhash_candidates" -> ((s: SparkSession, d: String) => minhashCandidates(Tables.documents(s, d))),
    "dd5_simhash_candidates" -> ((s: SparkSession, d: String) => simhashCandidates(Tables.documents(s, d))))

  val oracles: Map[String, String] = Map(
    "dd1_exact_dups" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd2_fingerprint_dups" ->
      """SELECT md5(array_to_string(list_sort(string_split(trim(lower(text)), ' ')), ' ')) AS fp,
        |count(*) AS n_copies, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd3_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(toks[i+1:i+3], ' ') FOR i IN range(len(toks)-2)]) AS shingles FROM t),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |sz AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, round(c * 1.0 / (sa.n_sh + sb.n_sh - c), 6) AS jaccard
        |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
        |WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin)
  // dd4/dd5 are approximate (engine-specific hash functions) → rows-only
  // checks by design; their recall is exact-tested against dd3 in ScalaTest.
}
