package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[topkExact]] is the brute-force baseline: broadcast the (small)
  *    query set against the corpus — the corpus is never shuffled, the scan
  *    streams through a broadcast-nested-loop with a per-partition top-k
  *    heap (Spark 4's WindowGroupLimit pushes the rank filter down).
  *  - [[lshAnn]] is the scale path: OR-amplified random-hyperplane LSH —
  *    `nBands` independent bands of `nPlanes` sign bits each; a corpus row
  *    is a candidate for a query iff they agree on ALL planes of ANY band
  *    (recall 1−(1−p^r)^b instead of the single-band p^r, which found <30%
  *    of true neighbors). Candidate generation is a hash join on the
  *    (band, bucket) key — O(corpus × bands), never corpus × queries.
  *    Recall ≥ 0.9 vs [[topkExact]] is asserted in `SimilaritySpec`.
  *
  * Vector math is `zip_with`/`aggregate` over doubles — sequential
  * accumulation, matching DuckDB's `list_cosine_similarity` on
  * `DOUBLE[]`-cast inputs for oracle parity.
  */
object Similarity {

  /** Dot product of two array<double> columns (sequential fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm squared. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (sqrt(norm2(ad)) * sqrt(norm2(bd)))
  }

  /** Exact top-k cosine neighbors for each query vector (vec_id < nQueries
    * marks the query set). Self-matches excluded.
    */
  def topkExact(emb: DataFrame, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val sim = cosine(col("q_emb"), col("c_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_raw").desc, col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_raw", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), r6(col("sim_raw")).as("cosine"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic random hyperplanes (seeded driver-side, shipped as a
    * broadcast literal — a few KB regardless of corpus size).
    */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Sign-bit bucket of a vector under one band's hyperplanes. */
  private def bandBucket(vd: Column, ps: Seq[Seq[Double]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      when(dot(vd, typedlit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Array of `nBands` bucket ids (one per independent band of `nPlanes`
    * sign bits); position in the array is the band id.
    */
  def lshBuckets(
      vec: Column, nBands: Int, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val vd = vec.cast("array<double>")
    array((0 until nBands).map(b => bandBucket(vd, planes(nPlanes, dim, seed + b))): _*)
  }

  /** Approximate top-k: explode each row into its `nBands` (band, bucket)
    * keys, hash-join corpus keys against the broadcast query keys, dedup
    * candidate pairs, rank by exact cosine within the candidate set. The
    * corpus side never shuffles for candidate generation; the only shuffle
    * carries deduped candidate pairs. Raising `nBands` raises recall at
    * linear cost (the multi-probe knob); `nPlanes` controls bucket
    * selectivity at scale.
    */
  def lshAnn(
      emb: DataFrame, nQueries: Int = 20, k: Int = 5,
      nBands: Int = 24, nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val banded = emb.select(
      col("vec_id"), col("embedding"),
      posexplode(lshBuckets(col("embedding"), nBands, nPlanes, dim))
        .as(Seq("band", "bucket")))
    val qKeys = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("band"), col("bucket"))
    val qEmb = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_raw").desc, col("neighbor_id"))
    banded
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("band"), col("bucket"))
      .join(broadcast(qKeys), Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("c_emb")).as("c_emb"))
      .join(broadcast(qEmb), Seq("query_id"))
      .withColumn("sim_raw", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), r6(col("sim_raw")).as("cosine"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** dd6 — embedding-cosine near-duplicate pairs over the WHOLE corpus
    * (not query-limited like sim2): multi-band hyperplane LSH buckets the
    * corpus, candidates are generated by a bucket self-join (shuffle key =
    * (band, bucket), work bounded by bucket occupancy — never corpus²),
    * then every candidate is verified with the exact cosine. False
    * positives are impossible (exact verify); false negatives are the LSH
    * recall, asserted ≥ 0.85 against brute force in `SimilaritySpec`.
    */
  def embedNearDups(
      emb: DataFrame, minCosine: Double = 0.4,
      nBands: Int = 24, nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val banded = emb.select(
      col("vec_id"), col("embedding"),
      posexplode(lshBuckets(col("embedding"), nBands, nPlanes, dim))
        .as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .agg(first(col("a.embedding")).as("ea"), first(col("b.embedding")).as("eb"))
      .withColumn("cosine", r6(cosine(col("ea"), col("eb"))))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim1_topk_exact" -> ((s: SparkSession, d: String) => topkExact(Tables.embeddings(s, d))),
    "sim2_ann_lsh" -> ((s: SparkSession, d: String) => lshAnn(Tables.embeddings(s, d))),
    "dd6_embed_neardup" -> ((s: SparkSession, d: String) => embedNearDups(Tables.embeddings(s, d))))

  val oracles: Map[String, String] = Map(
    "sim1_topk_exact" ->
      """SELECT query_id, neighbor_id, cosine, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                 CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                      CAST(q.embedding AS DOUBLE[])) DESC,
        |      c.vec_id) AS BIGINT) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 20) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)
  // sim2/dd6 are approximate (engine-specific plane hashing) → rows-only
  // checks; recall vs the exact computations is asserted in
  // src/test/scala/graft/SimilaritySpec.scala.
}
