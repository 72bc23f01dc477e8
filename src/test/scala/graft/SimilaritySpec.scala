package graft

import org.apache.spark.sql.functions
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.sources.Tables

/** The recall claim sim2 makes (rows-only in the driver harness). */
class SimilaritySpec extends AnyFunSuite with SparkFixture {

  /** Resolve the current manifest snapshot of a pointer-swap artifact
    * root (r16: the index artifacts publish immutable snap= dirs).
    */
  private def snapOf(root: String): String = {
    val r = new java.io.File(root)
    graft.sources.ManifestStore.currentPointer(r)
      .map(pt => graft.sources.ManifestStore.snapDir(r, pt._1).getAbsolutePath)
      .getOrElse(fail(s"no manifest pointer at $root"))
  }

  test("sim2 LSH ANN: recall >= 0.9 of sim1's exact top-5, and cosines are exact") {
    val emb = Tables.embeddings(spark, sf001)
    val exact = Similarity.topkExact(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val annRows = Similarity.lshAnn(emb).collect()
    val ann = annRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 100) // 20 queries x k=5
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall $recall")
    // the cosine an ANN hit reports must equal the exact computation
    val exactCos = Similarity.topkExact(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    annRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactCos.get(key).foreach(c => assert(r.getDouble(2) === c))
    }
  }

  test("sim12 hard negatives: labels always differ, k per query, dominated by the unrestricted top-1") {
    val emb = Tables.embeddings(spark, sf001)
    val labels = emb.collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    val rows = Similarity.hardNegatives(emb).collect()
    // 20 queries x k=5, ranks 1..5, cosine non-increasing within a query
    assert(rows.length === 100)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(5)).sorted.toSeq === (1L to 5L), s"ranks for query $q")
      val cos = rs.sortBy(_.getLong(5)).map(_.getDouble(4))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"cosines not ranked for $q")
    }
    rows.foreach { r =>
      // the mined negative NEVER shares the query's label (so never self)
      assert(r.getLong(1) !== r.getLong(3), s"same-label pair ${r.getLong(0)}->${r.getLong(2)}")
      assert(r.getLong(1) === labels(r.getLong(0)) && r.getLong(3) === labels(r.getLong(2)))
    }
    // restriction to a label-mismatch subset can't beat the unrestricted
    // exact top-1 (r6 is monotone, so the rounded compare is safe)
    val top1 = Similarity.topkExact(emb).filter("rank = 1").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.filter(_.getLong(5) == 1L).foreach { r =>
      assert(r.getDouble(4) <= top1(r.getLong(0)) + 1e-12)
    }
  }

  test("sim13 range search: crafted τ-ball exact, no self pairs, and it contains every top-k hit above τ") {
    import spark.implicits._
    // q0=[1,0]: v1 identical (cos 1), v2 at ~0.89, v3 orthogonal (cos 0)
    val crafted = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(2.0f, 0.0f)),
      (2L, Array(2.0f, 1.0f)), (3L, Array(0.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val ball = Similarity.rangeSearch(crafted, nQueries = 1, tau = 0.5).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(ball.keySet === Set(1L, 2L), s"τ=0.5 ball was ${ball.keySet}")
    assert(ball(1L) === 1.0)
    assert(math.abs(ball(2L) - 2.0 / math.sqrt(5.0)) < 1e-6)
    // corpus: every hit clears τ (r6 edge-tolerant), never a self pair,
    // and the exact top-k rows above τ are a SUBSET of the τ-ball
    val emb = Tables.embeddings(spark, sf001)
    val hits = Similarity.rangeSearch(emb).collect()
    assert(hits.nonEmpty, "τ=0.3 finds no neighbors at sf0.001 — lower τ")
    val hitSet = hits.map(r => (r.getLong(0), r.getLong(1))).toSet
    hits.foreach { r =>
      assert(r.getLong(0) !== r.getLong(1))
      assert(r.getDouble(2) >= Similarity.RangeTau - 1e-6)
    }
    Similarity.topkExact(emb).collect()
      .filter(_.getDouble(2) > Similarity.RangeTau + 1e-6)
      .foreach { r =>
        assert(hitSet.contains((r.getLong(0), r.getLong(1))),
          s"top-k hit ${r.getLong(0)}->${r.getLong(1)} missing from the τ-ball")
      }
  }

  test("sim14 kNN graph: mutuality prunes hubs; reciprocal pairs survive with both ranks") {
    import spark.implicits._
    // hub geometry: three orthogonal spokes e1,e2,e3 each at cos 1/√3 to
    // the hub h=(1,1,1,0)/√3 — every spoke's top-1 is h, but h's top-1 is
    // only ONE of them (tie at 1/√3 broken by neighbor id → spoke 1), so
    // mutuality keeps exactly one hub edge. v5/v6 are a genuine
    // reciprocal pair far from the hub cluster.
    val crafted = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(1.0f, 1.0f, 1.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
      (6L, Array(0.0f, 0.0f, 0.1f, 1.0f))
    ).toDF("vec_id", "embedding")
    val edges = Similarity.knnGraph(crafted, sampleK = 100, k = 1).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(edges.keySet === Set((1L, 4L), (5L, 6L)),
      s"mutual edge set was ${edges.keySet}")
    val (cosHub, rAb, rBa) = edges((1L, 4L))
    assert(math.abs(cosHub - 1.0 / math.sqrt(3.0)) < 1e-6)
    assert(rAb === 1L && rBa === 1L)
    assert(edges((5L, 6L))._1 > 0.99)

    // corpus: every mutual edge is low-id oriented, ranks within k, and
    // the run is deterministic
    val emb = Tables.embeddings(spark, sf001)
    val g = Similarity.knnGraph(emb).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 4L)
      assert(r.getLong(4) >= 1L && r.getLong(4) <= 4L)
    }
    assert(Similarity.knnGraph(emb).collect().map(_.toSeq).toSeq ===
      g.map(_.toSeq).toSeq)
  }

  test("sim15 ANN-recall monitor: per-query metric matches an independent replay, floor holds") {
    val emb = Tables.embeddings(spark, sf001)
    val rows = Similarity.annRecall(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 20)
    rows.foreach { case (_, h, rec) =>
      assert(h >= 0L && h <= 5L && rec >= 0.0 && rec <= 1.0)
    }
    // independent replay from the two operators' own outputs
    val exact = Similarity.topkExact(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshAnn(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (q, h, _) =>
      val want = exact.filter(_._1 == q).count(ann.contains)
      assert(h === want.toLong, s"query $q: monitor says $h, replay says $want")
    }
    // the monitor must agree with the sim2 spec's recall floor
    assert(rows.map(_._3).sum / rows.length >= 0.9)
  }

  test("dd24 embedding decontamination: eval never screens itself, flags clear tau, argmax verified") {
    val emb = Tables.embeddings(spark, sf001)
    val out = Similarity.embeddingDecontaminate(emb).collect()
    assert(out.nonEmpty, "the planted near-dups must contaminate at tau=0.4")
    val evalIds = Similarity.sampledVectors(emb, Similarity.DecontEvalK,
      Similarity.DecontSalt).select("vec_id").collect().map(_.getLong(0)).toSet
    out.foreach { r =>
      assert(!evalIds.contains(r.getLong(0)), "an eval member screened itself")
      assert(evalIds.contains(r.getLong(1)), "matched neighbor not in the eval set")
      assert(r.getDouble(2) >= Similarity.DecontTau - 1e-6)
    }
    // one row per contaminated train vector (the argmax collapsed)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    // brute-force argmax check: for each flagged train vector, no eval
    // vector scores strictly higher than the named one
    val units = Similarity.unitized(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    out.foreach { r =>
      val best = evalIds.map(e => cos(units(r.getLong(0)), units(e))).max
      assert(math.abs(best - r.getDouble(2)) < 1e-6,
        s"named neighbor is not the max for train ${r.getLong(0)}")
    }
    assert(Similarity.embeddingDecontaminate(emb).collect().map(_.toSeq).toSeq
      === out.map(_.toSeq).toSeq)
  }

  test("sim6 int8 quantization: high recall vs exact top-5, scores track raw dots, integral components") {
    val emb = Tables.embeddings(spark, sf001)
    // sim1 ranks by cosine, sim6 by (rescaled) raw dot — compare against
    // an exact top-k on the RAW dot so the baseline measures quantization
    // error only, not the norm-weighting difference
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d").desc, col("neighbor_id"))
    val exact = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("d", Similarity.dot(
        col("q_emb").cast("array<double>"), col("c_emb").cast("array<double>")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("d"))
    val exactRows = exact.collect()
    val exactSet = exactRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactDots = exactRows
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = Similarity.quantizedTopk(emb).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactSet.size === 100)
    val recall = (exactSet & got).size.toDouble / exactSet.size
    assert(recall >= 0.9, s"int8 quantization recall $recall")
    // the rescaled quantized dot approximates the raw dot: relative
    // error bounded by the per-component rounding (≤ 0.5/127 each side)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactDots.get(key).foreach { d =>
        assert(math.abs(r.getDouble(2) - d) <= math.abs(d) * 0.05 + 0.05,
          s"$key: approx ${r.getDouble(2)} vs exact $d")
      }
    }
  }

  test("sim3 IVF multiprobe ANN: recall floor vs sim1, probes beat the single-cell baseline, cosines exact") {
    val emb = Tables.embeddings(spark, sf001)
    val exactRows = Similarity.topkExact(emb).collect()
    val exact = exactRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCos = exactRows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def recallAt(nProbe: Int): (Double, Array[org.apache.spark.sql.Row]) = {
      val rows = Similarity.ivfAnn(emb, nProbe = nProbe).collect()
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      ((exact & got).size.toDouble / exact.size, rows)
    }
    val (r1, _) = recallAt(1)          // base cell only
    val (r8, rows8) = recallAt(8)      // default probe budget
    // multiprobe must genuinely buy recall over the single-cell baseline
    assert(r8 > r1, s"probing bought nothing: base $r1, 8 probes $r8")
    // floor on the WORST-case (near-orthogonal) corpus; clustered
    // production embeddings concentrate far better — see scaladoc
    assert(r8 >= 0.5, s"sim3 recall $r8 (base cell alone: $r1)")
    info(f"sim3 recall: base cell $r1%.2f -> 8 probes $r8%.2f")
    // a reported hit's cosine must equal the exact computation
    rows8.foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(1))).foreach(c => assert(r.getDouble(2) === c))
    }
  }

  test("sim4 persisted-index ANN is bit-identical to sim3 (the index changes WHERE cells live, not what they contain)") {
    val emb = Tables.embeddings(spark, sf001)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    val rebuilt = Similarity.ivfAnn(emb).collect().map(key).toSeq
    val indexed = Similarity.ivfAnnIndexed(spark, sf001).collect().map(key).toSeq
    assert(indexed === rebuilt)
  }

  test("sim5 learned IVF: k-means deterministic, objective descends, recall floor, cosines exact") {
    val emb = Tables.embeddings(spark, sf001)
    // bit-for-bit training determinism (decimal sums + fixed init + tie order)
    val a = Similarity.kmeansCentroids(emb, k = 8, iters = 3)
    val b = Similarity.kmeansCentroids(emb, k = 8, iters = 3)
    assert(a === b, "k-means training is not deterministic")
    // Lloyd's objective never increases with more iterations
    val o1 = Similarity.kmeansObjective(emb, Similarity.kmeansCentroids(emb, 8, 1))
    val o3 = Similarity.kmeansObjective(emb, a)
    assert(o3 <= o1 + 1e-9, s"objective rose: 1 iter $o1 -> 3 iters $o3")
    // the served query: recall floor vs exact on the worst-case corpus,
    // and every reported cosine equals the exact computation
    val exactRows = Similarity.topkExact(emb).collect()
    val exact = exactRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCos = exactRows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = Similarity.ivfAnnLearned(spark, sf001).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // 4 of 16 learned cells probed; floor set at the sim3 parity point —
    // learned cells must at least match random hyperplanes' budget curve
    assert(recall >= 0.5, s"sim5 recall $recall")
    info(f"sim5 learned-IVF recall at 4/16 cells: $recall%.2f")
    rows.foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(1))).foreach(c => assert(r.getDouble(2) === c))
    }
  }

  test("derived k: k = max(16, ceil(n/target)) scales with the corpus, end-to-end at k > 16") {
    // the formula — exact integer ceil-division, the oracle's twin
    assert(Similarity.deriveKCells(1) === 16)
    assert(Similarity.deriveKCells(16 * 1024) === 16)
    assert(Similarity.deriveKCells(16 * 1024 + 1) === 17)
    assert(Similarity.deriveKCells(1024L * 1000) === 1000)
    assert(Similarity.deriveKCells(500, targetCellSize = 20) === 25)
    // end-to-end with the derivation FORCED past the minimum: 500
    // vectors at targetCellSize=20 ⇒ k=25 — the trained artifact must
    // carry 25 centroids and the serve must stay correct + deterministic
    val emb = Tables.embeddings(spark, sf001)
    val n = emb.count()
    val k = Similarity.deriveKCells(n, targetCellSize = 20)
    assert(k > 16, s"test corpus too small to force a derived k: n=$n")
    val rows = Similarity.ivfAnnLearned(spark, sf001, targetCellSize = 20)
      .collect()
    val centroids = spark.read.parquet(
      s"${snapOf(Similarity.learnedIvfPath(sf001, k, 5))}/centroids")
    assert(centroids.count() === k.toLong,
      s"artifact must hold the derived $k centroids")
    val again = Similarity.ivfAnnLearned(spark, sf001, targetCellSize = 20)
      .collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // recall floor vs exact: more, smaller cells with the same probe
    // budget — the floor holds (same gate as the default-k test)
    val exact = Similarity.topkExact(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.3, s"derived-k recall $recall at 4/$k cells probed")
    info(f"derived-k (k=$k) recall at 4/$k cells: $recall%.2f")
  }

  test("sim16 PQ distortion: matches an independent local recompute against the persisted codebooks") {
    val (m, ks, iters, dim) = (4, 16, 3, 64)
    val sub = dim / m
    val rows = Similarity.pqDistortion(spark, sf001).collect()
    assert(rows.length === m, "one row per subspace")
    assert(rows.map(_.getInt(0)).toSeq === (0 until m), "ordered by j")
    // independent replay: plain Scala loops over the same persisted
    // codebooks and raw vectors — min-score argmin, the engine's exact
    // xx + (cc − 2xc) parenthesization, grid quantize, integer sum
    val cbs = Similarity.ensurePqCodebooks(spark, sf001, m, ks, iters, dim)
    val vecs = Tables.embeddings(spark, sf001)
      .select(functions.col("vec_id"),
        functions.col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](1).toArray)
    def d(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    for (j <- 0 until m) {
      var sum = 0L
      vecs.foreach { v =>
        val xj = v.slice(j * sub, (j + 1) * sub)
        val best = cbs(j).map { case (_, c) =>
          val cv = c.toArray; d(cv, cv) - 2.0 * d(xj, cv)
        }.min
        val e = (d(xj, xj) + best) * 1e6
        sum += (math.signum(e) * math.floor(math.abs(e) + 0.5)).toLong
      }
      val r = rows(j)
      assert(r.getLong(1) === vecs.length.toLong)
      assert(r.getLong(2) === sum,
        s"subspace $j integer error sum must match the local replay")
      assert(r.getLong(2) >= 0L, "squared error is nonnegative")
      val mean = math.round((sum.toDouble / vecs.length / 1e6) * 1e6) / 1e6
      assert(math.abs(r.getDouble(3) - mean) < 1e-12)
    }
  }

  test("sim17 cell imbalance: matches a local replay over the persisted index, bounded below by 1") {
    val rows = Similarity.cellImbalance(spark, sf001).collect()
    assert(rows.length === 1)
    val r = rows(0)
    // independent replay over the same persisted cell index
    val path = Similarity.ensureLearnedIvf(spark, sf001, 0, 5)
    val k = spark.read.parquet(s"$path/centroids").count()
    val counts = spark.read.parquet(s"$path/cells")
      .groupBy(functions.col("cell")).count()
      .collect().map(_.getLong(1))
    assert(r.getLong(0) === k)
    assert(r.getLong(1) === counts.length.toLong)
    assert(r.getLong(2) === counts.sum)
    assert(r.getLong(3) === counts.map(n => n * n).sum)
    val n = counts.sum.toDouble
    val imb = math.round(((k.toDouble * counts.map(c => c * c).sum / n) / n)
      * 1e6) / 1e6
    assert(math.abs(r.getDouble(4) - imb) < 1e-12)
    // Cauchy–Schwarz floor: k · Σn²/N² ≥ k / nonempty ≥ 1
    assert(r.getDouble(4) >= 1.0 - 1e-6,
      "imbalance below its mathematical floor")
  }

  test("sim9 PQ top-k: recall floor vs sim1, deterministic, exact cosines, codebook artifact reused") {
    val emb = Tables.embeddings(spark, sf001)
    val rows = Similarity.pqTopk(spark, sf001).collect()
    // determinism: a second serve (artifact now warm) is bit-identical —
    // codebooks, codes, integer LUT sums and the rank cut all replay
    val again = Similarity.pqTopk(spark, sf001).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // the artifact holds m × ks codebook rows with codes in [0, ks)
    val cb = spark.read.parquet(
      s"${snapOf(Similarity.pqCodebookPath(sf001, 4, 16, 3))}/codebooks")
    assert(cb.count() === 4L * 16)
    import org.apache.spark.sql.functions.{col, max, min}
    val codeRange = cb.agg(min(col("code")), max(col("code"))).head
    assert(codeRange.getInt(0) === 0 && codeRange.getInt(1) === 15)
    // recall vs the exact top-5: 4×16 codebooks quantize hard, but the
    // nCand=40 exact re-rank recovers most of the true neighbors
    val exactRows = Similarity.topkExact(emb).collect()
    val exact = exactRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 100)
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall $recall")
    info(f"sim9 PQ recall at m=4 ks=16 nCand=40: $recall%.2f")
    // a PQ hit reports the EXACT cosine (asymmetric re-rank contract)
    val exactCos = exactRows
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(1))).foreach(c =>
        assert(r.getDouble(2) === c))
    }
  }

  test("sim10 IVFPQ: recall floor vs sim1, deterministic, exact cosines, candidates confined to probed cells") {
    val emb = Tables.embeddings(spark, sf001)
    val rows = Similarity.ivfpqTopk(spark, sf001).collect()
    val again = Similarity.ivfpqTopk(spark, sf001).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // the encoded corpus drops the full-precision vectors: one row per
    // indexed vector, m codes each, every code in [0, ks)
    import org.apache.spark.sql.functions.{col, explode, max, min}
    val enc = spark.read.parquet(
      s"${snapOf(Similarity.ivfPqIndexPath(sf001, 5, 4, 16, 3))}/enc")
    assert(enc.count() === emb.count())
    assert(!enc.columns.contains("c_emb"),
      "IVFPQ index must not carry full-precision vectors")
    val codeRange = enc.select(explode(col("codes")).as("code"))
      .agg(min(col("code")), max(col("code"))).head
    assert(codeRange.getInt(0) >= 0 && codeRange.getInt(1) <= 15)
    // recall: coarse 4/16 probing bounds it near sim5's, the residual-PQ
    // in-cell ranking plus nCand=40 exact re-rank holds the same floor
    val exactRows = Similarity.topkExact(emb).collect()
    val exact = exactRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVFPQ recall $recall")
    info(f"sim10 IVFPQ recall at 4-probe m=4 ks=16 nCand=40: $recall%.2f")
    // exact-cosine contract on shared pairs
    val exactCos = exactRows
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(1))).foreach(c =>
        assert(r.getDouble(2) === c))
    }
  }

  test("sim11 MMR: k unique picks per query, step-1 = relevance top-1, near-dup demoted in favor of a diverse pick") {
    import spark.implicits._
    // corpus data: structural invariants over the real embeddings
    val emb = Tables.embeddings(spark, sf001)
    val rows = Similarity.mmrRerank(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).distinct.length === 5, s"query $q picks not unique")
      assert(rs.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    }
    val top1 = Similarity.topkExact(emb, nQueries = 10, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.filter(_._3 == 1L).foreach { case (q, n, _) =>
      assert(top1(q) === n, s"query $q step-1 must be the relevance top-1")
    }
    // crafted corpus: candidates 1 and 2 are near-identical and both
    // closest to the query; 3 is distinct. Plain top-2 keeps the dup;
    // MMR's redundancy penalty must pick 3 at step 2.
    // two-facet query: 1 and 2 are near-identical on facet x (1 slightly
    // more relevant), 3 covers facet y — orthogonal to 1, almost as
    // relevant. Scores at step 2: dup ≈ .7·.713 − .3·1.0 ≈ .20 vs
    // diverse ≈ .7·.707 − .3·.01 ≈ .49.
    val crafted = Seq(
      (0L, Array(1.0f, 1.0f, 0.0f)),          // query spans both facets
      (1L, Array(1.0f, 0.01f, 0.0f)),         // facet-x candidate
      (2L, Array(1.0f, 0.009f, 0.0f)),        // its near-duplicate
      (3L, Array(0.0f, 1.0f, 0.0f))           // facet-y alternative
    ).toDF("vec_id", "embedding")
    val mmr = Similarity.mmrRerank(crafted, nQueries = 1, m = 3, k = 2)
      .collect().map(r => (r.getLong(2), r.getLong(1))).toMap
    assert(mmr(1L) === 1L, "step 1 = most relevant")
    assert(mmr(2L) === 3L, "step 2 must skip the near-dup and diversify")
  }

  test("dd7 LSH near-dups: no false positives, recall >= 0.85 vs dd6 exact") {
    val emb = Tables.embeddings(spark, sf001)
    // dd6's ground truth lives on the bounded deterministic sample (the
    // unbounded all-pairs was the one cartesian in the repo); the recall
    // gate therefore compares dd7 RESTRICTED to sampled endpoints against
    // it. At this corpus size the default k covers every vector, so the
    // restriction is a no-op today — but the comparison stays honest at
    // any scale where the cap binds.
    val sampleIds = Similarity.sampledVectors(emb).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.embedNearDupsExact(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.embedNearDupsLsh(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      .filter { case ((a, b), _) => sampleIds(a) && sampleIds(b) }
    assert(exact.nonEmpty, "corpus must contain near-dup pairs at 0.4")
    // exact per-candidate verify ⇒ zero false positives, identical cosines
    lsh.foreach { case (k, c) =>
      assert(exact.contains(k), s"false positive pair $k")
      assert(exact(k) === c)
    }
    val recall = lsh.keySet.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.85, s"dd7 recall $recall over ${exact.size} pairs")
  }

  test("dd7 cap headroom: max LSH bucket sits below maxBucket=1024 at every oracle-gated scale") {
    // the dd4 gate's twin (see DedupSpec): above the cap dd7's
    // hub-and-spoke output diverges from the oracle's full combinations
    for (dir <- Seq(sf001, "/root/testdata/sf0.01")) {
      val m = Similarity.maxLshBucket(Tables.embeddings(spark, dir))
      assert(m <= 1024 / 2,
        s"$dir: max LSH bucket $m is within 2x of the 1024 cap — " +
          "dd7's oracle (full combinations) diverges above it")
      info(s"$dir: max dd7 LSH bucket = $m (cap 1024)")
    }
  }

  test("dd7 skew cap: 10k identical vectors emit a linear star, not B^2/2 pairs") {
    import spark.implicits._
    // Adversarial megacluster: identical vectors land in ONE bucket per
    // band. Uncapped emission would be ~5×10^7 pairs × 24 bands; the cap
    // turns each hot bucket into an (n−1)-pair star over the minimum
    // vec_id, keeping the cluster connected and the emission linear.
    val n = 10000
    val vec = Array.tabulate(64)(i => 0.1f * (i % 7 + 1))
    val emb = spark.range(n).select(
      functions.col("id").as("vec_id"),
      functions.typedLit(vec).as("embedding"))
    val rows = Similarity.embedNearDupsLsh(emb).collect()
    assert(rows.length === n - 1, s"expected star of ${n - 1} pairs, got ${rows.length}")
    assert(rows.forall(r => r.getLong(0) === 0L))        // hub = min vec_id
    assert(rows.forall(r => r.getDouble(2) === 1.0))     // identical ⇒ cosine 1
  }

  /** Every degenerate class tools/advvectors.py plants, as a local frame:
    * before the admission screen existed, the zero vector alone killed 19
    * of the 21 embeddings-backed queries with DIVIDE_BY_ZERO under ANSI
    * mode, and the 1e18-component row overflowed the BIGINT grid.
    */
  private def degenerateFrame() = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType)))
    def f(xs: Double*): Seq[java.lang.Float] = xs.map(x => java.lang.Float.valueOf(x.toFloat))
    val rows = Seq(
      Row(0L, f(1.0, 2.0, 3.0, 4.0), 0),                            // benign
      Row(1L, f(0.0, 0.0, 0.0, 0.0), 1),                            // zero norm
      Row(2L, f(1e18, 1e18, 1e18, 1e18), 2),                        // oversized
      Row(3L, f(1e-42, 1e-42, 1e-42, 1e-42), 3),                    // denormal: fine
      Row(4L, Seq[java.lang.Float](Float.NaN, 1f, 1f, 1f), 4),      // NaN
      Row(5L, Seq[java.lang.Float](Float.PositiveInfinity, 1f, 1f, 1f), 5), // Inf
      Row(6L, Seq[java.lang.Float](null, 1f, 1f, 1f), 6),           // null component
      Row(7L, null, 7),                                             // null vector
      Row(8L, Seq.empty[java.lang.Float], 8),                       // empty vector
      Row(9L, f(-1.0, -2.0, -3.0, -4.0), 9))                        // negative: fine
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
  }

  test("vector admission: each degenerate class rejected, benign/denormal/negative admitted, bound is grid-safe") {
    val adm = Similarity.admissible(degenerateFrame())
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(adm === Set(0L, 3L, 9L))
    // the documented BIGINT-grid derivation actually holds: worst squared
    // L2 distance on the 1e-6 grid, at dim 64 under the component bound
    val worst = 4.0 * 64.0 * Similarity.MaxAbsComponent * Similarity.MaxAbsComponent
    assert(worst * 1e6 < Long.MaxValue.toDouble / 100,
      "admission bound must keep grid arithmetic far from Long overflow")
  }

  test("sim18 hygiene report: per-class flags, and the admitted column agrees with the screen") {
    val rep = Similarity.vecHygiene(degenerateFrame()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(rep(0L) === ((0L, false, true)))   // benign
    assert(rep(1L) === ((0L, true, false)))   // zero norm: clean components, zero norm
    assert(rep(2L) === ((4L, false, false)))  // oversized: every component bad
    assert(rep(3L) === ((0L, false, true)))   // denormal squares stay > 0 in double
    assert(rep(4L)._1 === 1L && !rep(4L)._3)  // NaN counted, rejected
    assert(rep(5L)._1 === 1L && !rep(5L)._3)  // Inf counted, rejected
    assert(rep(6L) === ((1L, false, false)))  // null component: counted, norm of rest nonzero
    assert(rep(7L) === ((-1L, false, false))) // null vector: sentinel count, rejected
    assert(rep(8L) === ((0L, true, false)))   // empty: nothing bad, but no norm
    assert(rep(9L) === ((0L, false, true)))   // negative admitted
  }

  test("admission is binding end-to-end: topkExact over a degenerate corpus runs under ANSI and never ranks a rejected row") {
    // without the screen this throws DIVIDE_BY_ZERO on the zero vector
    val out = Similarity.topkExact(
      Similarity.admissible(degenerateFrame()), nQueries = 10, k = 2).collect()
    assert(out.nonEmpty)
    val ids = out.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.subsetOf(Set(0L, 3L, 9L)), s"rejected ids ranked: $ids")
  }

  test("staged adm store: consumer plans scan the admitted table with NO per-row admission predicate; content equals the inline screen; stale spec restages") {
    import org.apache.spark.sql.functions._
    val admDf = Similarity.adm(spark, sf001)
    // 1. the store IS the screen's output, row-for-row
    val inline = Similarity.admissible(
      graft.sources.Tables.embeddings(spark, sf001))
    assert(admDf.count() === inline.count())
    assert(admDf.join(inline, Seq("vec_id"), "left_anti").count() === 0L)
    // 2. consumer plans carry no admission predicate: the two array
    //    passes (ArrayExists / the sanitized-norm transform) must appear
    //    NOWHERE in a family consumer's optimized plan — that is the
    //    whole point of staging (at 100 TB the screen ran per query)
    val consumer = Similarity.topkExact(admDf).queryExecution.optimizedPlan.toString
    assert(!consumer.contains("exists("), "admission exists() leaked into a consumer scan")
    assert(!consumer.toLowerCase.contains("isnan"), "admission isnan leaked into a consumer scan")
    // ...while the frame still READS the staged store, not the raw table
    val files = admDf.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("target/adm/")),
      s"adm does not read the staged store: ${files.take(3).mkString(", ")}")
    // 3. sim18 (the reporting twin) still screens RAW rows inline
    val hygiene = Similarity.vecHygiene(
      graft.sources.Tables.embeddings(spark, sf001)).queryExecution.optimizedPlan.toString
    assert(hygiene.toLowerCase.contains("isnan"))
    // 4. staleness (r16 manifest model): a poisoned pointer spec forces a
    //    REPUBLISH (new snapshot, content equality re-proven), a fresh
    //    pointer serves without republishing
    val admRoot = new java.io.File(
      s"${sys.props("user.dir")}/target/adm/sf0.001/embeddings")
    val (gen0, goodSpec) = graft.sources.ManifestStore.currentPointer(admRoot)
      .getOrElse(fail("no adm manifest pointer"))
    java.nio.file.Files.write(new java.io.File(admRoot, "_manifest").toPath,
      s"$gen0\tstale".getBytes)
    val restaged = Similarity.adm(spark, sf001)
    val (gen1, spec1) = graft.sources.ManifestStore.currentPointer(admRoot).get
    assert(gen1 > gen0 && spec1 === goodSpec,
      "poisoned pointer must trigger a republish under the true spec")
    assert(restaged.count() === inline.count())
    Similarity.adm(spark, sf001) // fresh ⇒ serve, no republish
    assert(graft.sources.ManifestStore.currentPointer(admRoot).get._1 === gen1)
  }

  // ---------------------------------------------------- index-health drift

  /** Deterministic synthetic corpus builder for the drift cases: rows of
    * (vec_id, x: array<double>) with `embedding` aliased for the training
    * entry points. dim 64, content set per-case.
    */
  private def vecFrame(rows: Seq[(Long, Array[Double])]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("vec_id", "embedding")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("embedding"))
  }

  private def unit(dim: Int)(f: PartialFunction[Int, Double]): Array[Double] =
    Array.tabulate(dim)(d => if (f.isDefinedAt(d)) f(d) else 0.0)

  /** k * sum(n^2) / N^2 over an assignment — the sim17 formula. */
  private def imbalanceOf(cells: org.apache.spark.sql.DataFrame, k: Int): Double = {
    import org.apache.spark.sql.functions._
    val agg = cells.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("nv"), sum(col("n") * col("n")).as("sq")).head
    k.toDouble * agg.getLong(1) / agg.getLong(0) / agg.getLong(0)
  }

  /** mean min-cell squared distance — the sim16 shape at m=1. */
  private def distortionOf(corpus: org.apache.spark.sql.DataFrame,
      centroids: Seq[(Int, Seq[Double])]): Double = {
    import org.apache.spark.sql.functions._
    val scored = centroids.map { case (cid, c) =>
      val cv = typedLit(c)
      struct((Similarity.dot(cv, cv) - lit(2.0) * Similarity.dot(col("x"), cv)).as("s"),
        lit(cid).as("c"))
    }
    val best = array_min(array(scored: _*)).getField("s")
    corpus.select(avg(Similarity.norm2(col("x")) + best)).head.getDouble(0)
  }

  /** recall@5 with nProbe=1 against a given assignment: a hit is an exact
    * top-5 neighbor that shares the query's cell.
    */
  private def recallAt5(corpus: org.apache.spark.sql.DataFrame,
      cells: org.apache.spark.sql.DataFrame, queryIds: Seq[Long]): Double = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val withCell = corpus.join(cells.select(col("vec_id"), col("cell")), "vec_id")
    val q = withCell.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("x").as("qx"), col("cell").as("qcell"))
    val sim = Similarity.dot(col("qx"), col("x")) /
      (sqrt(Similarity.norm2(col("qx"))) * sqrt(Similarity.norm2(col("x"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("s").desc, col("vec_id"))
    val top = withCell.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("s", sim)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
    top.filter(col("cell") === col("qcell")).count().toDouble / (queryIds.size * 5)
  }

  test("index-health triad, COLLAPSE drift: stale quantizer trips imbalance+distortion (recall blind), splitting the hot regime restores them") {
    import org.apache.spark.sql.functions._
    val dim = 64
    // base regime: 4 interleaved tight clusters at 10*e_c
    val base = (0 until 100).map { i =>
      val c = i % 4
      (i.toLong, unit(dim) { case `c` => 10.0 + ((i / 4) % 5 - 2) * 0.1 })
    }
    // drift: one far blob with real internal spread along component 6
    val drift = (100 until 400).map { i =>
      (i.toLong, unit(dim) { case 5 => 40.0 + ((i - 100) % 5 - 2) * 0.1
                             case 6 => (i - 100) * 0.1 })
    }
    val corpus = vecFrame(base ++ drift).select(col("vec_id"), col("embedding").as("x"))
    val stale = Similarity.kmeansCentroids(
      vecFrame(base), k = 4, iters = 3) // trained BEFORE the drift arrived
    val staleCells = Similarity.assignCells(corpus, stale)
    val staleImb = imbalanceOf(staleCells, stale.size)
    assert(staleImb > Similarity.HealthImbalanceMax,
      s"collapse drift must trip the imbalance threshold: $staleImb")
    val baseHalf = corpus.filter(col("vec_id") < 100)
    val growth = distortionOf(corpus, stale) / distortionOf(baseHalf, stale)
    assert(growth > Similarity.HealthDistortionGrowthMax,
      s"collapse drift must trip distortion growth: $growth")
    // recall is BLIND to this mode (the whole blob sits in one probed fat
    // cell) - the reason the triad is a SET, not one number
    val staleRecall = recallAt5(corpus, staleCells, (100L until 120L))
    assert(staleRecall >= Similarity.HealthRecallFloor,
      s"collapse mode should not degrade recall: $staleRecall")
    // the documented remedy for a hot cell: keep the fitted base cells,
    // SPLIT the hot regime into quantile cells (ensureLearnedIvf's warn
    // text; equivalently a retrain at the derived larger k)
    val blobMeanAt = (q: Int) => unit(dim) { case 5 => 40.0
                                            case 6 => (q * 75 + 37) * 0.1 }
    val fresh = stale.map { case (cid, c) => (cid, c) } ++
      (0 until 4).map(q => (4 + q, blobMeanAt(q).toSeq))
    val freshCells = Similarity.assignCells(corpus, fresh)
    val freshImb = imbalanceOf(freshCells, fresh.size)
    assert(freshImb < Similarity.HealthImbalanceMax,
      s"splitting the hot regime must restore balance: $freshImb")
    // after a refresh the growth monitor's baseline RESETS to the new
    // quantizer's own fit residual (growth = current/fit-time = 1 by
    // construction on the corpus it was fitted to) — the meaningful
    // restore fact is the absolute residual collapsing vs the stale one
    assert(distortionOf(corpus, fresh) < distortionOf(corpus, stale) / 10.0,
      "the refreshed quantizer must collapse the absolute residual")
  }

  test("sim20 hot-cell split: a skew-staged corpus trips HealthImbalanceMax, splitHotCells restores it, and nothing outside the hot cell moves") {
    import org.apache.spark.sql.functions._
    val dim = 64
    // 4 tight healthy cells (25 members each) + ONE hot cell of 300
    // members made of two separable sub-blobs INTERLEAVED by id (so the
    // lowest-two-ids init lands one seed in each blob)
    val healthy = (0 until 100).map { i =>
      val c = i % 4
      (i.toLong, unit(dim) { case `c` => 10.0 + ((i / 4) % 5 - 2) * 0.1 })
    }
    val hotBlob = (100 until 400).map { i =>
      if (i % 2 == 0)
        (i.toLong, unit(dim) { case 5 => 40.0 + (i % 10) * 0.05 })
      else
        (i.toLong, unit(dim) { case 6 => 40.0 + (i % 10) * 0.05 })
    }
    val corpus = vecFrame(healthy ++ hotBlob)
      .select(col("vec_id"), col("embedding").as("x"))
    val cells = corpus.withColumn("cell",
      when(col("vec_id") < 100, (col("vec_id") % 4).cast("int"))
        .otherwise(lit(4)))
    val before = imbalanceOf(cells, 5)
    assert(before > Similarity.HealthImbalanceMax,
      s"the staged skew must trip the imbalance threshold: $before")
    val split = Similarity.splitHotCells(cells).collect()
    // only the hot cell's members were touched
    assert(split.forall(_.getInt(0) == 4),
      "reassignment must be partition-local to the hot cell")
    assert(split.length === 300, "every hot member gets a sub verdict")
    // the 2-means actually separates the two sub-blobs
    val bySub = split.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(bySub(0) === 150 && bySub(1) === 150,
      s"interleaved sub-blobs must split evenly: $bySub")
    split.foreach { r =>
      val id = r.getLong(2)
      assert(r.getInt(1) === (id % 2).toInt,
        s"vec $id landed in the wrong sub-blob")
    }
    // composing the split back restores the health metric: healthy cells
    // unchanged, the hot cell becomes two — k goes 5 -> 6
    val sp = spark; import sp.implicits._
    val subDf = split.map(r => (r.getLong(2), r.getInt(1))).toSeq
      .toDF("vec_id", "sub")
    val after = cells.join(subDf, Seq("vec_id"), "left")
      .select((col("cell") * 2 + coalesce(col("sub"), lit(0))).as("cell"))
    assert(imbalanceOf(after, 6) < Similarity.HealthImbalanceMax,
      "the split must restore imbalance below the threshold")
  }

  test("index-health triad, SCATTER drift: stale cell boundaries cut every neighborhood (recall trips, imbalance blind), retraining on the drifted regime restores recall") {
    import org.apache.spark.sql.functions._
    val dim = 64
    val base = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, unit(dim) { case `c` => 10.0 + ((i / 4) % 5 - 2) * 0.1 })
    }
    // drifted clusters sit BETWEEN the stale centroid directions and
    // alternate a tiny offset across the stale decision boundary, so
    // every second neighbor lands in the other (unprobed) cell
    val drift = (200 until 400).map { i =>
      val c = (i - 200) % 4
      val j = (i - 200) / 4
      val delta = if (j % 2 == 0) 0.01 else -0.01
      (i.toLong, unit(dim) {
        case `c`                  => 7.0 + delta
        case d if d == (c + 1) % 4 => 7.0 - delta
        case d if d == 20 + c      => j * 0.02
      })
    }
    val corpus = vecFrame(base ++ drift).select(col("vec_id"), col("embedding").as("x"))
    val stale = Similarity.kmeansCentroids(vecFrame(base), k = 4, iters = 3)
    val staleCells = Similarity.assignCells(corpus, stale)
    val staleRecall = recallAt5(corpus, staleCells, (200L until 220L))
    assert(staleRecall < Similarity.HealthRecallFloor,
      s"scatter drift must trip the recall floor: $staleRecall")
    val staleImb = imbalanceOf(staleCells, stale.size)
    assert(staleImb < Similarity.HealthImbalanceMax,
      s"imbalance is blind to scatter drift by design: $staleImb")
    // the ops remedy: retrain on the drifted regime (ids interleave the
    // drifted clusters, so the engine's lowest-ids init covers them)
    val retrained = Similarity.kmeansCentroids(
      vecFrame(drift), k = 4, iters = 5)
    val freshCells = Similarity.assignCells(corpus, retrained)
    val freshRecall = recallAt5(corpus, freshCells, (200L until 220L))
    assert(freshRecall >= Similarity.HealthRecallFloor,
      s"retraining must restore recall: $freshRecall")
  }

  test("sim19 filtered ANN: constraint honored, recall floor vs the exact filtered scan, post-filtering sim5 is NOT equivalent, no extra exchange") {
    import org.apache.spark.sql.functions._
    val emb = Similarity.adm(spark, sf001)
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.filteredAnnLearned(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.nonEmpty)
    // every returned neighbor shares its query's label
    got.foreach { case (q, n, _) =>
      assert(labels(n) === labels(q), s"query $q got cross-label neighbor $n")
    }
    // exact filtered top-5 driver-side (500-vector corpus): recall floor
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val queries = got.map(_._1).distinct
    val exact = queries.flatMap { q =>
      vecs.keys.toSeq.filter(n => n != q && labels(n) == labels(q))
        .map(n => (q, n, cos(vecs(q), vecs(n))))
        .sortBy(t => (-t._3, t._2)).take(5).map(t => (t._1, t._2))
    }.toSet
    val gotSet = got.map(t => (t._1, t._2)).toSet
    val recall = (exact & gotSet).size.toDouble / exact.size
    assert(recall >= 0.8, s"filtered recall $recall")
    // the reason the filter must participate in candidate generation:
    // post-filtering the UNFILTERED top-5 by label under-fills k for
    // most queries (labels ~1/10 selective)
    val unfiltered = Similarity.ivfAnnLearned(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val postFiltered = unfiltered.filter { case (q, n) => labels(n) == labels(q) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(queries.exists(q => postFiltered.getOrElse(q, 0) < 5),
      "post-filtering must under-fill k for at least one query")
    // payload-in-index: the filtered serve adds NO exchange over sim5's
    val planOf = (df: org.apache.spark.sql.DataFrame) =>
      df.queryExecution.executedPlan.toString
    val ex = "Exchange".r
    val nSim5 = ex.findAllIn(planOf(
      Similarity.ivfAnnLearned(spark, sf001))).size
    val nSim19 = ex.findAllIn(planOf(
      Similarity.filteredAnnLearned(spark, sf001))).size
    assert(nSim19 <= nSim5,
      s"filtered serve must not add exchanges: sim19=$nSim19 sim5=$nSim5")
  }
}
