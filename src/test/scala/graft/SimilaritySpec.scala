package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.sources.Tables

/** The recall claim sim2 makes (rows-only in the driver harness). */
class SimilaritySpec extends AnyFunSuite with SparkFixture {

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

  test("dd7 LSH near-dups: no false positives, recall >= 0.85 vs dd6 exact") {
    val emb = Tables.embeddings(spark, sf001)
    val exact = Similarity.embedNearDupsExact(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.embedNearDupsLsh(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty, "corpus must contain near-dup pairs at 0.4")
    // exact per-candidate verify ⇒ zero false positives, identical cosines
    lsh.foreach { case (k, c) =>
      assert(exact.contains(k), s"false positive pair $k")
      assert(exact(k) === c)
    }
    val recall = lsh.keySet.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.85, s"dd7 recall $recall over ${exact.size} pairs")
  }
}
